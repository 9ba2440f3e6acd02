"""Device-mesh construction and sharding rules.

The reference's entire distributed story is NCCL DDP + host-side work
sharding (SURVEY.md section 2.2). The TPU-native replacement is a single
``jax.sharding.Mesh`` whose axes serve every workload:

  * training: axis "data" shards the global batch; parameters and
    optimizer state are replicated over ICI (DDP-equivalent, gradients
    reduced by XLA-inserted psums when the jitted step requests replicated
    grads).
  * inference: axis "ens" shards ensemble members of a rollout; each
    member's denoiser calls are independent, so the only collective is the
    optional on-device score reduction at the end.

Multi-host extends the same mesh over DCN (jax.distributed); axis order
keeps batch/member neighbors on the same ICI domain.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_name: str = "data",
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_from_spec(spec, devices: Optional[Sequence[jax.Device]] = None
                        ) -> Mesh:
    """N-D mesh from an axis-size spec.

    ``spec`` is either a string ``"data=-1,model=2"`` (CLI form) or an
    ordered mapping ``{"data": -1, "model": 2}`` (yaml ``parallel.mesh``
    form). Exactly one axis may be ``-1`` ("fill with the remaining
    devices"); the product of the sizes must equal the device count.
    Axis order is layout order: the LAST axis varies fastest, so put the
    most communication-heavy axis ("model") last to keep its collectives
    on neighboring ICI links.
    """
    if isinstance(spec, str):
        pairs = []
        for part in spec.split(","):
            name, _, size = part.partition("=")
            pairs.append((name.strip(), int(size) if size else -1))
    else:
        pairs = [(str(k), int(v)) for k, v in spec.items()]
    if not pairs:
        raise ValueError("empty mesh spec")
    bad = [(k, s) for k, s in pairs if s != -1 and s <= 0]
    if bad:
        raise ValueError(f"mesh axis sizes must be -1 or positive, got "
                         f"{bad} in {pairs}")
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    fills = [i for i, (_, s) in enumerate(pairs) if s == -1]
    if len(fills) > 1:
        raise ValueError(f"at most one -1 axis in mesh spec, got {pairs}")
    fixed = int(np.prod([s for _, s in pairs if s != -1]))
    if fills:
        if n % fixed != 0:
            raise ValueError(
                f"mesh spec {pairs} does not divide {n} devices")
        pairs[fills[0]] = (pairs[fills[0]][0], n // fixed)
    sizes = [s for _, s in pairs]
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh spec {pairs} != {n} devices")
    names = tuple(name for name, _ in pairs)
    return Mesh(np.asarray(devices).reshape(sizes), names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: Optional[str] = None) -> NamedSharding:
    """Shard the leading (batch / ensemble-member) dimension."""
    axis_name = axis_name or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis_name))


def pad_to_multiple(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def shard_batch(mesh: Mesh, tree, axis_name: Optional[str] = None):
    """Device_put a pytree with leading-axis sharding."""
    s = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
