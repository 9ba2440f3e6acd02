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
