"""Multi-host distributed helpers.

Replaces the reference's host-side collective plumbing (SURVEY.md
section 2.2): accelerate ``gather``/``gather_for_metrics`` for metrics and
object lists (train_AR.py:899-906, pred_rollout.py:398-414),
``torch_gather`` (models/utils.py:126-152), ``wait_for_everyone`` barriers,
and per-process RNG decorrelation (train_AR.py:627-629).

On TPU pods, initialize with :func:`initialize` (jax.distributed over
DCN); all helpers degrade to no-ops in single-process mode, which is the
local test mode -- the same graceful degradation contract the reference
has via ``torch.distributed.is_initialized()``.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallback; safe to call in
    single-process mode (no-op)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def fold_process_key(key: jax.Array) -> jax.Array:
    """Per-process RNG decorrelation: fold the process index into the key
    (the reference seeds generators with seed + process_index)."""
    return jax.random.fold_in(key, jax.process_index())


def all_gather_arrays(x: np.ndarray, axis: int = 0) -> np.ndarray:
    """Host-side all-gather of per-process numpy arrays (the reference's
    accelerator.gather of metric tensors). Single-process: identity."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(x))
    # process_allgather stacks on a new leading axis
    if axis == 0:
        return gathered.reshape(-1, *gathered.shape[2:])
    return np.moveaxis(gathered, 0, axis)


def fetch_full_tree(tree):
    """Fetch a pytree of (possibly cross-host sharded) jax.Arrays to host
    numpy on EVERY process. On multi-process runs a plain
    ``jax.device_get`` of a TP/ZeRO-sharded array raises (it spans
    non-addressable devices), and the gather is a collective -- so this
    must be called by all processes, OUTSIDE any rank guard.
    Single-process: plain device_get."""
    if jax.process_count() == 1:
        # Fetch leaf-by-leaf, serially: a single device_get of the whole
        # tree kicks off D2H copies for every leaf at once, and a
        # multi-GB in-flight burst can wedge a remote-attached device
        # link (observed on the axon tunnel during a 375M hub export).
        # Serial per-leaf fetches keep the in-flight window to one
        # array (<~30 MB for the 375M) at identical total bytes.
        return jax.tree.map(lambda x: jax.device_get(x), tree)
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda x: multihost_utils.process_allgather(x, tiled=True), tree)


def host_local_slice(global_batch_size: int) -> slice:
    """The contiguous slice of a deterministic global batch order that this
    process is responsible for reading (every process computes the same
    shuffled order from the same seed; each reads only its slice)."""
    per = global_batch_size // jax.process_count()
    assert per * jax.process_count() == global_batch_size, \
        (global_batch_size, jax.process_count())
    return slice(jax.process_index() * per, (jax.process_index() + 1) * per)


def batch_feed_slice(sharding, global_batch_size: int) -> slice:
    """The rows of the deterministic global batch order this process must
    read to feed :func:`make_global_batch` under ``sharding`` (batch
    axis 0).

    Generalizes :func:`host_local_slice` to meshes where a model/TP axis
    spans hosts: ``jax.make_array_from_process_local_data`` requires
    replica processes to hold IDENTICAL data, so all processes in the
    same data-parallel group get the same (overlapping) slice -- a
    disjoint per-process split would scatter examples into wrong
    data-group coordinates (or fail assembly). On a pure-DP mesh aligned
    with process boundaries this degrades to :func:`host_local_slice`.
    """
    if jax.process_count() == 1:
        return slice(0, global_batch_size)
    idx_map = sharding.addressable_devices_indices_map(
        (global_batch_size,))
    spans = sorted({
        (idx[0].start or 0,
         global_batch_size if idx[0].stop is None else idx[0].stop)
        for idx in idx_map.values()})
    # a slice-based reader needs the union of addressable rows to be
    # contiguous; standard (data, model) meshes built from the
    # process-ordered jax.devices() list satisfy this
    cover = spans[0][1]
    for a, b in spans[1:]:
        if a > cover:
            raise ValueError(
                f"addressable batch rows are non-contiguous: {spans}; "
                "this mesh layout needs a per-device batch reader")
        cover = max(cover, b)
    return slice(spans[0][0], cover)


def make_global_batch(batch, sharding, global_rows: Optional[int] = None):
    """Form a global device array from per-process host-local data.

    The reference scatters main-process batches via Accelerate
    ``dispatch_batches`` (train_encdec.py:171-173); here each host reads
    only its own shard and ``jax.make_array_from_process_local_data``
    assembles the global array (SURVEY.md section 2.2 "Dataloader
    sharding"). Single-process: plain device_put (identical semantics).

    ``batch`` is a pytree of numpy/jax arrays whose leading axis (for
    sharded leaves) is the *per-process* batch; ``sharding`` is a matching
    pytree of NamedSharding (or a single sharding applied to all leaves).
    Replicated leaves (PartitionSpec ()) must be identical across hosts.

    ``global_rows``: the global batch size. REQUIRED whenever a model/TP
    mesh axis spans hosts (processes in one data group then hold
    identical, overlapping rows, so the default
    ``local * process_count`` inference over-counts); pair the local
    read with :func:`batch_feed_slice`. Defaults to the pure-DP
    inference ``x.shape[0] * process_count()``.
    """
    single = hasattr(sharding, "spec")
    if jax.process_count() == 1:
        if single:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), batch, sharding)

    def place(x, s):
        import numpy as _np
        x = _np.asarray(x)
        if not s.spec or all(p is None for p in s.spec):
            # replicated leaf: every host holds the full value
            return jax.make_array_from_process_local_data(s, x, x.shape)
        rows = (global_rows if global_rows is not None
                else x.shape[0] * jax.process_count())
        global_shape = (rows,) + x.shape[1:]
        return jax.make_array_from_process_local_data(s, x, global_shape)

    if single:
        return jax.tree.map(lambda x: place(x, sharding), batch)
    return jax.tree.map(place, batch, sharding)


def shard_list(items: List[Any]) -> List[Any]:
    """Strided split of host-side work items across processes (the
    reference's accelerate.split_between_processes; strided assignment
    avoids the padded-duplicate cleanup at pred_rollout.py:409-414)."""
    return list(items[jax.process_index()::jax.process_count()])


def barrier(name: str = "barrier") -> None:
    """wait_for_everyone equivalent."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
