"""Multi-process worker for the multihost correctness test.

Run as a subprocess (one per simulated host) with CPU devices:

  python tests/multihost_worker.py --num_processes N --process_id I \
      --port P --out result.json

Each process builds the same tiny AR train state, feeds its host-local
slice of a deterministic global batch through
``parallel.dist.make_global_batch`` (the production multi-host input
path, SURVEY.md section 2.2 "Dataloader sharding"), runs a few jitted
data-parallel steps, and process 0 writes the loss trajectory. The test
asserts the 2-process trajectory is identical to the 1-process one.

Also exercises host-side metric aggregation (dist.all_gather_arrays) and
the barrier.
"""

import argparse
import json
import os

# 2 virtual CPU devices per process -> the global mesh has
# 2 * num_processes devices; must be set before jax import.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the image's axon TPU plugin ignores the JAX_PLATFORMS env var; force the
# platform through jax.config too (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ladcast_tpu.config import (
        EDMSchedulerConfig,
        LaDCastDiTConfig,
        NoiseSamplerConfig,
    )
    from ladcast_tpu.parallel import dist
    from ladcast_tpu.train.optim import make_optimizer
    from ladcast_tpu.train.trainer_ar import ARTrainConfig, make_ar_train_step

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices).reshape(-1), ("data",))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))

    tiny = LaDCastDiTConfig(
        in_channels=4, out_channels=4,
        num_attention_heads=2, attention_head_dim=16,
        num_layers=1, num_single_layers=1, num_refiner_layers=1,
        mlp_ratio=2.0, rope_axes_dim=(4, 6, 6),
        conditioning_tensor_rope_axes_dim=(4, 6, 6),
        conditioning_tensor_in_channels=4, attention_impl="xla")
    tcfg = ARTrainConfig(num_push_forward_steps=1, use_ema=False,
                         compute_dtype="float32")
    opt = make_optimizer(num_training_steps=10)
    init_fn, train_step = make_ar_train_step(
        tiny, EDMSchedulerConfig(), NoiseSamplerConfig(), tcfg, opt)

    GLOBAL_B, T, Tin, H, W, C = 8, 2, 1, 4, 6, 4
    rng = np.random.RandomState(0)  # same global batch on every process
    global_batch = (
        rng.randn(GLOBAL_B, Tin, H, W, C).astype(np.float32),
        rng.randn(GLOBAL_B, T, H, W, C).astype(np.float32),
        rng.rand(GLOBAL_B, 1).astype(np.float32),
    )
    sl = dist.host_local_slice(GLOBAL_B)
    local = jax.tree.map(lambda x: x[sl], global_batch)

    state = init_fn(jax.random.PRNGKey(0), local)
    state = jax.device_put(state, repl)
    batch = dist.make_global_batch(local, bsh)

    step = jax.jit(train_step, in_shardings=(repl, (bsh, bsh, bsh), repl),
                   out_shardings=(repl, repl))
    losses = []
    key = jax.random.PRNGKey(7)  # identical on all processes
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
        losses.append(float(aux["loss"]))

    # host-side aggregation path: every process contributes one row
    row = np.asarray([[jax.process_index(), losses[-1]]], np.float64)
    gathered = dist.all_gather_arrays(row)

    # cross-host sharded fetch (the --hub_export gather path): a 'data'-
    # sharded array spans both hosts; fetch_full_tree must reassemble the
    # identical global value on EVERY process (plain device_get raises on
    # non-addressable shards)
    nrows = len(devices)
    garr = np.arange(nrows * 3, dtype=np.float32).reshape(nrows, 3)
    local_rows = garr[dist.host_local_slice(nrows)]
    sharded = dist.make_global_batch({"w": local_rows}, bsh)
    fetched = dist.fetch_full_tree(sharded)
    assert np.array_equal(np.asarray(fetched["w"]), garr), fetched["w"]

    # TP-spanning feed: with a model axis across hosts, batch_feed_slice
    # must give every process in one data group the SAME rows (replica
    # processes must hold identical data), and make_global_batch must be
    # told the true global row count instead of inferring
    # local * process_count (cli/train_ar.py's --mesh path).
    nd = len(devices)
    garr2 = np.arange(nd * 2 * 5, dtype=np.float32).reshape(nd * 2, 5)
    for dshape in ((1, nd), (max(1, nd // 2), min(2, nd))):
        m2 = Mesh(np.asarray(devices).reshape(dshape), ("data", "model"))
        bsh2 = NamedSharding(m2, P("data"))
        gb = garr2[: dshape[0] * 2]  # 2 rows per data-group
        fsl = dist.batch_feed_slice(bsh2, gb.shape[0])
        assembled = dist.make_global_batch({"x": gb[fsl]}, bsh2,
                                           global_rows=gb.shape[0])
        back = dist.fetch_full_tree(assembled)
        assert np.array_equal(np.asarray(back["x"]), gb), (dshape, back["x"])
    # the pure-DP 1-D mesh degrades to the disjoint host_local_slice
    assert dist.batch_feed_slice(bsh, GLOBAL_B) == \
        dist.host_local_slice(GLOBAL_B)

    dist.barrier("worker-done")

    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump({"losses": losses,
                       "gathered_rows": int(gathered.shape[0]),
                       "gathered_loss_spread":
                           float(gathered[:, 1].max() - gathered[:, 1].min()),
                       "num_devices": len(devices)}, f)


if __name__ == "__main__":
    main()
