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
    ap.add_argument("--mode", default="train", choices=("train", "infer"))
    ap.add_argument("--workdir", default=None,
                    help="shared artifact dir (infer mode)")
    args = ap.parse_args()

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id)

    if args.mode == "infer":
        return infer_main(args)

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


def infer_main(args):
    """The INFERENCE multi-host path (VERDICT r4 next-round #4): the
    production pred_rollout/evaluate_ens plumbing — process-strided init
    times (pred_rollout.py:217), per-init keys folded from the init
    timestamp, an ens-mesh rollout over LOCAL devices (the
    --shard_ensemble layout), per-init latent artifacts into a SHARED
    dir, then scorer-style rank shards (dist.shard_list over the files,
    <key>.rank{r}.npy writes) merged by rank 0 through the REAL
    cli/evaluate_ens.merge_rank_shards. The test asserts every artifact
    and the merged score table are identical between 1-proc and 2-proc
    runs (each process always has 2 local devices, so the per-init
    program is the same in both)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ladcast_tpu.cli.evaluate_ens import (
        init_time_from_filename,
        merge_rank_shards,
    )
    from ladcast_tpu.config import EDMSchedulerConfig, LaDCastDiTConfig, \
        RolloutConfig
    from ladcast_tpu.data import time_utils
    from ladcast_tpu.parallel import dist
    from ladcast_tpu.parallel.mesh import make_mesh
    from ladcast_tpu.rollout.engine import ensemble_rollout

    workdir = args.workdir
    os.makedirs(workdir, exist_ok=True)

    tiny = LaDCastDiTConfig(
        in_channels=4, out_channels=4,
        num_attention_heads=2, attention_head_dim=16,
        num_layers=1, num_single_layers=1, num_refiner_layers=1,
        mlp_ratio=2.0, rope_axes_dim=(4, 6, 6),
        conditioning_tensor_rope_axes_dim=(4, 6, 6),
        conditioning_tensor_in_channels=4, attention_impl="xla")
    sched = EDMSchedulerConfig()
    rcfg = RolloutConfig(ensemble_size=4, num_inference_steps=2,
                         total_lead_time_hour=48)

    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
    net = LaDCastTransformer3D(tiny)
    Tin, H, W, C = rcfg.input_seq_len, 4, 6, 4
    params = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, rcfg.return_seq_len, H, W, C)), jnp.zeros((1,)),
        jnp.zeros((1, Tin, H, W, C)), jnp.zeros((1,)))

    # ens mesh over LOCAL devices: multi-HOST work split stays the
    # process-strided init times, like cli/pred_rollout --shard_ensemble
    mesh = make_mesh("ens", jax.local_devices())
    repl = NamedSharding(mesh, P())
    ens_sh = NamedSharding(mesh, P("ens"))
    params = jax.device_put(params, repl)

    def roll(p, known, yp, key):
        def net_fn(lat, cn, cond, ypb):
            return net.apply(p, lat, cn, cond, ypb)
        return ensemble_rollout(net_fn, known, yp, key, sched, rcfg)

    roll_jit = jax.jit(roll, in_shardings=(repl, ens_sh, repl, repl),
                       out_shardings=ens_sh)

    all_init_times = [2018010100, 2018011512, 2018020100, 2018021518]
    init_times = all_init_times[jax.process_index()::jax.process_count()]

    base_key = jax.random.PRNGKey(11)
    rngf = np.random.RandomState(3)  # same fields on every process
    fields_by_ts = {ts: rngf.randn(Tin, H, W, C).astype(np.float32)
                    for ts in all_init_times}
    for ts in init_times:
        sub = jax.random.fold_in(base_key, ts)  # pred_rollout's contract
        known = jnp.broadcast_to(
            jnp.asarray(fields_by_ts[ts])[None],
            (rcfg.ensemble_size, Tin, H, W, C))
        known = jax.device_put(known, ens_sh)
        yp = jnp.asarray(time_utils.rollout_year_progress(
            ts, rcfg.num_repetitions,
            rcfg.step_size_hour * rcfg.return_seq_len))
        traj = roll_jit(params, known, yp, sub)
        np.save(os.path.join(workdir, f"latent_{ts}.npy"),
                np.asarray(jax.device_get(traj)))

    dist.barrier("infer-rollout-done")

    # scoring stage: stride the artifact FILES over ranks (the scorer's
    # split, evaluate_ens.py:256 / dist.shard_list), one metric row per
    # init time into per-rank shard files
    import glob
    files = sorted(glob.glob(os.path.join(workdir, "latent_*.npy")))
    my_files = dist.shard_list(files)
    rows = []
    for f in my_files:
        ts = init_time_from_filename(f)
        arr = np.load(f)
        rows.append([float(ts), float(np.sqrt((arr ** 2).mean()))])
    rank = dist.process_index()
    np.save(os.path.join(workdir, f"m.rank{rank}.npy"),
            np.asarray(rows, np.float64).reshape(len(rows), 2))

    dist.barrier("infer-score-done")
    if jax.process_index() == 0:
        merged = merge_rank_shards(workdir, ["m"], jax.process_count())
        order = np.argsort(merged["m"][:, 0])
        with open(args.out, "w") as f:
            json.dump({
                "init_times": [int(t) for t in merged["m"][order, 0]],
                "scores": [float(s) for s in merged["m"][order, 1]],
                "num_devices": len(jax.devices()),
            }, f)


if __name__ == "__main__":
    main()
