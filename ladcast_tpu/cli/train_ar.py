"""AR diffusion training CLI.

TPU-native equivalent of ``accelerate launch train_AR.py --config
configs/ladcast_375M.yaml`` (reference train_AR.py:478-1222): one process
per host, a jitted data-parallel train step over the device mesh, orbax
checkpointing with rotation, EMA, JSON-lines/wandb metric logging.

Usage:
  python -m ladcast_tpu.cli.train_ar --config configs/ladcast_375m.yaml \
      [--latents path.zarr|path.npz] [--resume latest]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ladcast_tpu import static_data
from ladcast_tpu.config import (
    EDMSchedulerConfig,
    LaDCastDiTConfig,
    NoiseSamplerConfig,
    config_from_dict,
)
from ladcast_tpu.data.latent_dataset import (
    ARLatentDataset,
    ARWindowConfig,
    ArrayLatentSource,
    ShardedLatentSource,
    batch_iterator,
    open_zarr_latent_source,
)
from ladcast_tpu.parallel import dist
from ladcast_tpu.parallel.mesh import make_mesh, make_mesh_from_spec
from ladcast_tpu.parallel.sharding_rules import train_state_sharding
from ladcast_tpu.train import checkpoint as ckpt
from ladcast_tpu.train.optim import make_optimizer
from ladcast_tpu.train.trainer_ar import ARTrainConfig, make_ar_train_step
from ladcast_tpu.utils import profiling
from ladcast_tpu.utils.logging_utils import MetricLogger
from ladcast_tpu.utils.registry import load_yaml


def load_latent_source(path: str, start_date=None, end_date=None,
                       load_in_memory=True, reader: str = "auto"):
    """Open a latent source.

    * ``.npz`` file -> in-memory ArrayLatentSource
    * directory of ``.npy`` shards + ``timestamps.npy`` -> the C++
      threaded-pread NpyShardSource when ``reader`` is ``native``/``auto``
      (falls back to numpy mmap if the toolchain is unavailable)
    * anything else -> zarr via xarray (reference storage layout)
    """
    if path.endswith(".npz"):
        d = np.load(path)
        return ArrayLatentSource(d["latents"], d["timestamps"])
    if os.path.isdir(path) and os.path.exists(
            os.path.join(path, "timestamps.npy")):
        ts = np.load(os.path.join(path, "timestamps.npy"))
        shards = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".npy") and f != "timestamps.npy")
        if reader in ("native", "auto"):
            try:
                from ladcast_tpu.data.native_reader import NpyShardSource
                return NpyShardSource(shards, ts)
            except Exception as e:
                if reader == "native":
                    raise
                print(f"native reader unavailable ({e}); "
                      "falling back to numpy mmap")
        # lazy per-batch reads: a multi-shard archive bigger than host RAM
        # must stream, not materialize (np.concatenate over mmap arrays
        # copies every shard into memory)
        return ShardedLatentSource(shards, ts)
    return open_zarr_latent_source(path, start_date=start_date,
                                   end_date=end_date,
                                   load_in_memory=load_in_memory)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--latents", default=None)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--init_weights", default=None,
                    help="weights-only warm start from any checkpoint "
                         "layout (orbax dir, .safetensors, diffusers hub "
                         "dir): params + EMA loaded, optimizer/step fresh "
                         "-- the reference --load_weights_only; ignored "
                         "when --resume is given")
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument("--num_push_forward_steps", type=int, default=1)
    ap.add_argument("--lat_weighted_loss", action="store_true")
    ap.add_argument("--val_latents", default=None,
                    help="held-out latent source for ensemble validation")
    ap.add_argument("--val_every", type=int, default=0,
                    help="run ensemble validation every N steps (0=off)")
    ap.add_argument("--reader", default="auto",
                    choices=["auto", "native", "mmap"],
                    help="latent source backend for shard directories "
                         "(native = C++ threaded pread pool; mmap = "
                         "numpy mmap; auto = native with mmap fallback)")
    ap.add_argument("--val_ensemble_size", type=int, default=10)
    ap.add_argument("--val_num_init_times", type=int, default=4)
    ap.add_argument("--val_total_lead_time_hour", type=int, default=240,
                    help="validation forecast horizon (ref log_validation "
                         "default 240h)")
    ap.add_argument("--val_num_inference_steps", type=int, default=20)
    ap.add_argument("--val_dcae_params", default=None,
                    help="DCAE params (safetensors/orbax/diffusers dir): "
                         "decode the validation ensemble and log "
                         "per-variable physical RMSE/CRPS tables keyed by "
                         "lead time (reference log_validation, "
                         "train_AR.py:54-385); omit for latent-only")
    ap.add_argument("--hub_export", action="store_true",
                    help="at each checkpoint, also write diffusers-layout "
                         "model dirs <out>/hub/ar_model{,_ema} "
                         "(config.json + reference-layout safetensors), "
                         "shippable to diffusers/reference users")
    ap.add_argument("--skip_state_ckpt", action="store_true",
                    help="skip the orbax TrainState checkpoints (params+"
                         "opt+EMA) and write only the --hub_export dirs. "
                         "For measurement runs whose only artifact is the "
                         "final weights: the orbax save copies the full "
                         "~4x-params state off-device in one bulk async "
                         "transfer, which can wedge a remote-attached "
                         "device link (observed on the axon tunnel)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mesh", default=None,
                    help="device-mesh spec, e.g. 'data=-1' (pure DP, "
                         "default) or 'data=1,model=8' (Megatron-TP over "
                         "'model' for the 1.6B); overrides the yaml "
                         "parallel.mesh mapping")
    ap.add_argument("--zero", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="ZeRO-shard replicated optimizer/EMA mirrors "
                         "over all mesh axes (default: on whenever the "
                         "mesh has a model axis; --no-zero disables; "
                         "yaml parallel.zero)")
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="per-block gradient checkpointing (the "
                         "reference's gradient_checkpointing; needed for "
                         "the 1.6B activation footprint); --no-remat "
                         "overrides a yaml general.remat: true")
    ap.add_argument("--snr_gamma", type=float, default=None,
                    help="min-SNR-gamma loss weighting (reference "
                         "general_config.snr_gamma, train_AR.py:1014-1064)"
                         "; yaml general.snr_gamma")
    ap.add_argument("--compute_dtype", default=None,
                    choices=["bfloat16", "float32"],
                    help="activation/matmul dtype (fp32 master weights "
                         "either way); yaml general.compute_dtype")
    args = ap.parse_args(argv)

    cfg = load_yaml(args.config)
    model_cfg = config_from_dict(LaDCastDiTConfig, cfg.get("ar_model", {}))
    if model_cfg.int8_matmuls:
        raise SystemExit("int8_matmuls is an inference-only path (the "
                         "int8 round/cast is not differentiable); remove "
                         "it from the ar_model training config")
    sched_cfg = config_from_dict(EDMSchedulerConfig,
                                 cfg.get("noise_scheduler", {}).get("params", {}))
    ns_cfg = config_from_dict(NoiseSamplerConfig, cfg.get("noise_sampler", {}))
    dl_cfg = cfg.get("train_dataloader", {})
    opt_cfg = cfg.get("optimizer", {})
    lr_cfg = cfg.get("lr_scheduler", {})
    gen_cfg = cfg.get("general", {})
    ema_cfg = cfg.get("ema", {})

    out_dir = args.output_dir or gen_cfg.get("output_dir", "runs/ar")
    num_steps = (args.num_steps if args.num_steps is not None
                 else gen_cfg.get("num_training_steps") or 100000)

    def _opt(cli_val, yaml_key, default, section=gen_cfg):
        return cli_val if cli_val is not None else section.get(yaml_key,
                                                               default)

    snr_gamma = _opt(args.snr_gamma, "snr_gamma", None)
    tcfg = ARTrainConfig(
        num_push_forward_steps=args.num_push_forward_steps,
        lat_weighted_loss=args.lat_weighted_loss,
        snr_gamma=None if snr_gamma is None else float(snr_gamma),
        remat=bool(_opt(args.remat, "remat", False)),
        compute_dtype=_opt(args.compute_dtype, "compute_dtype", "bfloat16"),
        use_ema=ema_cfg.get("use_ema", True),
        ema_max_decay=ema_cfg.get("ema_max_decay", 0.9999),
        ema_power=ema_cfg.get("ema_power", 2 / 3),
        ema_inv_gamma=ema_cfg.get("ema_inv_gamma", 1.0),
        ema_update_after_step=ema_cfg.get("ema_update_after_step", 1000),
        input_seq_len=dl_cfg.get("input_seq_len", 1),
    )
    optimizer = make_optimizer(
        lr=float(opt_cfg.get("lr", 1e-4)),
        weight_decay=float(opt_cfg.get("weight_decay", 1e-2)),
        betas=tuple(opt_cfg.get("betas", (0.9, 0.999))),
        eps=float(opt_cfg.get("eps", 1e-8)),
        num_warmup_steps=lr_cfg.get("num_warmup_steps", 1000),
        num_training_steps=num_steps,
        schedule=lr_cfg.get("name", "cosine"),
        min_lr=float(lr_cfg.get("min_lr", 0.0)),
    )
    init_fn, train_step = make_ar_train_step(model_cfg, sched_cfg, ns_cfg,
                                             tcfg, optimizer)

    # Data
    lm, ls = static_data.latent_mean_std()
    source = load_latent_source(
        args.latents or dl_cfg.get("ds_path"),
        start_date=dl_cfg.get("start_date"), end_date=dl_cfg.get("end_date"),
        load_in_memory=dl_cfg.get("load_in_memory", True),
        reader=args.reader)
    wcfg = ARWindowConfig(
        input_seq_len=dl_cfg.get("input_seq_len", 1),
        return_seq_len=dl_cfg.get("return_seq_len", 4),
        interval_between_pred=dl_cfg.get("interval_between_pred", 6),
        sampling_interval=dl_cfg.get("sampling_interval", 1))
    dataset = ARLatentDataset(source, wcfg, mean=lm, std=ls,
                              target_std=0.5)

    # Mesh: 1-D "data" (pure DP, the reference's DDP regime) by default;
    # an N-D spec (CLI --mesh / yaml parallel.mesh) adds Megatron-TP over
    # a "model" axis + ZeRO sharding of replicated optimizer/EMA mirrors
    # (parallel/sharding_rules.py) -- the production path for the 1.6B,
    # whose ~26 GB fp32 Adam+EMA state cannot replicate on 16 GB chips.
    par_cfg = cfg.get("parallel", {})
    mesh_spec = args.mesh or par_cfg.get("mesh")
    mesh = make_mesh_from_spec(mesh_spec) if mesh_spec else make_mesh("data")
    if "data" not in mesh.axis_names:
        raise SystemExit(f"mesh {mesh_spec!r} must include a 'data' axis")
    tp = mesh.shape.get("model", 1) > 1
    zero = bool(_opt(args.zero, "zero", tp, section=par_cfg))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    per_device_bs = dl_cfg.get("batch_size", 4)
    # per-DATA-shard batch (TP chips within one data group share examples)
    global_bs = per_device_bs * mesh.shape["data"]

    # per-host input feed: every process computes the same shuffled order
    # (shared seed) and reads only its contiguous slice of each global
    # batch; make_global_batch assembles the sharded global array
    # (SURVEY.md section 2.2 "Dataloader sharding"). The slice is derived
    # from the batch SHARDING, not the process index: when the model axis
    # spans hosts, all processes of one data group must read identical
    # rows (replica processes must hold identical data).
    local_slice = dist.batch_feed_slice(bsh, global_bs)
    it = batch_iterator(dataset, global_bs, shuffle=dl_cfg.get("shuffle", True),
                        seed=args.seed,
                        num_push_forward_steps=tcfg.num_push_forward_steps,
                        batch_slice=local_slice)
    example = next(it)

    # Materialize the train state directly into its target sharding
    # (jitted init with out_shardings): with TP/ZeRO the full state never
    # exists on any single device -- mandatory for the 1.6B, whose fp32
    # params+Adam+EMA (~26 GB) exceed one v5e HBM.
    if tp or zero:
        abstract = jax.eval_shape(init_fn, jax.random.PRNGKey(args.seed),
                                  example)
        state_sh = train_state_sharding(abstract, mesh, zero_mirrors=zero)
    else:
        state_sh = repl  # pytree-prefix: fully replicated (DDP regime)
    # the example batch must go through make_global_batch like every
    # training batch: on multi-process runs each host holds only its
    # local slice and a plain device_put over a cross-host sharding
    # would mistake it for the global array
    state = jax.jit(init_fn, out_shardings=state_sh)(
        jax.random.PRNGKey(args.seed),
        dist.make_global_batch(example, bsh, global_rows=global_bs))
    mgr = ckpt.make_manager(os.path.join(out_dir, "ckpts"),
                            max_to_keep=gen_cfg.get("checkpoints_total_limit", 3))
    start_step = 0
    if args.resume:
        # the sharded state is the restore template: orbax places each
        # leaf with the template's sharding, so resume never gathers the
        # full state onto one device either
        state = ckpt.restore_state(
            mgr, state, None if args.resume == "latest" else int(args.resume))
        start_step = int(state.step)
    elif args.init_weights:
        # weights-only warm start (the reference's --resume_from_checkpoint
        # + --load_weights_only, train_AR.py:796-837): params/EMA from any
        # checkpoint layout (orbax dir, .safetensors, diffusers hub dir),
        # fresh optimizer and step 0. Each leaf is placed with the live
        # state's sharding, so TP/ZeRO runs never gather the full tree.
        from ladcast_tpu.cli.pred_rollout import _load_any_params
        raw, _ = _load_any_params(args.init_weights, "dit", model_cfg)

        def _place(target_tree):
            # each leaf takes ITS OWN target sharding: under ZeRO the
            # EMA mirror of a replicated param is largest-dim sharded,
            # so placing EMA with the params' shardings would make jit
            # reject the committed args at the first step
            return jax.tree.map(
                lambda tgt, w: jax.device_put(
                    jnp.asarray(w, tgt.dtype), tgt.sharding),
                target_tree, raw)

        state = state._replace(params=_place(state.params))
        if state.ema is not None:
            state = state._replace(
                ema=state.ema._replace(params=_place(state.ema.params)))

    step_fn = jax.jit(train_step,
                      in_shardings=(state_sh, (bsh, bsh, bsh), repl),
                      out_shardings=(state_sh, repl))

    logger = MetricLogger(out_dir, config=cfg,
                          log_with=cfg.get("accelerator", {}).get("log_with",
                                                                  "jsonl"))

    run_validation = None
    if args.val_every and args.val_latents:
        # epoch-style ensemble validation (the reference's log_validation,
        # train_AR.py:54-385): real N-member rollouts from held-out latents
        # scored in latent space.
        from ladcast_tpu.config import RolloutConfig
        from ladcast_tpu.data import time_utils
        from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
        from ladcast_tpu.train.validation import validate_ar_model

        val_src = load_latent_source(args.val_latents)
        rcfg = RolloutConfig(
            ensemble_size=args.val_ensemble_size,
            return_seq_len=wcfg.return_seq_len,
            input_seq_len=wcfg.input_seq_len,
            num_inference_steps=args.val_num_inference_steps,
            total_lead_time_hour=args.val_total_lead_time_hour,
            step_size_hour=6)
        val_ds = ARLatentDataset(
            val_src, ARWindowConfig(
                wcfg.input_seq_len, rcfg.total_num_steps,
                wcfg.interval_between_pred, 1),
            mean=lm, std=ls, target_std=0.5)
        vidx = np.linspace(0, len(val_ds) - 1,
                           args.val_num_init_times).astype(int)
        vin, vtg, vyp = [], [], []
        for i in vidx:
            inp, tgt, ts = val_ds[int(i)]
            vin.append(inp)
            vtg.append(tgt)
            vyp.append(time_utils.rollout_year_progress(
                ts, rcfg.num_repetitions,
                rcfg.step_size_hour * rcfg.return_seq_len))
        vin, vtg = np.stack(vin), np.stack(vtg)
        vyp = np.stack(vyp)
        model = LaDCastTransformer3D(model_cfg)

        def net_fn(p, lat, cn, cond, yp):
            return model.apply(p, lat, cn, cond, yp)

        # Decoded-field validation (reference log_validation decodes the
        # ensemble and logs per-variable physical tables,
        # train_AR.py:178-341); latent-only stays the cheap default.
        val_decode = {}
        if args.val_dcae_params:
            from ladcast_tpu import channels as ch
            from ladcast_tpu.cli.pred_rollout import _load_any_params
            from ladcast_tpu.config import DCAEConfig
            from ladcast_tpu.metrics.weights import cos_lat_weights
            from ladcast_tpu.models.dcae import AutoencoderDC

            dcae_params, dcae_cfg = _load_any_params(
                args.val_dcae_params, "dcae",
                config_from_dict(DCAEConfig, cfg.get("encdec", {})))
            # replicate onto the training mesh (loaded params land on a
            # single device; the jitted validator mixes them with the
            # mesh-replicated train state)
            dcae_params = jax.device_put(dcae_params, repl)
            dcae = AutoencoderDC(dcae_cfg)
            n_field = dcae_cfg.out_channels - dcae_cfg.static_channels
            if n_field == ch.NUM_DYNAMIC_CHANNELS:
                field_stats = static_data.era5_mean_std()
                val_channel_names = ch.channel_names()
            else:  # tiny/test configs: identity stats, generic names
                field_stats = (np.zeros(n_field, np.float32),
                               np.ones(n_field, np.float32))
                val_channel_names = [f"ch{i}" for i in range(n_field)]
            scale = 2 ** (len(dcae_cfg.decoder_block_out_channels) - 1)
            h_dec = vin.shape[-3] * scale
            val_decode = dict(
                decode_fn=lambda p, z: dcae.apply(
                    p, z, method=AutoencoderDC.decode),
                dcae_params=dcae_params,
                latent_stats=(lm, ls),
                field_stats=field_stats,
                grid_lat_weight=cos_lat_weights(
                    np.linspace(-88.5, 90.0, h_dec)))
            lead_hours = [rcfg.step_size_hour * (i + 1)
                          for i in range(rcfg.total_num_steps)]

        def run_validation(state, step):
            params = state.ema.params if state.ema is not None \
                else state.params
            m = validate_ar_model(
                net_fn, params, jnp.asarray(vin), jnp.asarray(vtg), vyp,
                jax.random.PRNGKey(1234), sched_cfg, rcfg, **val_decode)
            rec = {"val_latent_rmse": float(m["latent_rmse"].mean()),
                   "val_latent_crps": float(m["latent_crps"].mean())}
            if val_decode:
                # per-variable tables keyed by lead time, averaged over
                # init times (the reference's merged_RMSE / CRPS wandb
                # tables, train_AR.py:485-520)
                for name, k2 in (("val_rmse_ens", "rmse_ens"),
                                 ("val_rmse_single", "rmse_single"),
                                 ("val_crps", "crps")):
                    tab = m[k2].mean(axis=0)  # (C, T)
                    rec[name] = {"lead_hours": lead_hours,
                                 **{cn: [round(float(x), 6) for x in row]
                                    for cn, row in
                                    zip(val_channel_names, tab)}}
            logger.log(rec, step)

    # NOTE: the step key must be IDENTICAL on every process -- it is a
    # replicated input to one global SPMD computation; per-example noise
    # decorrelation happens inside the jitted step (batch-shaped
    # jax.random calls are sharded with the batch). The reference's
    # per-process generators (train_AR.py:627-629) decorrelate host-local
    # computations, which is the opposite regime.
    key = jax.random.PRNGKey(args.seed)
    ckpt_every = gen_cfg.get("checkpointing_steps", 50000)
    timer = profiling.PhaseTimer()  # host data stall vs dispatch vs eval
    t0 = time.time()
    step = start_step
    while step < num_steps:
        with timer.phase("data"):
            batch = example if step == start_step else next(it, None)
            if batch is None:
                it = batch_iterator(
                    dataset, global_bs, shuffle=dl_cfg.get("shuffle", True),
                    seed=args.seed + step,
                    num_push_forward_steps=tcfg.num_push_forward_steps,
                    batch_slice=local_slice)
                batch = next(it)
            batch = dist.make_global_batch(batch, bsh, global_rows=global_bs)
        key, sub = jax.random.split(key)
        with timer.phase("step_dispatch"):
            state, aux = step_fn(state, batch, sub)
        step += 1
        if step % 50 == 0 or step == start_step + 1:
            logger.log({"loss": float(aux["loss"]),
                        "grad_norm": float(aux["grad_norm"]),
                        "steps_per_s": 50 / max(time.time() - t0, 1e-9),
                        "phases": timer.summary()},
                       step)
            t0 = time.time()
        if run_validation is not None and step % args.val_every == 0:
            with timer.phase("validation"):
                run_validation(state, step)
        if step % ckpt_every == 0 or step == num_steps:
            with timer.phase("checkpoint"):
                if args.hub_export:
                    # diffusers-layout export (the reference's training
                    # hooks write ar_model/ + ar_model_ema/ the same way,
                    # train_AR.py:559-613) -- shippable to reference/
                    # diffusers users and loadable by every CLI here.
                    # fetch_full_tree is collective (TP/ZeRO shards span
                    # hosts), so gather on EVERY process, then rank 0
                    # writes.
                    from ladcast_tpu.models import hub

                    full_params = dist.fetch_full_tree(state.params)
                    full_ema = (dist.fetch_full_tree(state.ema.params)
                                if state.ema is not None else None)
                if args.hub_export and dist.process_index() == 0:
                    hdir = os.path.join(out_dir, "hub")
                    hub.save_pretrained(
                        os.path.join(hdir, "ar_model"), "dit", model_cfg,
                        full_params)
                    if full_ema is not None:
                        hub.save_pretrained(
                            os.path.join(hdir, "ar_model_ema"), "dit",
                            model_cfg, full_ema,
                            ema_metadata={
                                "decay": tcfg.ema_max_decay,
                                "power": tcfg.ema_power,
                                "inv_gamma": tcfg.ema_inv_gamma,
                                "update_after_step":
                                    tcfg.ema_update_after_step,
                                "optimization_step": int(state.step)})
                if not args.skip_state_ckpt:
                    # hand orbax the live (possibly TP/ZeRO-sharded)
                    # arrays: it serializes each shard without gathering
                    # the full state onto one host/device. Runs AFTER the
                    # hub export so the inference-usable weights exist
                    # even if this bulk off-device copy wedges a remote
                    # device link (observed once on the axon tunnel).
                    ckpt.save_state(mgr, step, state)
    mgr.wait_until_finished()
    logger.close()
    # returned for tests (sharding assertions); ignored by __main__
    return state


if __name__ == "__main__":
    main()
