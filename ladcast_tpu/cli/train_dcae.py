"""DCAE reconstruction training CLI.

Equivalent of ``accelerate launch train_encdec.py`` (reference
train_encdec.py:142-1150): streams normalized ERA5 snapshots, trains the
autoencoder with SST masking / static reconstruction / lat-weighted
relative L2 / periodic-roll augmentation, EMA, periodic + best-val
checkpoints.

Data: ERA5 zarr (xarray) or an .npz bundle with raw fields (see
pred_rollout.NpzFieldSource). Each batch is normalized + SST-masked
host-side, then the jitted train step runs ``subbatch_steps`` optimizer
steps per batch (step 0 unrolled, later ones periodic-rolled).
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
from ladcast_tpu.config import DCAEConfig, config_from_dict
from ladcast_tpu.data import transforms
from ladcast_tpu.parallel import dist
from ladcast_tpu.parallel.mesh import make_mesh
from ladcast_tpu.train import checkpoint as ckpt
from ladcast_tpu.train.optim import make_optimizer
from ladcast_tpu.train.trainer_dcae import DCAETrainConfig, make_dcae_train_step
from ladcast_tpu.utils import profiling
from ladcast_tpu.utils.logging_utils import MetricLogger
from ladcast_tpu.utils.registry import load_yaml


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data", required=True, help="ERA5 zarr or .npz bundle")
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--init_weights", default=None,
                    help="weights-only warm start from any checkpoint "
                         "layout (orbax dir, .safetensors, diffusers hub "
                         "dir): params + EMA loaded, optimizer/step fresh "
                         "-- the reference --load_weights_only; required "
                         "in practice for ft_decoder_only finetunes; "
                         "ignored when --resume is given")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--val_data", default=None,
                    help="held-out ERA5 zarr/.npz for validation "
                         "(train_encdec.py:862-1121)")
    ap.add_argument("--val_every", type=int, default=None,
                    help="validation interval in steps (default: "
                         "general.val_every_steps or 1000)")
    ap.add_argument("--split", default=None,
                    help="reference WeatherDataset split of --data "
                         "(train/validation/test/full/<year>; "
                         "weather_dataset.py:14-48). Default: train for "
                         "tar directories, all timestamps otherwise.")
    ap.add_argument("--val_split", default="validation",
                    help="split of the validation source; with no "
                         "--val_data this selects the split from --data "
                         "itself (the reference trains on 1979-2017 and "
                         "validates on 2018 of the same archive)")
    args = ap.parse_args(argv)

    cfg = load_yaml(args.config)
    dcae_cfg = config_from_dict(DCAEConfig, cfg.get("encdec", {}))
    train_cfg = cfg.get("train", {})
    opt_cfg = cfg.get("optimizer", {})
    lr_cfg = cfg.get("lr_scheduler", {})
    gen_cfg = cfg.get("general", {})
    ema_cfg = cfg.get("ema", {})
    out_dir = args.output_dir or gen_cfg.get("output_dir", "runs/dcae")
    num_steps = args.num_steps if args.num_steps is not None else (
        train_cfg.get("num_train_epochs", 30)
        * train_cfg.get("epoch_length", 341875)
        // max(train_cfg.get("batch_size", 4), 1))

    tcfg = DCAETrainConfig(
        lat_weighted_loss=train_cfg.get("lat_weighted_loss", True),
        subbatch_steps=train_cfg.get("subbatch_steps", 3),
        use_ema=ema_cfg.get("use_ema", True),
        ema_max_decay=ema_cfg.get("ema_max_decay", 0.9999),
        ema_power=ema_cfg.get("ema_power", 0.66667),
        ema_update_after_step=ema_cfg.get("ema_update_after_step", 1000))
    optimizer = make_optimizer(
        lr=float(opt_cfg.get("lr", 1e-4)),
        weight_decay=float(opt_cfg.get("weight_decay", 1e-2)),
        betas=tuple(opt_cfg.get("betas", (0.9, 0.999))),
        num_warmup_steps=lr_cfg.get("num_warmup_steps", 1000),
        num_training_steps=num_steps)
    init_fn, train_step, eval_step = make_dcae_train_step(
        dcae_cfg, tcfg, optimizer)

    from ladcast_tpu.cli.pred_rollout import open_field_source

    split = args.split or ("train" if os.path.isdir(args.data) else None)
    src, all_ts = open_field_source(args.data, split=split)

    fm, fs = static_data.era5_mean_std()
    statics = jnp.asarray(static_data.static_conditioning_tensor(layout="HWC"))

    mesh = make_mesh("data")
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    per_device_bs = train_cfg.get("batch_size", 4)
    global_bs = per_device_bs * len(mesh.devices.ravel())

    # per-host feed: every process draws the same global timestamp chunk
    # (shared seed) and reads only its contiguous slice of it
    # (SURVEY.md section 2.2 "Dataloader sharding").
    local_slice = dist.host_local_slice(global_bs)

    def make_batch(ts_chunk, src=src):
        raw = src.frames_at(np.asarray(ts_chunk)[local_slice])
        x = transforms.normalize(raw, fm, fs)
        nan_mask = np.isnan(
            x[..., __import__("ladcast_tpu.channels", fromlist=["x"])
              .SST_CHANNEL_INDEX])
        x = np.where(np.isnan(x), -2.0, x).astype(np.float32)
        return (x, nan_mask, statics)

    rng = np.random.RandomState(args.seed)
    example = make_batch(rng.choice(all_ts, global_bs, replace=False))
    state = init_fn(jax.random.PRNGKey(args.seed), example)

    if train_cfg.get("ft_decoder_only", False):
        # decoder-only finetune (reference --ft_decoder): rebuild the
        # optimizer with the encoder frozen via a trainable mask.
        from ladcast_tpu.train.optim import decoder_only_mask
        mask = decoder_only_mask(state.params)
        optimizer = make_optimizer(
            lr=float(opt_cfg.get("lr", 1e-4)),
            weight_decay=float(opt_cfg.get("weight_decay", 1e-2)),
            betas=tuple(opt_cfg.get("betas", (0.9, 0.999))),
            num_warmup_steps=lr_cfg.get("num_warmup_steps", 1000),
            num_training_steps=num_steps, trainable_mask=mask)
        init_fn, train_step, eval_step = make_dcae_train_step(
            dcae_cfg, tcfg, optimizer)
        state = state._replace(opt_state=optimizer.init(state.params))

    mgr = ckpt.make_manager(os.path.join(out_dir, "ckpts"))
    if args.resume:
        state = ckpt.restore_state(
            mgr, state, None if args.resume == "latest" else int(args.resume))
    elif args.init_weights:
        # weights-only warm start (reference --load_weights_only; the
        # ft_decoder flow loads the pretrained autoencoder this way)
        from ladcast_tpu.cli.pred_rollout import _load_any_params
        wparams, _ = _load_any_params(args.init_weights, "dcae", dcae_cfg)
        wparams = jax.tree.map(
            lambda tgt, w: jnp.asarray(w, tgt.dtype), state.params, wparams)
        state = state._replace(params=wparams)
        if state.ema is not None:
            state = state._replace(ema=state.ema._replace(params=wparams))
    state = jax.device_put(state, repl)
    step_fn = jax.jit(train_step,
                      in_shardings=(repl, (bsh, bsh, repl), repl),
                      out_shardings=(repl, repl))

    logger = MetricLogger(out_dir, config=cfg)

    # ---- validation setup (reference train_encdec.py:862-1121); with no
    # separate --val_data, the val split of the SAME archive is used
    # (train 1979-2017 / validation 2018, weather_dataset.py:14-23) ----
    val_src = None
    if args.val_data:
        val_src, val_ts = open_field_source(args.val_data,
                                            split=args.val_split)
    elif args.val_split and os.path.isdir(args.data):
        val_src = src
        val_ts = __import__(
            "ladcast_tpu.data.era5_tar",
            fromlist=["x"]).available_timestamps(args.data, args.val_split)
        if len(val_ts) == 0:
            val_src = None
    if val_src is not None:
        val_every = args.val_every or gen_cfg.get("val_every_steps", 1000)
        eval_jit = jax.jit(eval_step,
                           in_shardings=(repl, (bsh, bsh, repl)),
                           out_shardings=repl)
        sm, ss = static_data.static_mean_std()
        # channel stds for unnormalized RMSE: [dynamic 84 | static 5];
        # unnorm mse = normalized mse * std^2 (mean cancels in the diff).
        unnorm_std = np.concatenate([fs, ss]).astype(np.float32)
        names = (__import__("ladcast_tpu.channels", fromlist=["x"])
                 .channel_names()
                 + ["land_sea_mask", "oro_1", "oro_2", "oro_3", "oro_4"])
        best_val_loss = float("inf")
        best_dir = os.path.join(out_dir, "best")
        os.makedirs(best_dir, exist_ok=True)

    def run_validation(step):
        """EMA-weight validation pass: dataset-weighted loss + per-channel
        unnormalized (lat-weighted) RMSE; best-val params rotation (3)."""
        nonlocal best_val_loss
        val_params = state.ema.params if state.ema is not None \
            else state.params
        total = {"loss": 0.0, "mse": 0.0, "lw_mse": 0.0}
        n = 0
        for i in range(0, len(val_ts) - global_bs + 1, global_bs):
            vb = dist.make_global_batch(
                make_batch(val_ts[i:i + global_bs], src=val_src),
                (bsh, bsh, repl))
            ev = jax.device_get(eval_jit(val_params, vb))
            total["loss"] += float(ev["loss"]) * global_bs
            total["mse"] = total["mse"] + ev["channel_mse"] * global_bs
            total["lw_mse"] = total["lw_mse"] + ev["channel_lw_mse"] * global_bs
            n += global_bs
        if n == 0:
            return
        val_loss = total["loss"] / n
        rmse = np.sqrt(total["mse"] / n) * unnorm_std
        lw_rmse = np.sqrt(total["lw_mse"] / n) * unnorm_std
        logs = {"val_loss": val_loss}
        for c, name in enumerate(names):
            logs[f"val_rmse_{name}"] = float(rmse[c])
            logs[f"val_lw_rmse_{name}"] = float(lw_rmse[c])
        logger.log(logs, step)
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            if dist.process_index() == 0:  # host-0 writes (shared fs safe)
                existing = sorted(
                    (d for d in os.listdir(best_dir)
                     if d.startswith("step-")),
                    key=lambda d: int(d.split("-")[1]))
                for d in existing[: max(len(existing) - 2, 0)]:  # keep best 3
                    import shutil
                    shutil.rmtree(os.path.join(best_dir, d))
                ckpt.save_params(os.path.join(best_dir, f"step-{step}"),
                                 jax.device_get(val_params))
            dist.barrier("best-val-ckpt")

    # the step key must be identical on every process (replicated input to
    # one global SPMD computation); see cli/train_ar.py.
    key = jax.random.PRNGKey(args.seed)
    step = int(jax.device_get(state.step))
    batch = dist.make_global_batch(example, (bsh, bsh, repl))
    timer = profiling.PhaseTimer()  # host data stall vs dispatch vs eval
    t0 = time.time()
    while step < num_steps:
        # subbatch reuse: a fresh batch every `subbatch_steps` steps
        if step % tcfg.subbatch_steps == 0 and step > 0:
            with timer.phase("data"):
                batch = dist.make_global_batch(
                    make_batch(rng.choice(all_ts, global_bs,
                                          replace=False)),
                    (bsh, bsh, repl))
        key, sub = jax.random.split(key)
        with timer.phase("step_dispatch"):
            state, aux = step_fn(state, batch, sub)
        step += 1
        if step % 50 == 0 or step == 1:
            logger.log({"loss": float(aux["loss"]),
                        "grad_norm": float(aux["grad_norm"]),
                        "steps_per_s": 50 / max(time.time() - t0, 1e-9),
                        "phases": timer.summary()},
                       step)
            t0 = time.time()
        if step % gen_cfg.get("checkpointing_steps", 40000) == 0 \
                or step == num_steps:
            with timer.phase("checkpoint"):
                ckpt.save_state(mgr, step, jax.device_get(state))
        if val_src is not None and (step % val_every == 0
                                    or step == num_steps):
            with timer.phase("validation"):
                run_validation(step)
    mgr.wait_until_finished()
    logger.close()
    # returned for tests (warm-start / freezing assertions); ignored by
    # __main__ -- same contract as cli/train_ar.py
    return state


if __name__ == "__main__":
    main()
