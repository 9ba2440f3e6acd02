"""Science-gate rehearsal: approximate-path skill deltas on a TRAINED
real-scale (375M) checkpoint.

The int8 w8a8 and correction-skip paths are gated behind RMSE/CRPS
validation on a trained checkpoint (PERFORMANCE.md science gate). Real
LaDCast checkpoints/ERA5 are not in this image, so this rehearses the
gate end-to-end at the real 375M scale on synthetic-but-LEARNABLE latent
dynamics:

1. ``--make_data``: generate a latent trajectory under deterministic,
   norm-preserving dynamics (longitude advection + per-pair channel
   rotation -- weather-like: transport + slow internal oscillation),
   written in PHYSICAL latent units (un-normalized with the bundled
   84-vector stats) so the production train CLI / dataset normalization
   path sees realistic scales. Split into a train npz and a held-out
   eval npz.
2. Train the REAL 375M through the production CLI on the TPU:
     python -m ladcast_tpu.cli.train_ar --config configs/ladcast_375m.yaml \
       --latents train.npz --output_dir run --num_steps N --hub_export
3. ``--eval``: run the 20-member 240h rollout (host-stepped, identical
   member PRNG across variants) from held-out inits with the trained
   checkpoint, exact vs ``int8`` vs ``skip2``, and report lat-weighted
   ensemble-mean RMSE + CRPS per lead time in latent space (int8 and
   correction-skip only touch the DiT; decode stays exact bf16, so
   latent-space skill is the decisive comparison).

This does NOT open the gate -- only the published checkpoints + ERA5
2018 (scripts/acceptance_2018.sh) can -- but it upgrades the trained-
weights evidence from the round-3 toy proxy to the production model,
CLI, and hardware.
"""

import argparse
import json
import time

import numpy as np


def synth_trajectory(n_frames: int, seed: int, h: int = 15, w: int = 30,
                     c: int = 84) -> np.ndarray:
    """Normalized-scale latent trajectory (unit per-channel std at t=0)
    under z_{t+1} = R_pairs(roll_lon(z_t, 1)): exactly norm-preserving
    (orthogonal), deterministic, and learnable by a conditioned DiT."""
    rng = np.random.RandomState(seed)
    z = rng.randn(h, w, c)
    # smooth the initial condition (weather-like large scales)
    for ax in (0, 1):
        z = sum(np.roll(z, s, axis=ax) for s in (-2, -1, 0, 1, 2)) / 5.0
    z = (z - z.mean((0, 1))) / z.std((0, 1))
    th = rng.uniform(0.05, 0.3, c // 2)
    cth, sth = np.cos(th), np.sin(th)
    out = np.empty((n_frames, h, w, c), np.float32)
    out[0] = z
    for t in range(1, n_frames):
        zr = np.roll(out[t - 1], 1, axis=1)
        a, b = zr[..., 0::2], zr[..., 1::2]
        out[t, ..., 0::2] = a * cth - b * sth
        out[t, ..., 1::2] = a * sth + b * cth
    return out


def make_data(args):
    from ladcast_tpu import static_data
    from ladcast_tpu.data import time_utils

    zn = synth_trajectory(args.frames, args.seed)
    lm, ls = static_data.latent_mean_std()
    phys = (zn * ls + lm).astype(np.float32)  # physical latent units
    ts0 = args.start_ts
    ts = np.asarray([time_utils.add_hours_int(ts0, 6 * i)
                     for i in range(args.frames)], np.int64)
    n_tr = args.train_frames
    np.savez(args.train_out, latents=phys[:n_tr], timestamps=ts[:n_tr])
    np.savez(args.eval_out, latents=phys[n_tr:], timestamps=ts[n_tr:])
    print(f"wrote {args.train_out} ({n_tr} frames), "
          f"{args.eval_out} ({args.frames - n_tr} frames)")


def make_field_data(args):
    """FIELD-space rehearsal data for the production CLI chain (VERDICT
    r4 next-round #3): the synthetic latent dynamics are DECODED to
    physical ERA5-grid fields through a fixed randomly-initialized
    production DCAE, and the TRAINING latents are the ENCODE of those
    fields through the same DCAE -- the exact transform
    cli/pred_rollout applies at inference -- so the DiT trains on
    precisely the conditioning distribution the chain will feed it
    (encode(decode(z)) != z for an untrained AE; training on raw z would
    shift the input distribution). Writes:

      <dcae_out>            hub-layout DCAE dir shared by every stage
      <train_out>           (N_tr, 15, 30, 84) PHYSICAL latents npz for
                            cli.train_ar
      <eval_fields_out>     (N_ev, 120, 240, 84) PHYSICAL fields npz --
                            both pred_rollout --data and
                            evaluate_ens --truth

    Runs on the TPU (full-resolution decode of every frame).
    """
    import jax
    import jax.numpy as jnp

    from ladcast_tpu import static_data
    from ladcast_tpu.config import DCAEConfig
    from ladcast_tpu.data import time_utils, transforms
    from ladcast_tpu.models import hub
    from ladcast_tpu.models.dcae import AutoencoderDC
    from ladcast_tpu.rollout.pipeline import cast_pytree

    zn = synth_trajectory(args.frames, args.seed)
    lm, ls = static_data.latent_mean_std()
    fm, fs = static_data.era5_mean_std()
    static_cond = jnp.asarray(
        static_data.static_conditioning_tensor(layout="HWC"))
    z_phys = (zn * ls + lm).astype(np.float32)

    cfg = DCAEConfig()
    dcae = AutoencoderDC(cfg)
    params_f32 = jax.jit(dcae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 120, 240, 84)),
        jnp.zeros((120, 240, 5)))
    hub.save_pretrained(args.dcae_out, "dcae", cfg, params_f32)
    cdt = jnp.bfloat16
    params = cast_pytree(params_f32, cdt)

    fm_j, fs_j = jnp.asarray(fm), jnp.asarray(fs)

    @jax.jit
    def roundtrip(p, z_chunk):
        # physical latent -> normalized fields (decoder) -> physical
        # fields, then back through the encoder exactly as pred_rollout
        # does: normalize(raw) -> encode -> physical latent
        dec_norm = dcae.apply(p, z_chunk.astype(cdt),
                              method=AutoencoderDC.decode)
        dec_norm = dec_norm.astype(jnp.float32)
        f_phys = transforms.inverse_normalize(dec_norm, fm_j, fs_j, 1.0)
        f_norm = transforms.normalize(f_phys, fm_j, fs_j)
        z2 = dcae.apply(p, f_norm.astype(cdt), static_cond.astype(cdt),
                        method=AutoencoderDC.encode)
        return f_phys, z2.astype(jnp.float32)

    n_tr = args.train_frames
    if n_tr >= args.frames:
        raise SystemExit(
            f"--train_frames ({n_tr}) must be < --frames ({args.frames}): "
            "the eval window would be empty"
        )
    chunk = 20
    z_tr, f_ev = [], []
    t0 = time.time()
    for i in range(0, args.frames, chunk):
        f_phys, z2 = roundtrip(params, jnp.asarray(z_phys[i:i + chunk]))
        z2 = np.asarray(z2)
        z_tr.append(z2)
        if i + chunk > n_tr:  # eval window: fetch full-res fields
            f = np.asarray(f_phys)
            lo = max(n_tr - i, 0)
            f_ev.append(f[lo:])
        if i % 200 == 0:
            print(f"# roundtrip {i}/{args.frames} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    z_all = np.concatenate(z_tr)
    fields_ev = np.concatenate(f_ev)
    ts = np.asarray([time_utils.add_hours_int(args.start_ts, 6 * i)
                     for i in range(args.frames)], np.int64)
    np.savez(args.train_out, latents=z_all[:n_tr], timestamps=ts[:n_tr])
    # re-encoded eval latents too: the latent-space --eval A/B and the
    # field-space CLI chain then share one trained checkpoint
    np.savez(args.eval_out, latents=z_all[n_tr:], timestamps=ts[n_tr:])
    np.savez(args.eval_fields_out, fields=fields_ev, timestamps=ts[n_tr:])
    print(f"wrote {args.dcae_out}, {args.train_out} ({n_tr} latent "
          f"frames), {args.eval_out}, {args.eval_fields_out} "
          f"({fields_ev.shape[0]} field frames, "
          f"{ts[n_tr]}..{ts[-1]}) in {time.time() - t0:.0f}s")


def make_variant_runner(label, dit_cfg, sched_cfg, rcfg, dit_params):
    """Build a reusable host-stepped rollout runner (same math/PRNG as
    the scanned engine; bench.py pattern). The jitted repetition program
    and the bf16 param copy are created ONCE per variant and reused
    across init times (one compile + one device upload instead of one
    per (init, variant) pair). Returns
    ``run(known0, yps, rep_keys) -> (traj (E, T, h, w, C) norm, wall s)``.
    """
    import jax
    import jax.numpy as jnp

    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
    from ladcast_tpu.rollout.engine import make_repetition_fn
    from ladcast_tpu.rollout.pipeline import cast_pytree

    cdt = jnp.bfloat16
    dit = LaDCastTransformer3D(dit_cfg)
    params = cast_pytree(dit_params, cdt)

    def net_fn(p, lat, cn, cond, yp):
        out = dit.apply(p, lat.astype(cdt), cn, cond.astype(cdt), yp)
        return out.astype(jnp.float32)

    rep_fn = make_repetition_fn(sched_cfg, rcfg)

    @jax.jit
    def rep(p, known, yp, kk):
        return rep_fn(net_fn, p, known, yp, kk)

    warmed = []

    def run(known0, yps, rep_keys):
        def forecast():
            known = known0
            outs = []
            for r in range(rcfg.num_repetitions):
                known, samples = rep(params, known, jnp.asarray(yps[r]),
                                     rep_keys[r])
                outs.append(samples)
            traj = jnp.concatenate(outs, axis=1)[:, : rcfg.total_num_steps]
            return np.asarray(traj)

        if not warmed:
            forecast()  # compile + warm (first init time only)
            warmed.append(True)
        t0 = time.perf_counter()
        traj = forecast()
        wall = time.perf_counter() - t0
        assert np.isfinite(traj).all(), f"{label}: non-finite trajectory"
        return traj, wall

    return run


def evaluate(args):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ladcast_tpu import static_data
    from ladcast_tpu.cli.pred_rollout import _load_any_params
    from ladcast_tpu.config import (
        EDMSchedulerConfig,
        RolloutConfig,
        ladcast_375m_config,
    )
    from ladcast_tpu.data import time_utils
    from ladcast_tpu.metrics import scores
    from ladcast_tpu.metrics.weights import cos_lat_weights

    d = np.load(args.eval_data)
    lm, ls = static_data.latent_mean_std()
    zn = (d["latents"] - lm) / ls          # normalized (unit std)
    ts = d["timestamps"]
    sched_cfg = EDMSchedulerConfig()
    rcfg = RolloutConfig(ensemble_size=args.ensemble_size,
                         total_lead_time_hour=args.total_lead_time_hour)
    n_lead = rcfg.total_num_steps
    base_cfg = ladcast_375m_config()
    dit_params, base_cfg = _load_any_params(args.ckpt, "dit", base_cfg,
                                            subfolder=args.subfolder)

    variants = {
        "exact": (base_cfg, rcfg),
        "int8": (dataclasses.replace(base_cfg, int8_matmuls=True), rcfg),
        "skip2": (base_cfg,
                  dataclasses.replace(rcfg, correction_skip_period=2)),
        # compound point: both approximations at once (they compose in
        # production via --correction_skip_period + LADCAST_INT8)
        "int8_skip2": (dataclasses.replace(base_cfg, int8_matmuls=True),
                       dataclasses.replace(rcfg, correction_skip_period=2)),
    }
    wanted = args.variants.split(",")
    for name in wanted:
        # "dpm<NFE>" (e.g. dpm20, dpm10): the reference's OWN second
        # sampler (pipeline_AR.py DPM-Solver++ 2M) at <NFE> network evals
        # per chunk vs Heun's 2N-1 -- EXACT reference-sanctioned math,
        # not an approximation (VERDICT r4 next-round #1). Same rep_keys
        # as every other variant => the initial member noise draws are
        # identical (both samplers scale the same unit draw by sigma[0]).
        if name.startswith("dpm") and name not in variants:
            nfe = int(name[3:])
            variants[name] = (base_cfg, dataclasses.replace(
                rcfg, sampler_type="dpm", num_inference_steps=nfe))

    # latent-grid lat weights (the 15-row grid the trainer also weights;
    # mean-1 normalized). Metric helpers reduce over trailing (lat, lon),
    # so channels-last (h, w, C) arrays are moved to (..., C, h, w).
    w_hw = jnp.asarray(cos_lat_weights(np.linspace(-83.25, 84.75, 15)),
                       jnp.float32).reshape(15, 1)
    w_hwc = w_hw.reshape(15, 1, 1)

    init_idxs = [int(i) for i in args.init_idxs.split(",")]
    runners = {name: make_variant_runner(name, variants[name][0], sched_cfg,
                                         variants[name][1], dit_params)
               for name in wanted}
    results = {k: {"rmse": [], "crps": [], "wall": []} for k in wanted}
    spread_ref = []
    for t0i in init_idxs:
        truth = jnp.asarray(zn[t0i + 1: t0i + 1 + n_lead])  # (T, h, w, C)
        known0 = jnp.broadcast_to(
            jnp.asarray(zn[t0i][None, None]),
            (rcfg.ensemble_size, rcfg.input_seq_len, *zn.shape[1:]))
        yps = time_utils.rollout_year_progress(
            int(ts[t0i]), rcfg.num_repetitions,
            rcfg.return_seq_len * rcfg.step_size_hour)
        # identical member PRNG for every variant: noise-matched A/B
        rep_keys = jax.random.split(jax.random.PRNGKey(args.seed + t0i),
                                    rcfg.num_repetitions)
        for name in wanted:
            traj, wall = runners[name](known0, yps, rep_keys)
            tj = jnp.asarray(traj)
            rmse = [float(scores.lat_weighted_rmse(
                jnp.moveaxis(tj[:, t].mean(0), -1, 0),
                jnp.moveaxis(truth[t], -1, 0), w_hw).mean())
                for t in range(n_lead)]
            crps = [float((scores.crps(tj[:, t], truth[t]) * w_hwc).mean()
                          / w_hwc.mean()) for t in range(n_lead)]
            results[name]["rmse"].append(rmse)
            results[name]["crps"].append(crps)
            results[name]["wall"].append(wall)
            if name == "exact":
                spread_ref.append([float(scores.ensemble_spread(
                    jnp.moveaxis(tj[:, t], -1, 1), w_hw).mean())
                    for t in range(n_lead)])
            print(f"# init {ts[t0i]} {name}: wall {wall:.1f}s "
                  f"rmse[0/{n_lead - 1}] {rmse[0]:.4f}/{rmse[-1]:.4f} "
                  f"crps[0/{n_lead - 1}] {crps[0]:.4f}/{crps[-1]:.4f}",
                  flush=True)

    summary = {}
    for name in wanted:
        r = np.asarray(results[name]["rmse"]).mean(0)   # (T,) over inits
        c = np.asarray(results[name]["crps"]).mean(0)
        summary[name] = {
            "rmse_mean": round(float(r.mean()), 5),
            "crps_mean": round(float(c.mean()), 5),
            "rmse_lead": [round(float(v), 5) for v in r],
            "wall_s": round(float(np.mean(results[name]["wall"])), 2),
        }
    if "exact" in summary:
        for name in wanted:
            if name == "exact":
                continue
            summary[name]["rmse_rel_delta_vs_exact"] = round(
                summary[name]["rmse_mean"] / summary["exact"]["rmse_mean"]
                - 1.0, 5)
            summary[name]["crps_rel_delta_vs_exact"] = round(
                summary[name]["crps_mean"] / summary["exact"]["crps_mean"]
                - 1.0, 5)
    if spread_ref:
        summary["exact_ens_spread_mean"] = round(
            float(np.asarray(spread_ref).mean()), 5)
    print(json.dumps(summary))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--make_data", action="store_true")
    ap.add_argument("--make_field_data", action="store_true",
                    help="field-space chain data: decode the synthetic "
                         "latents to full-res fields through a fixed "
                         "random DCAE and train on their re-encodings "
                         "(the production-CLI-chain rehearsal input)")
    ap.add_argument("--dcae_out", default="/tmp/rehearsal_dcae")
    ap.add_argument("--eval_fields_out",
                    default="/tmp/rehearsal_eval_fields.npz")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--frames", type=int, default=1480)
    ap.add_argument("--start_ts", type=int, default=2016010100,
                    help="first timestamp (YYYYMMDDHH); default inside "
                         "the production yaml's 1979-2017 date filter")
    ap.add_argument("--train_frames", type=int, default=1400)
    ap.add_argument("--train_out", default="/tmp/rehearsal_train.npz")
    ap.add_argument("--eval_out", default="/tmp/rehearsal_eval.npz")
    ap.add_argument("--eval_data", default="/tmp/rehearsal_eval.npz")
    ap.add_argument("--ckpt", default=None,
                    help="hub dir / orbax dir / safetensors of the "
                         "trained 375M (train CLI --hub_export output)")
    ap.add_argument("--subfolder", default=None,
                    help="hub subfolder override (e.g. ar_model to score "
                         "the raw weights; default prefers ar_model_ema)")
    ap.add_argument("--variants", default="exact,int8,skip2")
    ap.add_argument("--ensemble_size", type=int, default=20)
    ap.add_argument("--total_lead_time_hour", type=int, default=240)
    ap.add_argument("--init_idxs", default="0,12,24",
                    help="indices INTO THE EVAL NPZ used as init times "
                         "(each needs 40 later frames present)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.make_data:
        make_data(args)
    if args.make_field_data:
        make_field_data(args)
    if args.eval:
        assert args.ckpt, "--eval requires --ckpt"
        evaluate(args)


if __name__ == "__main__":
    main()
