"""Ensemble scoring CLI: lat-weighted ens-mean RMSE, CRPS, ACC per
(channel, lead time).

TPU-native equivalent of the reference evaluate/evaluate_ens_gpu.py:127-493:
loads per-init-time latent ``.npy`` rollouts (reference layout
(ens, C, T+1, h, w)), decodes members on-device, scores every lead time
against ERA5 truth (and a day-of-year/hour climatology for ACC) without
leaving HBM, and aggregates across init times. SST (channel 82) uses
nan-aware means over ocean points (truth NaNs).

Truth source: ERA5 zarr (xarray) or an .npz bundle (see pred_rollout).
Climatology: optional .npz with array (366*4 or dayofyear-hour keyed).
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu import channels as ch, static_data
from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.data import time_utils, transforms
from ladcast_tpu.metrics import scores
from ladcast_tpu.metrics.weights import grid_lat_weights
from ladcast_tpu.models.dcae import AutoencoderDC


def make_score_fn(dcae, dcae_params, lat_w, field_stats=None,
                  diagnostics=False, ens_mesh=None):
    """Jitted per-init-time scorer: latents + truth -> per-(C, T) metrics.

    ``latents`` arrive in PHYSICAL latent scale -- the scale the
    reference pred_rollout writes its ``latent_*.npy`` files in
    (roll_out_serial applies the inverse latent transform before storing,
    pipelines/utils.py:565-573) and that decode_latent_ens consumes
    directly (evaluate_ens_gpu.py:300-304). Decoded fields are
    unnormalized with ``field_stats`` so all metrics are in physical
    units against physical truth, as in the reference loop.

    ``ens_mesh``: optional 1-D device mesh; members are sharded over its
    axis through the decode (the scorer's FLOPs) via sharding
    constraints. GSPMD pads uneven member counts internally, so metrics
    are unchanged; the metric reductions over members lower to
    collectives.
    """
    if field_stats is None:
        field_stats = static_data.era5_mean_std()
    fm, fs = (jnp.asarray(field_stats[0], jnp.float32),
              jnp.asarray(field_stats[1], jnp.float32))
    ens_spec = None
    if ens_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        (ens_ax,) = ens_mesh.axis_names
        ens_spec = NamedSharding(ens_mesh, P(None, ens_ax))

    @jax.jit
    def _score(p, z, truth, climate):
        # z: (E, T, h, w, C) physical latents; truth/climate:
        # (T, H, W, C) physical.
        #
        # One lead time per lax.map step, metrics reduced INSIDE the
        # step: the full decoded ensemble (E, T, H, W, C) is ~8 GB fp32
        # at the production protocol (20 members x 41 leads full-res)
        # and materializing it plus decode temps OOMed a 16 GB v5e
        # (37.7 GB HBM ask, round-5 chain run). Every metric reduces
        # over trailing (lat, lon) per lead, so only (E, H, W, C) for
        # ONE lead is ever live.
        zT = jnp.swapaxes(z, 0, 1)  # (T, E, h, w, C)
        if ens_spec is not None:
            # lax.map steps over lead times; shard each step's members
            # so every step decodes in parallel on all devices
            zT = jax.lax.with_sharding_constraint(zT, ens_spec)

        lw = lat_w.reshape(-1, 1)
        lwv = lat_w.astype(jnp.float32)

        def per_lead(args):
            zz, tr_t, cl_t = args  # (E, h, w, C), (H, W, C), (H, W, C)
            dec = dcae.apply(p, zz, method=AutoencoderDC.decode)
            dec = transforms.inverse_normalize(dec, fm, fs, 1.0)

            # nan-aware reductions throughout: truth NaNs exist only in
            # the SST channel over land (the reference uses nanmean
            # there, evaluate_ens_gpu.py:339-419); for NaN-free channels
            # nanmean equals mean, so one code path covers all channels.
            fc = jnp.moveaxis(dec, -1, 0)    # (C, E, H, W)
            tr = jnp.moveaxis(tr_t, -1, 0)   # (C, H, W)
            cl = jnp.moveaxis(cl_t, -1, 0)
            ens_mean = fc.mean(axis=1)
            mse = scores.lat_weighted_mse(ens_mean, tr, lw, nan_safe=True)
            crps_map = scores.crps(fc, tr[:, None], ensemble_axis=1)
            crps_v = jnp.nanmean(crps_map * lw, axis=(-2, -1))
            acc_v = scores.acc(ens_mean, tr, cl, lw, nan_safe=True)
            out = {"ens_mean_mse": mse, "crps": crps_v, "acc": acc_v}
            if diagnostics:
                # Ensemble-calibration diagnostics (beyond the
                # reference): spread (for the spread/skill ratio), rank
                # histogram, and zonal power spectra of ens-mean vs
                # truth (blur check). Truth NaNs (SST land) are
                # zero-weighted / zero-filled for the spectrum (channel
                # 82's spectrum is indicative only).
                valid = jnp.isfinite(tr)
                out["spread"] = scores.ensemble_spread(
                    fc, lw, ensemble_axis=1, nan_mask=valid)
                out["rank_hist"] = scores.rank_histogram(
                    fc, tr, lw, ensemble_axis=1)
                out["spectrum_fc"] = scores.zonal_power_spectrum(
                    ens_mean, lwv)
                out["spectrum_truth"] = scores.zonal_power_spectrum(
                    jnp.nan_to_num(tr), lwv)
            return out

        outs = jax.lax.map(per_lead, (zT, truth, climate))
        # every metric was (C, T, ...) in the all-leads formulation;
        # lax.map stacks the lead axis first -> move it back to axis 1
        return jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1), outs)

    def score(latents_phys, truth, climate):
        # params passed explicitly: closure-captured trees stall/overflow
        # remote compiles (see rollout/pipeline.py note)
        return _score(dcae_params, latents_phys, truth, climate)

    return score


def merge_rank_shards(output_dir, keys, n_ranks):
    """Host-0 merge of per-rank metric shard files.

    Ranks may have scored different numbers of init times (skips are
    per-rank), so this concatenates only non-empty shards -- the reason
    shard files are used instead of a collective gather
    (evaluate_ens_gpu.py:448-468 gathers, which requires equal counts).
    Writes and returns the merged ``<key>.npy`` arrays.
    """
    merged = {}
    for k in keys:
        parts = [np.load(os.path.join(output_dir, f"{k}.rank{r}.npy"))
                 for r in range(n_ranks)]
        parts = [p for p in parts if p.shape[0] > 0]
        merged[k] = np.concatenate(parts) if parts \
            else np.zeros((0, 1, 1), np.float32)
        np.save(os.path.join(output_dir, f"{k}.npy"), merged[k])
    return merged


def init_time_from_filename(path):
    """YYYYMMDDHH init time from the ``latent_{ts}.npy`` convention that
    cli/pred_rollout.py writes (single definition shared by the date
    filter and the scoring loop)."""
    return int(os.path.basename(path).split("_")[-1].split(".")[0])


def derive_lead_budget(files, crop_init, step_size_hour,
                       total_lead_time_hour=None):
    """The lead-time budget ``--end_date`` must reserve. When
    --total_lead_time_hour is not given, derive it from the artifacts
    themselves (mmap reads only the npy header) so ``--end_date`` alone
    still enforces the reference rule init <= end - total_lead
    (evaluate_ens_gpu.py:213-215). Files hold (E, C, T[+1], h, w) with a
    leading init frame unless --no_crop_init."""
    if total_lead_time_hour is not None or not files:
        return total_lead_time_hour
    shape = np.load(files[0], mmap_mode="r").shape
    n_lead = shape[2] - 1 if crop_init else shape[2]
    return n_lead * step_size_hour


def filter_latent_files(files, start_date=None, end_date=None,
                        total_lead_time_hour=None):
    """Restrict latent_*.npy files to init times in [start, end - lead]
    (the reference bounds scoring so the full forecast's truth exists
    before end_date, evaluate_ens_gpu.py:213-215)."""
    if not (start_date or end_date):
        return files
    lo, hi = time_utils.date_bounds(start_date, end_date,
                                    total_lead_time_hour or 0)
    return [f for f in files if lo <= init_time_from_filename(f) <= hi]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--latent_dir", required=True)
    ap.add_argument("--truth", required=True, help="ERA5 zarr or .npz")
    ap.add_argument("--climatology", default=None,
                    help=".npz with key 'clim' of shape (366, 4, lat, "
                         "lon, C) -- day-of-year rows indexed tm_yday-1, "
                         "hour bins 0/6/12/18 indexed hour//6, channels "
                         "in channels.channel_names() order. Produce it "
                         "with cli/compute_climatology.py (from local "
                         "ERA5) or cli/convert_wb2_climatology.py (from "
                         "a WB2 climatology zarr); the two are "
                         "interchangeable.")
    ap.add_argument("--allow_truth_mean_climatology", action="store_true",
                    help="without --climatology, substitute the time-mean "
                         "of the truth window as climatology for ACC. This "
                         "is NOT a real climatology (the reference requires "
                         "a WB2 one); ACC values are then only indicative.")
    ap.add_argument("--dcae_params", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--step_size_hour", type=int, default=6)
    ap.add_argument("--start_date", default=None,
                    help="YYYY-MM-DD[Thh]: score only init times >= this "
                         "(reference --start_date, evaluate_ens_gpu.py:83)")
    ap.add_argument("--end_date", default=None,
                    help="YYYY-MM-DD[Thh]: score only init times whose "
                         "FULL forecast fits before this, i.e. init <= "
                         "end - total_lead (evaluate_ens_gpu.py:213-215)")
    ap.add_argument("--total_lead_time_hour", type=int, default=None,
                    help="score only the first N=total/step lead frames "
                         "(default: every frame in the latent files); "
                         "also the lead budget --end_date reserves")
    ap.add_argument("--no_crop_init", dest="crop_init",
                    action="store_false", default=True,
                    help="score ALL frames: for latent files that do not "
                         "carry the t=0 analysis frame (reference "
                         "--crop_init semantics, evaluate_ens_gpu.py:"
                         "113-116; our pred_rollout always includes t=0, "
                         "so cropping is the default)")
    ap.add_argument("--force_ens_size", type=int, default=None,
                    help="score only the first N members "
                         "(evaluate_ens_gpu.py:118-122)")
    ap.add_argument("--diagnostics", action="store_true",
                    help="also compute ensemble-calibration diagnostics "
                         "(beyond the reference): spread + spread/skill "
                         "ratio, rank histogram, zonal power spectra of "
                         "ens-mean vs truth")
    ap.add_argument("--plot_diagnostics", default=None, metavar="PNG",
                    help="with --diagnostics: write the calibration "
                         "panel figure (RMSE vs spread, rank histograms, "
                         "spectra) to this path")
    ap.add_argument("--shard_ensemble", action="store_true",
                    help="shard ensemble members over all local devices "
                         "through the decode (the scorer's FLOPs) via a "
                         "1-D 'ens' mesh -- the single-host pod "
                         "deployment mode; metrics are unchanged. "
                         "Multi-HOST work split stays the process-strided "
                         "init-time sharding")
    args = ap.parse_args(argv)

    if args.climatology is None and not args.allow_truth_mean_climatology:
        ap.error("--climatology is required for ACC (or pass "
                 "--allow_truth_mean_climatology to accept an indicative "
                 "truth-window-mean substitute)")

    from ladcast_tpu.cli.pred_rollout import _load_any_params, \
        open_field_source

    dcae_params, dcae_cfg = _load_any_params(
        args.dcae_params, "dcae", DCAEConfig())
    dcae = AutoencoderDC(dcae_cfg)
    # npz bundle / zarr store / monthly-tar dir, same as pred_rollout
    truth_src, _ = open_field_source(args.truth)
    clim = np.load(args.climatology)["clim"] if args.climatology else None

    lat_w = jnp.asarray(grid_lat_weights("cos"), jnp.float32)
    files = sorted(glob.glob(os.path.join(args.latent_dir, "latent_*.npy")))
    lead_budget = (derive_lead_budget(files, args.crop_init,
                                      args.step_size_hour,
                                      args.total_lead_time_hour)
                   if args.end_date else args.total_lead_time_hour)
    files = filter_latent_files(files, args.start_date, args.end_date,
                                lead_budget)
    files = files[jax.process_index()::jax.process_count()]

    score_fn = None
    acc_metrics = []
    for f in files:
        ts = init_time_from_filename(f)
        # (E, C, T+1, h, w) reference layout, PHYSICAL latent scale
        # (see make_score_fn docstring)
        arr = np.load(f)
        if args.force_ens_size is not None:
            arr = arr[: args.force_ens_size]
        lat = np.moveaxis(arr, 1, -1)
        if args.crop_init:
            lat = lat[:, 1:]  # drop t=0 -> (E, T, h, w, C)
        if args.total_lead_time_hour is not None:
            lat = lat[:, : args.total_lead_time_hour // args.step_size_hour]
        T = lat.shape[1]
        lead_ts = [time_utils.add_hours_int(ts, args.step_size_hour * (i + 1))
                   for i in range(T)]
        try:
            truth = truth_src.frames_at(lead_ts)  # (T, H, W, C) physical
        except (KeyError, ValueError) as e:
            print(json.dumps({"init_time": ts, "skipped": str(e)[:120]}),
                  flush=True)
            continue
        if clim is not None:
            cl = np.stack([
                clim[time_utils.int_to_datetime(t).timetuple().tm_yday - 1,
                     time_utils.int_to_datetime(t).hour // 6]
                for t in lead_ts])
        else:
            cl = np.broadcast_to(np.nanmean(truth, axis=0, keepdims=True),
                                 truth.shape)
        if score_fn is None:
            ens_mesh = None
            if args.shard_ensemble:
                from ladcast_tpu.parallel.mesh import make_mesh

                ens_mesh = make_mesh("ens", jax.local_devices())
            score_fn = make_score_fn(dcae, dcae_params, lat_w,
                                     diagnostics=args.diagnostics,
                                     ens_mesh=ens_mesh)
        m = score_fn(jnp.asarray(lat, jnp.float32),
                     jnp.asarray(truth, jnp.float32),
                     jnp.asarray(cl, jnp.float32))
        acc_metrics.append({k: np.asarray(v) for k, v in m.items()})
        print(json.dumps({"init_time": ts, "scored": True}), flush=True)

    # per-process shard files, then host-0 merges -- the reference gathers
    # metric tensors to the main process before saving
    # (evaluate_ens_gpu.py:448-468); plain gather can't be used here
    # because processes may skip different numbers of init times.
    from ladcast_tpu.parallel import dist

    os.makedirs(args.output_dir, exist_ok=True)
    rank = dist.process_index()
    keys = ["ens_mean_mse", "crps", "acc"]
    if args.diagnostics:
        keys += ["spread", "rank_hist", "spectrum_fc", "spectrum_truth"]
    for k in keys:
        stacked = (np.stack([m[k] for m in acc_metrics]) if acc_metrics
                   else np.zeros((0, 1, 1), np.float32))  # (N, C, T, ...)
        np.save(os.path.join(args.output_dir, f"{k}.rank{rank}.npy"),
                stacked)
    dist.barrier("scorer-shards-written")
    if rank != 0:
        return

    merged = merge_rank_shards(args.output_dir, keys,
                               dist.process_count())

    if merged["crps"].shape[0] == 0:
        raise SystemExit(
            "no init times were scored on any rank (all shard files "
            "empty) -- check --latent_dir / --truth arguments")

    # Human-readable summary table: per-variable ens-mean RMSE/CRPS at
    # day 1/5/10 (the headline figure layout, assets/2018_rmse.png;
    # variables/levels follow BASELINE.md's digitized tables).
    mse = merged["ens_mean_mse"].mean(0)
    crps = merged["crps"].mean(0)
    T = mse.shape[1]
    leads = {}
    for d in (1, 5, 10):
        t = d * 24 // args.step_size_hour - 1
        if t < T:
            leads[f"day{d}"] = t
    if not leads:  # short rollout: report the final lead time
        leads["final"] = T - 1
    headline = [("geopotential", 500), ("geopotential", 850),
                ("temperature", 500), ("temperature", 850),
                ("u_component_of_wind", 500), ("u_component_of_wind", 850),
                ("specific_humidity", 500), ("specific_humidity", 850),
                ("mean_sea_level_pressure", None),
                ("2m_temperature", None)]
    summary = {}
    spread = merged["spread"].mean(0) if args.diagnostics else None
    # fair finite-ensemble factor: calibrated iff RMSE == spread*sqrt((M+1)/M)
    fair = (np.sqrt((merged["rank_hist"].shape[-1])
                    / (merged["rank_hist"].shape[-1] - 1.0))
            if args.diagnostics and merged["rank_hist"].ndim == 4 else 1.0)
    for var, level in headline:
        try:
            ci = ch.channel_index(var, level)
        except (ValueError, AssertionError):
            continue
        name = f"{var}@{level}" if level else var
        summary[name] = {
            k: {"rmse": round(float(np.sqrt(mse[ci, t])), 4),
                "crps": round(float(crps[ci, t]), 4)}
            for k, t in leads.items()}
        if spread is not None:
            for k, t in leads.items():
                rmse_v = float(np.sqrt(mse[ci, t]))
                summary[name][k]["spread"] = round(float(spread[ci, t]), 4)
                summary[name][k]["ssr"] = round(
                    float(spread[ci, t]) * fair / max(rmse_v, 1e-12), 4)
    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if args.plot_diagnostics and args.diagnostics:
        from ladcast_tpu.utils.visualization import plot_ens_diagnostics
        plot_ens_diagnostics(args.output_dir, args.plot_diagnostics,
                             step_size_hour=args.step_size_hour)
    print(json.dumps({"num_init_times": int(merged["crps"].shape[0]),
                      "saved": args.output_dir,
                      "summary": summary}))


if __name__ == "__main__":
    main()
