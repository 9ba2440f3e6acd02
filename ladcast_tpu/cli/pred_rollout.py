"""Distributed ensemble-forecast generation CLI.

TPU-native equivalent of the reference evaluate/pred_rollout.py:218-515:
build the evaluation init-time list (N samples/month at 00z/12z), load
DCAE + DiT params, shard init times across hosts
(``jax.process_index()``-strided, replacing accelerate
``split_between_processes``), run the on-device ensemble rollout per init
time, and write per-init-time latent ``.npy`` files (ens, C, T+1, h, w)
in the reference layout (channels-first, t=0 = encoded analysis) or
decoded fields.

ERA5 input: a zarr path (requires xarray; reference data layout) or an
``.npz`` bundle with arrays ``fields`` (time, lat, lon, 84) normalized=raw
and ``timestamps`` (YYYYMMDDHH ints) for the minimal image.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu import channels as ch, static_data
from ladcast_tpu.config import (
    DCAEConfig,
    EDMSchedulerConfig,
    RolloutConfig,
    ladcast_1p6b_config,
    ladcast_375m_config,
)
from ladcast_tpu.data import time_utils, transforms
from ladcast_tpu.rollout.pipeline import ForecastPipeline
from ladcast_tpu.train.checkpoint import load_params


class NpzFieldSource:
    """(time, lat, lon, 84) raw fields + YYYYMMDDHH ints."""

    def __init__(self, path: str):
        d = np.load(path)
        self.fields = d["fields"]
        self.timestamps = list(d["timestamps"].astype(np.int64))

    def frames_at(self, ts_ints):
        idx = [self.timestamps.index(int(t)) for t in ts_ints]
        return self.fields[idx]


class ZarrFieldSource:
    """Reference ERA5 zarr (south pole cropped at read)."""

    def __init__(self, path: str):
        import pandas as pd
        import xarray as xr

        ds = xr.open_zarr(path)
        self.ds = ds.sel(latitude=slice(ch.LAT_START_DEG, ch.LAT_END_DEG))
        self._pd = pd

    def frames_at(self, ts_ints):
        # ONE batched .sel per call (a per-timestamp/per-variable loop
        # issues T x 19 tiny zarr round trips -- hopeless against the
        # 3 TB archive; a batched select reads each chunk once).
        times = np.asarray([
            np.datetime64(time_utils.int_to_datetime(int(t)))
            for t in ts_ints])
        sel = self.ds.sel(time=times)
        stack = []
        for var in ch.ATM_VARIABLES:
            v = sel[var].sel(level=list(ch.PRESSURE_LEVELS)).transpose(
                "time", "level", "latitude", "longitude").values
            stack.append(v)
        for var in ch.SURFACE_VARIABLES:
            stack.append(sel[var].transpose(
                "time", "latitude", "longitude").values[:, None])
        return np.moveaxis(np.concatenate(stack, 1), 1, -1) \
            .astype(np.float32)


def open_field_source(path: str, split: str = None):
    """Open an ERA5 field source: ``.npz`` bundle, zarr store, or a
    directory of monthly tars (reference webdataset layout). Returns
    (source, timestamps int64); ``split`` filters to the reference
    WeatherDataset year ranges (train 1979-2017 / validation 2018 /
    test 2022 / full / per-year -- weather_dataset.py:14-48)."""
    from ladcast_tpu.data import era5_tar

    if path.endswith(".npz"):
        src = NpzFieldSource(path)
        ts = np.asarray(src.timestamps, np.int64)
    elif os.path.isdir(path):
        src = era5_tar.TarFieldSource(path)
        return src, era5_tar.available_timestamps(path, split or "full")
    else:
        import pandas as pd
        src = ZarrFieldSource(path)
        ts = np.asarray([int(t.strftime("%Y%m%d%H")) for t in
                         pd.to_datetime(src.ds.time.values)], np.int64)
    if split:
        ts = era5_tar.split_timestamps(ts, split)
    return src, ts


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="ERA5 zarr or .npz bundle")
    ap.add_argument("--dit_params", required=True,
                    help="orbax params dir, .safetensors file, or a "
                         "diffusers model/training-checkpoint directory "
                         "(config taken from its config.json)")
    ap.add_argument("--dcae_params", required=True)
    ap.add_argument("--dit_subfolder", default=None,
                    help="subfolder inside --dit_params (e.g. ar_model vs "
                         "the default-preferred ar_model_ema)")
    ap.add_argument("--dcae_subfolder", default=None)
    ap.add_argument("--model", default="375M", choices=["375M", "1.6B"],
                    help="DiT config when --dit_params is not a diffusers "
                         "directory (ignored otherwise)")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--year", type=int, default=2018)
    ap.add_argument("--start_date", default=None,
                    help="YYYY-MM-DD[Thh]: evaluate a date range instead "
                         "of --year (reference --start_date/--end_date, "
                         "pred_rollout.py:110-117); per-month sampling "
                         "still applies inside the range")
    ap.add_argument("--end_date", default=None,
                    help="YYYY-MM-DD[Thh] range end (inclusive); requires "
                         "--start_date")
    ap.add_argument("--num_samples_per_month", type=int, default=10)
    ap.add_argument("--ensemble_size", type=int, default=20)
    ap.add_argument("--num_inference_steps", type=int, default=20)
    ap.add_argument("--return_seq_len", type=int, default=4)
    ap.add_argument("--input_seq_len", type=int, default=1)
    ap.add_argument("--total_lead_time_hour", type=int, default=240)
    ap.add_argument("--step_size_hour", type=int, default=6)
    ap.add_argument("--noise_level", type=float, default=0.0)
    ap.add_argument("--sampler", default="edm", choices=["edm", "dpm"])
    ap.add_argument("--correction_skip_period", type=int, default=0,
                    help="opt-in APPROXIMATE acceleration: evaluate only "
                         "every N-th Heun correction, extrapolate the "
                         "rest (diffusion/samplers.py; 0 = exact)")
    ap.add_argument("--int8_matmuls", action="store_true",
                    help="opt-in APPROXIMATE acceleration: dynamic w8a8 "
                         "int8 DiT matmuls on the int8 MXU path "
                         "(ops/quant.py); validate skill before "
                         "production use")
    ap.add_argument("--shard_ensemble", action="store_true",
                    help="shard ensemble members (and decode frames) over "
                         "all local devices via a 1-D 'ens' mesh — the "
                         "single-host pod deployment mode; results are "
                         "identical to single-device (member PRNG is "
                         "index-folded). Multi-HOST work split stays the "
                         "process-strided init-time sharding")
    ap.add_argument("--host_step", action="store_true",
                    help="drive the AR loop from the host (one jitted "
                         "repetition per dispatch) instead of one "
                         "monolithic scanned program -- identical "
                         "math/PRNG, much smaller compiles and short "
                         "device executions (for remote-attached chips)")
    ap.add_argument("--save_as_latent", action="store_true", default=True)
    ap.add_argument("--decode", dest="save_as_latent", action="store_false")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    # validate flag pairing before the (slow) checkpoint loads
    if (args.start_date is None) != (args.end_date is None):
        ap.error("--start_date and --end_date must be given together")

    rcfg = RolloutConfig(
        ensemble_size=args.ensemble_size,
        num_inference_steps=args.num_inference_steps,
        return_seq_len=args.return_seq_len,
        input_seq_len=args.input_seq_len,
        total_lead_time_hour=args.total_lead_time_hour,
        step_size_hour=args.step_size_hour,
        noise_level=args.noise_level,
        sampler_type=args.sampler,
        correction_skip_period=args.correction_skip_period)
    dit_cfg = (ladcast_375m_config() if args.model == "375M"
               else ladcast_1p6b_config())
    dcae_cfg = DCAEConfig()
    sched_cfg = EDMSchedulerConfig()

    dit_params, dit_cfg = _load_any_params(
        args.dit_params, "dit", dit_cfg, args.dit_subfolder)
    dcae_params, dcae_cfg = _load_any_params(
        args.dcae_params, "dcae", dcae_cfg, args.dcae_subfolder)
    if args.int8_matmuls:
        import dataclasses as _dc
        dit_cfg = _dc.replace(dit_cfg, int8_matmuls=True)

    ens_mesh = None
    if args.shard_ensemble:
        from ladcast_tpu.parallel.mesh import make_mesh

        ens_mesh = make_mesh("ens", jax.local_devices())
        n_dev = len(ens_mesh.devices.ravel())
        if args.ensemble_size % n_dev:
            print(f"# note: ensemble_size {args.ensemble_size} is not a "
                  f"multiple of {n_dev} devices; the pipeline pads the "
                  f"member axis and discards the extras (correct, "
                  f"slightly unbalanced)", flush=True)

    pipe = ForecastPipeline(dit_cfg, dcae_cfg, sched_cfg, rcfg,
                            dit_params, dcae_params, ens_mesh=ens_mesh,
                            host_step=args.host_step)

    source = (NpzFieldSource(args.data) if args.data.endswith(".npz")
              else ZarrFieldSource(args.data))

    if args.start_date:
        init_times = time_utils.filter_eval_timestamps_range(
            time_utils.date_str_to_int(args.start_date),
            time_utils.date_str_to_int(args.end_date),
            args.num_samples_per_month)
    else:
        init_times = time_utils.filter_eval_timestamps(
            [args.year], args.num_samples_per_month)
    # host-level work sharding (reference split_between_processes)
    init_times = init_times[jax.process_index()::jax.process_count()]

    os.makedirs(args.output_dir, exist_ok=True)
    fm, fs = static_data.era5_mean_std()
    key = jax.random.PRNGKey(args.seed)

    for ts in init_times:
        t0 = time.time()
        # per-init key: fold the init TIMESTAMP (not a sequential split)
        # so a given (seed, init_time) forecast is identical regardless
        # of process count, init-time striding, or restart point — the
        # same invariance contract as the member-index folding inside
        # the engine (tests/test_multihost.py asserts 2-proc == 1-proc)
        sub = jax.random.fold_in(key, ts)
        input_ts = [time_utils.add_hours_int(ts, -args.step_size_hour * i)
                    for i in range(args.input_seq_len - 1, -1, -1)]
        try:
            raw = source.frames_at(input_ts)  # (T_in, lat, lon, 84)
        except (KeyError, ValueError) as e:
            print(json.dumps({"init_time": ts, "skipped": str(e)[:120]}),
                  flush=True)
            continue
        fields = transforms.normalize(raw, fm, fs)
        fields = np.where(
            np.isnan(fields), -2.0, fields).astype(np.float32)  # SST mask
        traj, decoded, z_analysis = pipe.forecast_from_fields(
            jnp.asarray(fields), ts, sub, decode=not args.save_as_latent)

        # prepend the t=0 encoded analysis frame and convert to the
        # reference's npy convention: channels-first (ens, C, T+1, h, w)
        # in PHYSICAL latent scale -- roll_out_serial stores the raw
        # encoder output at timedelta 0 (pipelines/utils.py:495-504) and
        # inverse-transformed samples after (utils.py:565-573), so these
        # files interchange with the reference scorer and vice versa.
        z0 = z_analysis[-1]
        z0 = jnp.broadcast_to(z0[None, None], (rcfg.ensemble_size, 1,
                                               *z0.shape))
        full = jnp.concatenate([z0, pipe.unnormalize_latent(traj)], axis=1)
        out = np.moveaxis(np.asarray(full), -1, 1)  # (E, C, T+1, h, w)
        np.save(os.path.join(args.output_dir, f"latent_{ts}.npy"), out)
        if decoded is not None:
            # georeferenced bundle (fields + JSON coords), the format
            # cli/track.py and the export/zarr tooling consume
            from ladcast_tpu.evaluate.export import decoded_to_npz
            decoded_to_npz(np.asarray(decoded), ts,
                           os.path.join(args.output_dir,
                                        f"fields_{ts}.npz"),
                           step_size_hour=args.step_size_hour)
        print(json.dumps({"init_time": ts,
                          "seconds": round(time.time() - t0, 2)}),
              flush=True)


def _load_any_params(path: str, kind: str, cfg, subfolder: str = None):
    """Load (params, config) from any supported checkpoint layout.

    - bare ``.safetensors`` file (reference state dict): converted against
      the caller-supplied ``cfg``
    - diffusers model directory (hub layout, incl. training checkpoints
      with ``ar_model``/``ar_model_ema`` subfolders, single or
      index-sharded safetensors): config parsed from its ``config.json``
      — the caller's ``cfg`` is ignored
    - anything else: orbax params directory, caller-supplied ``cfg``
    """
    from ladcast_tpu.models import hub

    if path.endswith(".safetensors"):
        from ladcast_tpu.models import weight_import as wi

        sd = wi.load_safetensors(path)
        template = hub.build_param_template(kind, cfg)
        convert = (wi.convert_dcae_state_dict if kind == "dcae"
                   else wi.convert_dit_state_dict)
        return convert(sd, template), cfg
    if hub.is_hub_dir(path):
        loaded = hub.load_pretrained(path, subfolder, expect_kind=kind)
        return loaded.params, loaded.config
    return load_params(path), cfg


if __name__ == "__main__":
    main()
