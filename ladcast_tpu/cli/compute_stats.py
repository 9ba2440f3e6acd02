"""Compute per-variable (per-level for atmospheric) mean/std over a year
range -> JSON.

Equivalent of the reference preprocecss/compute_mean_std_era5.py:44-154.
Works on an ERA5 zarr (xarray) or an .npz bundle; the streaming mean/std
uses a numerically stable one-pass accumulation (sum / sum-of-squares in
float64) instead of dask.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ladcast_tpu import channels as ch


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--start_year", type=int, default=1979)
    ap.add_argument("--end_year", type=int, default=2017)
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args(argv)

    from ladcast_tpu.cli.pred_rollout import NpzFieldSource, ZarrFieldSource

    src = (NpzFieldSource(args.data) if args.data.endswith(".npz")
           else ZarrFieldSource(args.data))
    if hasattr(src, "fields"):
        ts_all = [t for t in src.timestamps
                  if args.start_year <= t // 1_000_000 <= args.end_year]
    else:
        import pandas as pd
        ts_all = [int(t.strftime("%Y%m%d%H"))
                  for t in pd.to_datetime(src.ds.time.values)
                  if args.start_year <= t.year <= args.end_year]

    n = np.zeros(ch.NUM_DYNAMIC_CHANNELS, np.float64)
    s1 = np.zeros(ch.NUM_DYNAMIC_CHANNELS, np.float64)
    s2 = np.zeros(ch.NUM_DYNAMIC_CHANNELS, np.float64)
    for i in range(0, len(ts_all), args.batch_size):
        raw = src.frames_at(ts_all[i:i + args.batch_size]).astype(np.float64)
        flat = raw.reshape(-1, raw.shape[-1])
        valid = ~np.isnan(flat)
        n += valid.sum(0)
        s1 += np.nansum(flat, 0)
        s2 += np.nansum(flat**2, 0)
        print(f"accumulated {min(i + args.batch_size, len(ts_all))}"
              f"/{len(ts_all)}", flush=True)
    mean = s1 / n
    std = np.sqrt(np.maximum(s2 / n - mean**2, 0.0))

    out = {}
    k = 0
    for var in ch.ATM_VARIABLES:
        out[var] = {
            "mean": {str(p): mean[k + j] for j, p in
                     enumerate(ch.PRESSURE_LEVELS)},
            "std": {str(p): std[k + j] for j, p in
                    enumerate(ch.PRESSURE_LEVELS)}}
        k += ch.NUM_LEVELS
    for var in ch.SURFACE_VARIABLES:
        out[var] = {"mean": mean[k], "std": std[k]}
        k += 1
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
