"""Build a day-of-year/hour-binned climatology for ACC scoring.

The reference evaluation protocol scores ACC against the WeatherBench2
climatology (evaluate/evaluate_ens_gpu.py:312-330, SURVEY.md section 3.5);
this CLI computes the same (366, n_hours, lat, lon, C) binned-mean
product from any local field source (zarr / .npz / tar-archive dir), so
the scorer never needs the WB2 download. Output: ``clim.npz`` with keys
``clim`` and ``hours`` -- the format ``cli.evaluate_ens --climatology``
consumes.

Streaming: frames are accumulated in fp64 batch-by-batch; memory stays
O(climatology), not O(archive).
"""

from __future__ import annotations

import argparse

import numpy as np

from ladcast_tpu.data import time_utils


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="ERA5 field source: zarr store, .npz bundle, or "
                         "monthly-tar directory")
    ap.add_argument("--output", required=True, help="output .npz path")
    ap.add_argument("--start_year", type=int, default=None)
    ap.add_argument("--end_year", type=int, default=None)
    ap.add_argument("--hours", default="0,6,12,18",
                    help="comma-separated UTC hours to bin")
    ap.add_argument("--batch", type=int, default=64,
                    help="frames read per source call")
    args = ap.parse_args(argv)

    from ladcast_tpu.cli.pred_rollout import open_field_source

    src, ts_all = open_field_source(args.data)
    hours = [int(h) for h in args.hours.split(",")]
    keep = []
    for t in np.asarray(ts_all, np.int64):
        dt = time_utils.int_to_datetime(int(t))
        if args.start_year is not None and dt.year < args.start_year:
            continue
        if args.end_year is not None and dt.year > args.end_year:
            continue
        if dt.hour in hours:
            keep.append(int(t))
    if not keep:
        raise SystemExit("no timestamps in the requested range/hours")

    acc = None
    cnt = np.zeros((366, len(hours)), np.int64)
    for s in range(0, len(keep), args.batch):
        chunk = keep[s:s + args.batch]
        frames = np.asarray(src.frames_at(chunk), np.float64)
        if acc is None:
            acc = np.zeros((366, len(hours)) + frames.shape[1:], np.float64)
        for x, t in zip(frames, chunk):
            dt = time_utils.int_to_datetime(t)
            doy = dt.timetuple().tm_yday
            h = hours.index(dt.hour)
            acc[doy - 1, h] += x
            cnt[doy - 1, h] += 1
        print(f"accumulated {min(s + args.batch, len(keep))}/{len(keep)}",
              flush=True)

    clim = (acc / np.maximum(cnt, 1).reshape(
        366, len(hours), *([1] * (acc.ndim - 2)))).astype(np.float32)
    np.savez(args.output, clim=clim, hours=np.asarray(hours, np.int64))
    print(f"wrote {args.output}: clim {clim.shape}, "
          f"{int(cnt.sum())} frames binned")


if __name__ == "__main__":
    main()
