"""Cyclone tracking CLI.

Equivalent of the reference evaluate/track.py __main__ flow: track a storm
through decoded ensemble forecasts (per member), optionally track the ERA5
analysis, compare against IBTrACS/HURDAT observations, and write a CSV
(track.py:891-912).

Forecast input: the decoded-fields .npz written by
``ladcast_tpu.evaluate.export.decoded_to_npz`` (or pred_rollout --decode
output), or an ERA5 zarr for analysis tracking.
"""

from __future__ import annotations

import argparse
import csv
import json

import numpy as np

from ladcast_tpu import channels as ch
from ladcast_tpu.data import time_utils
from ladcast_tpu.evaluate import tracker


def _grid():
    lat = np.arange(ch.LAT_START_DEG, ch.LAT_END_DEG + 1e-6, ch.INTERVAL_DEG)
    lon = np.arange(ch.LON_START_DEG, ch.LON_END_DEG + 1e-6, ch.INTERVAL_DEG)
    return lat, lon


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--forecast", required=True,
                    help=".npz from evaluate.export.decoded_to_npz")
    ap.add_argument("--lat0", type=float, required=True,
                    help="first-fix latitude (deg)")
    ap.add_argument("--lon0", type=float, required=True,
                    help="first-fix longitude (deg, 0..360)")
    ap.add_argument("--n_steps", type=int, default=12)
    ap.add_argument("--output_csv", required=True)
    ap.add_argument("--ibtracs", default=None,
                    help="optional IBTrACS CSV for track-error columns")
    ap.add_argument("--storm_id", default=None)
    ap.add_argument("--plot", default=None,
                    help="write a track-comparison map PNG "
                         "(reference track.py:389-583)")
    ap.add_argument("--plot_errors", default=None,
                    help="write a track-error-growth PNG (needs --ibtracs)")
    args = ap.parse_args(argv)

    d = np.load(args.forecast, allow_pickle=True)
    fields = d["fields"]  # (E, T, lat, lon, 84)
    meta = json.loads(str(d["meta"]))
    init_ts = int(meta["init_time"])
    tds = meta["prediction_timedelta_hours"]  # valid-time offsets (hours)
    step_h = tds[1] - tds[0] if len(tds) > 1 else tds[0]
    lat, lon = _grid()
    mslp_c = ch.channel_index("mean_sea_level_pressure")
    t0 = time_utils.int_to_datetime(init_ts)

    tracks = {}
    for m in range(fields.shape[0]):
        def mslp_at(t, member=m):
            # trust the bundle's own timedelta labels (frame i is valid
            # at init + tds[i] hours)
            hours = (t - t0).total_seconds() / 3600
            li = int(round((hours - tds[0]) / step_h))
            li = max(0, min(li, fields.shape[1] - 1))
            return tracker.GriddedField(fields[member, li, :, :, mslp_c],
                                        lat, lon)

        tracks[f"member_{m}"] = tracker.track_first_n_steps(
            t0, args.lat0, args.lon0, mslp_at,
            n_steps=min(args.n_steps, fields.shape[1]),
            step_hours=step_h)

    obs = None
    if args.ibtracs and args.storm_id:
        obs = tracker.load_ibtracs_csv(args.ibtracs, args.storm_id)

    with open(args.output_csv, "w", newline="") as f:
        w = csv.writer(f)
        header = ["member", "time", "lat", "lon"]
        if obs is not None:
            header.append("error_km")
        w.writerow(header)
        for name, track in tracks.items():
            errs = tracker.track_error_km(track, obs) if obs else None
            for i, (t, la, lo) in enumerate(track):
                row = [name, t.isoformat(), la, lo]
                if errs is not None and i < len(errs):
                    row.append(round(float(errs[i]), 1))
                w.writerow(row)
    print(f"wrote {args.output_csv} ({len(tracks)} member tracks)")

    if args.plot or args.plot_errors:
        from ladcast_tpu.utils import visualization as viz

        if args.plot:
            viz.plot_tracks(
                obs_track=obs, ens_tracks=tracks,
                ens_mean_track=viz.ensemble_mean_track(tracks),
                title=f"{args.storm_id or 'storm'} track comparison",
                out_path=args.plot)
            print(f"wrote {args.plot}")
        if args.plot_errors and obs is not None:
            errs = {name: tracker.track_error_km(track, obs)
                    for name, track in tracks.items()}
            viz.plot_track_errors(errs, step_hours=step_h,
                                  out_path=args.plot_errors)
            print(f"wrote {args.plot_errors}")


if __name__ == "__main__":
    main()
