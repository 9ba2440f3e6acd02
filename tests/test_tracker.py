"""Cyclone tracker tests on a synthetic moving low-pressure system."""

from datetime import datetime, timedelta

import numpy as np

from ladcast_tpu.evaluate.tracker import (
    GriddedField,
    find_local_minimum,
    round_to_grid,
    track_error_km,
    track_first_n_steps,
)

LAT = np.linspace(-88.5, 90, 120)
LON = np.arange(0, 360, 1.5)


def _low_at(lat_c, lon_c, depth=-40.0):
    la, lo = np.meshgrid(LAT, LON, indexing="ij")
    dlon = (lo - lon_c + 180) % 360 - 180
    r2 = (la - lat_c) ** 2 + dlon**2
    return GriddedField(101300.0 + depth * 100 * np.exp(-r2 / 18.0), LAT, LON)


def test_round_to_grid():
    assert round_to_grid(13.4) == 13.5
    assert round_to_grid(-88.4) == -88.5


def test_find_local_minimum_centers_on_low():
    f = _low_at(21.0, 140.25)
    res = find_local_minimum(f, (19.5, 138.0), inner_deg=7)
    assert res is not None
    la, lo, v = res
    assert abs(la - 21.0) <= 1.5 and abs(lo - 140.25) <= 1.5


def test_track_follows_moving_low():
    t0 = datetime(2018, 9, 1, 0)

    def mslp_at(t):
        h = (t - t0).total_seconds() / 3600
        # storm moves NW ~0.75deg/6h
        return _low_at(15.0 + 0.75 * h / 6, 150.0 - 0.75 * h / 6)

    track = track_first_n_steps(t0, 15.2, 149.9, mslp_at, n_steps=4)
    assert len(track) == 5
    truth = [(t0 + timedelta(hours=6 * i),
              15.0 + 0.75 * i, 150.0 - 0.75 * i) for i in range(5)]
    err = track_error_km(track, truth)
    assert (err < 250).all(), err  # within ~1.5 grid cells


def test_wraparound_longitude():
    f = _low_at(0.0, 359.25)
    res = find_local_minimum(f, (0.0, 1.5), inner_deg=7)
    assert res is not None
    assert abs((res[1] - 359.25 + 180) % 360 - 180) <= 1.5


def test_track_plotting_smoke(tmp_path):
    """plot_tracks / plot_track_errors render PNGs from tracker-format
    fixes (reference track.py:389-583 parity, cartopy-optional)."""
    from datetime import datetime, timedelta

    from ladcast_tpu.utils import visualization as viz

    t0 = datetime(2018, 9, 1, 0)
    def mk(lat0, lon0, dlat, dlon, n=8):
        return [(t0 + timedelta(hours=6 * i), lat0 + dlat * i,
                 lon0 + dlon * i) for i in range(n)]

    obs = mk(15.0, 210.0, 0.5, -1.0)
    ens = {f"member_{m}": mk(15.0 + 0.1 * m, 210.0, 0.45, -1.05)
           for m in range(4)}
    mean = viz.ensemble_mean_track(ens)
    assert len(mean) == 8 and abs(mean[0][1] - 15.15) < 1e-6

    p1 = tmp_path / "tracks.png"
    viz.plot_tracks(obs_track=obs, ens_tracks=ens, ens_mean_track=mean,
                    era5_track=obs, model_tracks={"IFS": obs[:5]},
                    out_path=str(p1))
    assert p1.exists() and p1.stat().st_size > 1000

    import numpy as _np
    errs = {k: _np.linspace(0, 100 + 10 * i, 8)
            for i, k in enumerate(ens)}
    p2 = tmp_path / "errors.png"
    viz.plot_track_errors(errs, out_path=str(p2))
    assert p2.exists() and p2.stat().st_size > 1000
