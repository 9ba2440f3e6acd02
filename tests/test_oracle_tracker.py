"""Cyclone-tracker parity: run the ACTUAL reference tracking functions
(/root/reference/ladcast/evaluate/track.py round_to_grid /
find_local_minimum / track_first_n_steps) on synthetic storms via the
fake-xarray shim, and assert `ladcast_tpu.evaluate.tracker` produces the
identical fixes. Upgrades the tracker from synthetic self-tests to
executable-reference ground truth (same pattern as the model/sampler
oracles)."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from ladcast_tpu.evaluate import tracker as mine
from tests.oracles.fake_xarray import FakeDataset, LabeledArray
from tests.oracles.refload import load_reference

LAT = np.round(np.linspace(-88.5, 90, 120), 6)   # reference 1.5 deg grid
LON = np.arange(0, 360, 1.5)


def _low(lat_c, lon_c, depth=-40.0, ridge=None):
    la, lo = np.meshgrid(LAT, LON, indexing="ij")
    dlon = (lo - lon_c + 180) % 360 - 180
    r2 = (la - lat_c) ** 2 + dlon ** 2
    f = 101300.0 + depth * 100 * np.exp(-r2 / 18.0)
    if ridge is not None:  # secondary low to create competing minima
        la2, lo2, d2 = ridge
        dlon2 = (lo - lo2 + 180) % 360 - 180
        f = f + d2 * 100 * np.exp(-((la - la2) ** 2 + dlon2 ** 2) / 10.0)
    return f


def _mslp_series(t0, n_steps, pos_fn, **low_kw):
    """(time, lat, lon) LabeledArray of a moving low."""
    times = [t0 + timedelta(hours=6 * i) for i in range(n_steps + 1)]
    vals = np.stack([_low(*pos_fn(i), **low_kw) for i in range(n_steps + 1)])
    return times, LabeledArray(
        vals, ("time", "latitude", "longitude"),
        {"time": np.asarray(times, object), "latitude": LAT,
         "longitude": LON})


REF = load_reference("ladcast.evaluate.track")


def test_round_to_grid_matches_reference():
    for v in (13.4, -88.4, 0.76, 359.3, -0.74):
        assert mine.round_to_grid(v) == REF.round_to_grid(v)


@pytest.mark.parametrize("center,start,inner", [
    ((21.0, 140.25), (19.5, 138.0), 7),
    ((0.0, 359.25), (0.0, 1.5), 7),      # wraparound longitude
    ((15.0, 150.0), (15.0, 150.0), 4),
    ((-30.0, 10.5), (-28.5, 12.0), 1),
])
def test_find_local_minimum_matches_reference(center, start, inner):
    t0 = datetime(2018, 9, 1, 0)
    times, da = _mslp_series(t0, 0, lambda i: center)
    ds = FakeDataset({"mean_sea_level_pressure": da})
    ref = REF.find_local_minimum(
        ds, "mean_sea_level_pressure", t0,
        (REF.round_to_grid(start[0]), REF.round_to_grid(start[1])), inner)
    field = mine.GriddedField(da.sel(time=t0).values, LAT, LON)
    got = mine.find_local_minimum(
        field, (mine.round_to_grid(start[0]), mine.round_to_grid(start[1])),
        inner)
    if ref is None:
        assert got is None
        return
    assert got is not None
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)


def test_track_matches_reference_moving_low():
    t0 = datetime(2018, 9, 1, 0)
    n = 5
    pos = lambda i: (15.0 + 0.75 * i, 150.0 - 0.75 * i)   # NW drift
    times, da = _mslp_series(t0, n, pos)
    ds = FakeDataset({"mean_sea_level_pressure": da})

    ref_track = REF.track_first_n_steps(
        t0, 15.2, 149.9, ds=ds, n_steps=n, enforce_msl=True)

    fields = {t: mine.GriddedField(da.sel(time=t).values, LAT, LON)
              for t in times}
    my_track = mine.track_first_n_steps(
        t0, 15.2, 149.9, lambda t: fields[t], n_steps=n, enforce_msl=True)

    assert len(ref_track) == len(my_track) == n + 1
    for (rt, rla, rlo), (mt, mla, mlo) in zip(ref_track, my_track):
        assert rt == mt
        assert (rla, rlo) == (mla, mlo), (rt, (rla, rlo), (mla, mlo))


def test_track_matches_reference_with_competing_minimum():
    """Two lows in the same outer box: the closest-to-center rule and the
    shrinking inner_box_sizes loop must pick identical fixes."""
    t0 = datetime(2018, 9, 1, 0)
    n = 4
    pos = lambda i: (20.0 + 0.5 * i, 200.0 + 0.75 * i)
    ridge = (24.0, 195.0, -20.0)   # stationary secondary low
    times, da = _mslp_series(t0, n, pos, ridge=ridge)
    ds = FakeDataset({"mean_sea_level_pressure": da})

    ref_track = REF.track_first_n_steps(
        t0, 20.2, 199.8, ds=ds, n_steps=n, enforce_msl=True)
    fields = {t: mine.GriddedField(da.sel(time=t).values, LAT, LON)
              for t in times}
    my_track = mine.track_first_n_steps(
        t0, 20.2, 199.8, lambda t: fields[t], n_steps=n, enforce_msl=True)
    assert ref_track == my_track


def test_track_land_fallback_matches_reference():
    """enforce_msl=False: over land (mask >= 0.5) the tracker skips MSLP
    and falls back to the 700 hPa geopotential minimum."""
    t0 = datetime(2018, 9, 1, 0)
    n = 3
    pos = lambda i: (25.0 + 0.75 * i, 250.0)
    times, mslp = _mslp_series(t0, n, pos)
    # geopotential low slightly offset from the mslp low
    gpos = lambda i: (25.0 + 0.75 * i, 251.5)
    gvals = np.stack([_low(*gpos(i), depth=-30.0) for i in range(n + 1)])
    geo = LabeledArray(
        gvals[:, None], ("time", "level", "latitude", "longitude"),
        {"time": np.asarray(times, object),
         "level": np.asarray([700]), "latitude": LAT, "longitude": LON})
    land = LabeledArray(np.ones((len(LAT), len(LON))),  # all land
                        ("latitude", "longitude"),
                        {"latitude": LAT, "longitude": LON})
    ds = FakeDataset({"mean_sea_level_pressure": mslp,
                      "geopotential": geo, "land_sea_mask": land})

    ref_track = REF.track_first_n_steps(
        t0, 25.0, 250.0, ds=ds, n_steps=n, enforce_msl=False)

    mfields = {t: mine.GriddedField(mslp.sel(time=t).values, LAT, LON)
               for t in times}
    gfields = {t: mine.GriddedField(
        geo.sel(time=t, level=700).values, LAT, LON) for t in times}
    land_f = mine.GriddedField(land.values, LAT, LON)
    my_track = mine.track_first_n_steps(
        t0, 25.0, 250.0, lambda t: mfields[t], n_steps=n,
        enforce_msl=False, land_mask=land_f,
        geopotential700_at=lambda t: gfields[t])
    assert ref_track == my_track
