"""WB2-climatology converter golden tests (no xarray needed: the
converter is duck-typed over ``ds[name].dims/.values``, matching the
xarray surface the reference uses in evaluate/utils.py:152-201)."""

import numpy as np
import pytest

from ladcast_tpu import channels as ch
from ladcast_tpu.cli.convert_wb2_climatology import (
    DEFAULT_HOURS,
    wb2_climatology_to_arrays,
)

N_DOY, N_LAT, N_LON = 366, 7, 8
LAT_DESC = np.linspace(90.0, -90.0, N_LAT)       # WB2 order: north->south
HOURS_ON_DISK = np.asarray([0, 3, 6, 9, 12, 15, 18, 21])


class FakeArray:
    def __init__(self, dims, values):
        self.dims = tuple(dims)
        self.values = values


class FakeDataset:
    """Minimal xarray.Dataset lookalike with per-variable dim orders."""

    def __init__(self, n_doy=N_DOY):
        rng = np.random.RandomState(0)
        self._v = {
            "dayofyear": FakeArray(("dayofyear",),
                                   np.arange(1, n_doy + 1)),
            "hour": FakeArray(("hour",), HOURS_ON_DISK),
            "latitude": FakeArray(("latitude",), LAT_DESC),
            "longitude": FakeArray(("longitude",),
                                   np.linspace(0, 315, N_LON)),
            "level": FakeArray(("level",),
                               np.asarray(ch.PRESSURE_LEVELS)),
        }
        n_lev = len(ch.PRESSURE_LEVELS)
        for var in ch.ATM_VARIABLES:
            # deliberately scrambled on-disk dim order
            self._v[var] = FakeArray(
                ("hour", "level", "dayofyear", "latitude", "longitude"),
                rng.randn(len(HOURS_ON_DISK), n_lev, n_doy,
                          N_LAT, N_LON).astype(np.float32))
        for var in ch.SURFACE_VARIABLES:
            self._v[var] = FakeArray(
                ("dayofyear", "latitude", "hour", "longitude"),
                rng.randn(n_doy, N_LAT, len(HOURS_ON_DISK),
                          N_LON).astype(np.float32))

    def __getitem__(self, k):
        return self._v[k]


def _expected(ds, var, level=None):
    """Manual (doy, 4, lat_cropped, lon) view of one fake variable."""
    a = ds[var]
    if level is not None:
        # on-disk (hour, level, doy, lat, lon)
        li = ch.PRESSURE_LEVELS.index(level)
        v = a.values[:, li].transpose(1, 0, 2, 3)   # (doy, hour, lat, lon)
    else:
        # on-disk (doy, lat, hour, lon)
        v = a.values.transpose(0, 2, 1, 3)
    hsel = [list(HOURS_ON_DISK).index(h) for h in DEFAULT_HOURS]
    v = v[:, hsel]
    v = v[:, :, ::-1]     # south->north
    return v[:, :, 1:]    # crop the -90 pole row


def test_golden_channel_extraction():
    ds = FakeDataset()
    clim, hours = wb2_climatology_to_arrays(ds)
    assert clim.shape == (N_DOY, 4, N_LAT - 1, N_LON,
                          ch.NUM_DYNAMIC_CHANNELS)
    assert hours.tolist() == list(DEFAULT_HOURS)
    for var, level in (("temperature", 500), ("geopotential", 50),
                       ("vertical_velocity", 1000)):
        ci = ch.channel_index(var, level)
        np.testing.assert_allclose(clim[..., ci], _expected(ds, var, level),
                                   rtol=0, atol=0)
    for var in ("2m_temperature", "sea_surface_temperature"):
        ci = ch.channel_index(var)
        np.testing.assert_allclose(clim[..., ci], _expected(ds, var),
                                   rtol=0, atol=0)


def test_scorer_indexing_contract():
    """The scorer looks up clim[dayofyear-1, hour//6]
    (cli/evaluate_ens.py:130-132); converted output must satisfy it for
    every synoptic timestamp including Dec 31 of a leap year."""
    clim, _ = wb2_climatology_to_arrays(FakeDataset())
    from ladcast_tpu.data import time_utils
    for ts in (2020010100, 2020022906, 2020123118):
        dt = time_utils.int_to_datetime(ts)
        row = clim[dt.timetuple().tm_yday - 1, dt.hour // 6]
        assert row.shape == (N_LAT - 1, N_LON, ch.NUM_DYNAMIC_CHANNELS)
        assert np.isfinite(row).all()


def test_365_day_product_padded_to_366():
    """The Feb 29 bin is inserted AT index 59 (copy of Feb 28): the
    scorer indexes clim[tm_yday-1], and in leap years Mar 1..Dec 31 have
    tm_yday one higher than in the 365-day layout -- appending at the
    end would misalign Mar..Dec by one day in leap years."""
    ds = FakeDataset(n_doy=365)
    clim365, _ = wb2_climatology_to_arrays(ds)
    assert clim365.shape[0] == 366
    # the original 365 rows, packed in channel order (first atm var,
    # first level = channel 0)
    packed0 = _expected(ds, ch.ATM_VARIABLES[0], ch.PRESSURE_LEVELS[0])
    got0 = clim365[..., 0]
    np.testing.assert_array_equal(got0[:59], packed0[:59])   # Jan..Feb 28
    np.testing.assert_array_equal(got0[59], packed0[58])     # Feb 29 bin
    np.testing.assert_array_equal(got0[60:], packed0[59:])   # Mar..Dec +1


def test_missing_hours_rejected():
    ds = FakeDataset()
    with pytest.raises(ValueError, match="hours"):
        wb2_climatology_to_arrays(ds, hours=(0, 6, 12, 17))


def test_partial_doy_rejected_by_default_accepted_with_flag():
    """--allow_partial_doy (round 4, acceptance-script smoke support):
    a partial-year product is an error unless explicitly allowed, and
    the allowed path packs rows 1:N with NO Feb-29 insertion."""
    ds = FakeDataset(n_doy=2)
    with pytest.raises(ValueError, match="allow_partial_doy"):
        wb2_climatology_to_arrays(ds)
    clim, hours = wb2_climatology_to_arrays(ds, allow_partial_doy=True)
    assert clim.shape == (2, 4, N_LAT - 1, N_LON, ch.NUM_DYNAMIC_CHANNELS)
    assert hours.tolist() == list(DEFAULT_HOURS)
    packed0 = _expected(ds, ch.ATM_VARIABLES[0], ch.PRESSURE_LEVELS[0])
    np.testing.assert_array_equal(clim[..., 0], packed0)
    # full-year products are unaffected by the flag
    full, _ = wb2_climatology_to_arrays(FakeDataset(), allow_partial_doy=True)
    assert full.shape[0] == 366


def test_partial_doy_must_be_contiguous_from_day_one():
    """A June-only subset (doy 152..181) would pack at row 0 while the
    scorer indexes clim[tm_yday-1] -- must be rejected at conversion."""
    ds = FakeDataset(n_doy=2)
    ds._v["dayofyear"] = FakeArray(("dayofyear",), np.asarray([152, 153]))
    with pytest.raises(ValueError, match="contiguous"):
        wb2_climatology_to_arrays(ds, allow_partial_doy=True)
