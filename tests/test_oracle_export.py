"""Export-packing parity against the ACTUAL reference ``latent_ens_to_xarr``
(/root/reference/ladcast/pipelines/utils.py:83-246), executed under the
functional fake-xarray Dataset/DataArray stand-ins (tests/oracles/
fake_xarray.py).

Pins the per-variable channel unpacking convention of
``evaluate.export.pack_variables`` — atm variable ``v`` occupies channels
``[v_idx*num_levels, (v_idx+1)*num_levels)`` with the (lev, T) block
permuted to (T, lev); surface variable ``s`` is channel
``num_atm*num_levels + s_idx`` — plus the coordinate grids and the
extract_variables / extract_ens_member_idx / extract_first subset paths.
"""

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ladcast_tpu.evaluate.export import pack_variables  # noqa: E402
from ladcast_tpu.models.dcae import AutoencoderDC  # noqa: E402
from ladcast_tpu.models.weight_import import convert_dcae_state_dict  # noqa: E402
from tests.oracles.refload import load_reference, state_dict_numpy  # noqa: E402
from tests.test_oracle_dcae import DYN, H, STATIC, W, _tiny_pair  # noqa: E402

ATM = ["temperature"]                     # 1 atm var x 2 levels
SUR = ["10m_u", "10m_v", "2m_temperature", "mean_sea_level_pressure"]
LEVELS = [500, 850]                       # 1*2 + 4 == DYN == 6 channels
GRID_KW = dict(lat_start_deg=0.0, lat_end_deg=22.5,     # 16 rows  == H
               lon_start_deg=0.0, lon_end_deg=34.5,     # 24 cols  == W
               interval_deg=1.5)


def _decode_ours(ref, model, z, fm, fs):
    """(E, C, T, h, w) physical latents -> (E, T, H, W, DYN) physical."""
    E, C, T, h, w = z.shape
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, DYN)),
                           jnp.zeros((1, H, W, STATIC))))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = jax.tree.map(jnp.asarray,
                          convert_dcae_state_dict(state_dict_numpy(ref),
                                                  template))
    z_hwc = jnp.asarray(np.moveaxis(z, 1, -1).reshape(E * T, h, w, C))
    dec = model.apply(params, z_hwc, method=AutoencoderDC.decode)
    return np.asarray(dec).reshape(E, T, H, W, DYN) * fs + fm


def test_latent_ens_to_xarr_packing_parity():
    ref, model, cfg = _tiny_pair(seed=5)
    putils = load_reference("ladcast.pipelines.utils")

    rng = np.random.RandomState(5)
    E, T, h, w = 3, 3, H // 4, W // 4
    z = rng.randn(E, 4, T, h, w).astype(np.float32)
    fm = rng.randn(DYN).astype(np.float32)
    fs = (rng.rand(DYN) + 0.5).astype(np.float32)

    with torch.no_grad():
        ds = putils.latent_ens_to_xarr(
            torch.from_numpy(z), ref,
            mean_tensor=torch.from_numpy(fm),
            std_tensor=torch.from_numpy(fs),
            variable_names=ATM + SUR, timestamp="2018010100",
            levels=LEVELS, num_atm_vars=len(ATM), num_sur_vars=len(SUR),
            latent_spatial_scale=4, **GRID_KW)

    # Coordinate grids (the georeferencing contract of export.grid_coords,
    # at toy grid extents).
    np.testing.assert_allclose(ds.coords["latitude"],
                               np.arange(0.0, 22.5 + 1e-6, 1.5))
    np.testing.assert_allclose(ds.coords["longitude"],
                               np.arange(0.0, 34.5 + 1e-6, 1.5))
    assert list(ds.coords["prediction_timedelta"]) == [
        pd.Timedelta(hours=6 * i) for i in range(T)]
    assert list(ds.coords["time"]) == [
        pd.to_datetime("2018010100", format="%Y%m%d%H")]

    decoded = _decode_ours(ref, model, z, fm, fs)
    packed = pack_variables(decoded, ATM, SUR, num_levels=len(LEVELS))

    for var in ATM:
        assert ds[var].dims == ("idx", "time", "prediction_timedelta",
                                "level", "latitude", "longitude")
        np.testing.assert_allclose(ds[var].values, packed[var][:, None],
                                   atol=2e-4, rtol=2e-4)
    for var in SUR:
        assert ds[var].dims == ("idx", "time", "prediction_timedelta",
                                "latitude", "longitude")
        np.testing.assert_allclose(ds[var].values, packed[var][:, None],
                                   atol=2e-4, rtol=2e-4)


def test_latent_ens_to_xarr_subset_paths():
    """extract_variables / extract_ens_member_idx / extract_first semantics
    (pipelines/utils.py:148-155,208-229) against pack_variables + slicing."""
    ref, model, cfg = _tiny_pair(seed=6)
    putils = load_reference("ladcast.pipelines.utils")

    rng = np.random.RandomState(6)
    E, T, h, w = 3, 3, H // 4, W // 4
    z = rng.randn(E, 4, T, h, w).astype(np.float32)
    fm = rng.randn(DYN).astype(np.float32)
    fs = (rng.rand(DYN) + 0.5).astype(np.float32)
    sub_vars = ["temperature", "2m_temperature"]

    with torch.no_grad():
        ds = putils.latent_ens_to_xarr(
            torch.from_numpy(z), ref,
            mean_tensor=torch.from_numpy(fm),
            std_tensor=torch.from_numpy(fs),
            variable_names=ATM + SUR, timestamp="2018060112",
            levels=LEVELS, num_atm_vars=len(ATM), num_sur_vars=len(SUR),
            extract_variables=sub_vars, extract_ens_member_idx=[2, 0],
            extract_first=2, latent_spatial_scale=4, **GRID_KW)

    assert set(ds.data_vars) == set(sub_vars)
    assert list(ds.coords["idx"]) == [2, 0]
    assert len(list(ds.coords["prediction_timedelta"])) == 2

    decoded = _decode_ours(ref, model, z, fm, fs)
    packed = pack_variables(decoded[[2, 0], :2], ATM, SUR,
                            num_levels=len(LEVELS),
                            extract_variables=sub_vars)
    np.testing.assert_allclose(ds["temperature"].values,
                               packed["temperature"][:, None],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ds["2m_temperature"].values,
                               packed["2m_temperature"][:, None],
                               atol=2e-4, rtol=2e-4)
