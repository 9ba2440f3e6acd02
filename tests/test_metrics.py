"""Metric formula tests vs brute-force numpy implementations of the WB2
definitions (the reference's evaluate/utils.py replicates the same)."""

import numpy as np

from ladcast_tpu.metrics import scores
from ladcast_tpu.metrics.losses import lp_loss, lp_loss_per_var
from ladcast_tpu.metrics.weights import (
    cell_area_weights,
    cos_lat_weights,
    latent_lat_weights,
)


def test_lat_weights():
    lat = np.linspace(-88.5, 90, 120)
    w = cos_lat_weights(lat)
    assert abs(w.mean() - 1.0) < 1e-12
    assert w[np.argmin(np.abs(lat))] == w.max()  # equator heaviest

    a = cell_area_weights(lat)
    assert abs(a.mean() - 1.0) < 1e-12
    # cell-area ~ cos-lat in the interior
    np.testing.assert_allclose(a[30:90], w[30:90], rtol=5e-4)

    lw = latent_lat_weights()
    assert lw.shape == (15,) and abs(lw.mean() - 1.0) < 1e-12


def _crps_bruteforce(forecast, truth):
    """CRPS via the fair kernel score: E|X-y| - 0.5*E'|X-X'| with the
    unbiased M(M-1) spread estimator."""
    M = forecast.shape[0]
    skill = np.abs(forecast - truth).mean(axis=0)
    spread = np.zeros_like(truth)
    for i in range(M):
        for j in range(M):
            if i != j:
                spread += np.abs(forecast[i] - forecast[j])
    spread /= M * (M - 1)
    return skill - 0.5 * spread


def test_crps_matches_bruteforce():
    rng = np.random.RandomState(0)
    fc = rng.randn(7, 4, 5).astype(np.float32)
    tr = rng.randn(4, 5).astype(np.float32)
    got = np.asarray(scores.crps(fc, tr, ensemble_axis=0))
    want = _crps_bruteforce(fc, tr)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_crps_single_member_is_mae():
    rng = np.random.RandomState(1)
    fc = rng.randn(1, 6).astype(np.float32)
    tr = rng.randn(6).astype(np.float32)
    got = np.asarray(scores.crps(fc, tr))
    np.testing.assert_allclose(got, np.abs(fc[0] - tr), rtol=1e-6)


def test_acc_perfect_forecast_is_one():
    rng = np.random.RandomState(2)
    truth = rng.randn(3, 8, 10).astype(np.float32)
    climate = rng.randn(8, 10).astype(np.float32)
    w = cos_lat_weights(np.linspace(-80, 80, 8)).reshape(8, 1)
    got = np.asarray(scores.acc(truth, truth, climate, w))
    np.testing.assert_allclose(got, 1.0, rtol=1e-5)


def test_acc_sign_flip():
    rng = np.random.RandomState(3)
    anom = rng.randn(8, 10).astype(np.float32)
    climate = rng.randn(8, 10).astype(np.float32)
    got = np.asarray(scores.acc(climate - anom, climate + anom, climate))
    np.testing.assert_allclose(got, -1.0, rtol=1e-5)


def test_lat_weighted_rmse_nan_safe():
    pred = np.ones((2, 4, 3), np.float32)
    truth = np.zeros((2, 4, 3), np.float32)
    truth[:, 0, 0] = np.nan
    w = np.ones((4, 1), np.float32)
    out = np.asarray(scores.lat_weighted_rmse(pred, truth, w, nan_safe=True))
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)


def test_lp_loss_relative_scale_invariance():
    rng = np.random.RandomState(4)
    y = rng.randn(2, 6, 8, 3).astype(np.float32)
    yp = y + 0.1 * rng.randn(*y.shape).astype(np.float32)
    a = float(lp_loss(yp, y))
    b = float(lp_loss(10 * yp, 10 * y))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    # identical inputs -> zero
    assert float(lp_loss(y, y)) == 0.0


def test_lp_loss_matches_manual():
    rng = np.random.RandomState(5)
    y = rng.randn(2, 4, 5, 3).astype(np.float32)
    yp = rng.randn(2, 4, 5, 3).astype(np.float32)
    w = rng.rand(1, 4, 1, 1).astype(np.float32)
    got = float(lp_loss(yp, y, w))
    # manual: per (b, c) ||w*(yp-y)||_2 / ||w*y||_2, then mean
    acc = []
    for b in range(2):
        for c in range(3):
            d = (w[0, :, :, 0] * (yp[b, :, :, c] - y[b, :, :, c])).ravel()
            n = (w[0, :, :, 0] * y[b, :, :, c]).ravel()
            acc.append(np.linalg.norm(d) / np.linalg.norm(n))
    np.testing.assert_allclose(got, np.mean(acc), rtol=1e-5)


def test_lp_loss_per_var_shape():
    rng = np.random.RandomState(6)
    C = 6 * 13 + 6
    y = rng.randn(2, 4, 5, C).astype(np.float32)
    yp = rng.randn(2, 4, 5, C).astype(np.float32)
    pv = np.asarray(lp_loss_per_var(yp, y))
    assert pv.shape == (12,)
    assert np.isfinite(pv).all()


def test_compute_climatology_cli(tmp_path):
    """cli.compute_climatology bins day-of-year/hour means in the layout
    evaluate_ens consumes (reference: WB2 climatology product)."""
    import os

    from ladcast_tpu.cli import compute_climatology as cc
    from ladcast_tpu.data import time_utils

    rng = np.random.RandomState(0)
    ts, fields = [], []
    # two years of the same two calendar days at 0z/6z, distinct values
    for year in (2000, 2001):
        for (m, d) in ((1, 5), (3, 1)):
            for h in (0, 6):
                ts.append(int(f"{year}{m:02d}{d:02d}{h:02d}"))
                fields.append(np.full((4, 8, 3),
                                      float(year % 100 + h), np.float32))
    src = os.fspath(tmp_path / "src.npz")
    np.savez(src, fields=np.stack(fields),
             timestamps=np.asarray(ts, np.int64))
    out = os.fspath(tmp_path / "clim.npz")
    cc.main(["--data", src, "--output", out, "--batch", "3"])

    d = np.load(out)
    clim = d["clim"]
    assert clim.shape == (366, 4, 4, 8, 3)
    doy = time_utils.int_to_datetime(2000010500).timetuple().tm_yday
    # mean over the two years at 0z: (0+0)/2 + mean(year%100)=0.5
    np.testing.assert_allclose(clim[doy - 1, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(clim[doy - 1, 1], 6.5, atol=1e-6)
    # untouched bins stay zero
    assert clim[100, 0].max() == 0.0


# ---------------------------------------------------------------------------
# Executable-reference oracles: the ACTUAL evaluate/utils.py score functions
# (loaded from /root/reference via tests.oracles.refload) on shared inputs.
# ---------------------------------------------------------------------------

def test_crps_matches_reference_get_crps():
    import pytest
    torch = pytest.importorskip("torch")
    from tests.oracles.refload import load_reference
    eutils = load_reference("ladcast.evaluate.utils")

    rng = np.random.RandomState(7)
    fc = rng.randn(9, 4, 6, 8).astype(np.float32)   # (ens, C, H, W)
    tr = rng.randn(1, 4, 6, 8).astype(np.float32)
    want = eutils.get_crps(torch.from_numpy(fc), torch.from_numpy(tr),
                           ensemble_dim=0).numpy()
    import jax.numpy as jnp
    got = np.asarray(scores.crps(jnp.asarray(fc), jnp.asarray(tr),
                                 ensemble_axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_acc_matches_reference_get_acc():
    import pytest
    torch = pytest.importorskip("torch")
    from tests.oracles.refload import load_reference
    eutils = load_reference("ladcast.evaluate.utils")

    rng = np.random.RandomState(8)
    fc = rng.randn(3, 4, 6, 8).astype(np.float32)
    tr = rng.randn(3, 4, 6, 8).astype(np.float32)
    clim = rng.randn(4, 6, 8).astype(np.float32)
    lw = cos_lat_weights(np.linspace(-88.5, 90, 6)).astype(np.float32)
    lw_t = torch.from_numpy(lw).view(1, 1, -1, 1)
    # NaN case: the reference scores SST ocean-only via nanmean; inject
    # NaNs at matching points and use the nan_safe path
    fc[:, 1, 2, 3] = np.nan
    tr[:, 1, 2, 3] = np.nan

    import jax.numpy as jnp
    want = eutils.get_acc(torch.from_numpy(fc), torch.from_numpy(tr),
                          torch.from_numpy(clim), lat_weight=lw_t).numpy()
    got = np.asarray(scores.acc(jnp.asarray(fc), jnp.asarray(tr),
                                jnp.asarray(clim),
                                lat_weight=jnp.asarray(lw).reshape(1, 1, -1, 1),
                                nan_safe=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    want_nw = eutils.get_acc(torch.from_numpy(fc), torch.from_numpy(tr),
                             torch.from_numpy(clim)).numpy()
    got_nw = np.asarray(scores.acc(jnp.asarray(fc), jnp.asarray(tr),
                                   jnp.asarray(clim), nan_safe=True))
    np.testing.assert_allclose(got_nw, want_nw, rtol=1e-5, atol=1e-6)
