"""Ensemble-calibration diagnostics (metrics/scores.py, beyond the
reference): spread / spread-skill ratio, rank histogram, zonal power
spectrum. Checked against hand computations and the statistics of
exchangeable Gaussian ensembles."""

import jax.numpy as jnp
import numpy as np

from ladcast_tpu.metrics.scores import (
    ensemble_spread,
    lat_weighted_mse,
    rank_histogram,
    zonal_power_spectrum,
)


def test_rank_histogram_hand_case():
    # 2 members [1, 3]: truth 0 -> rank 0, truth 2 -> rank 1, truth 4 -> 2
    fc = jnp.asarray([1.0, 3.0]).reshape(2, 1, 1) * jnp.ones((2, 1, 3))
    truth = jnp.asarray([[0.0, 2.0, 4.0]])
    lw = jnp.ones((1, 1))
    h = np.asarray(rank_histogram(fc, truth, lw, ensemble_axis=0))
    np.testing.assert_allclose(h, [1 / 3, 1 / 3, 1 / 3])


def test_rank_histogram_exchangeable_uniform_and_nan():
    rng = np.random.default_rng(0)
    E, H, W = 7, 40, 80
    fc = jnp.asarray(rng.normal(size=(E, H, W)))
    truth = np.asarray(rng.normal(size=(H, W)))
    truth[:5, :5] = np.nan  # NaN points must get zero weight
    lw = jnp.ones((H, 1))
    h = np.asarray(rank_histogram(fc, jnp.asarray(truth), lw,
                                  ensemble_axis=0))
    assert h.shape == (E + 1,)
    np.testing.assert_allclose(h.sum(), 1.0, rtol=1e-6)
    # exchangeable -> each of the E+1 bins ~ 1/(E+1)
    np.testing.assert_allclose(h, 1.0 / (E + 1), atol=0.02)


def test_ensemble_spread_matches_manual():
    rng = np.random.default_rng(1)
    fc = rng.normal(size=(5, 3, 4, 6)).astype(np.float32)  # (E, T, H, W)
    lw = np.ones((4, 1), np.float32)
    s = np.asarray(ensemble_spread(jnp.asarray(fc), jnp.asarray(lw),
                                   ensemble_axis=0))
    manual = np.sqrt(fc.var(axis=0, ddof=1).mean(axis=(-2, -1)))
    np.testing.assert_allclose(s, manual, rtol=1e-5)


def test_spread_skill_calibrated_ensemble():
    """truth and members iid => RMSE ~= spread * sqrt((M+1)/M)."""
    rng = np.random.default_rng(2)
    E, N = 10, 20000
    fc = jnp.asarray(rng.normal(size=(E, 1, N)))
    truth = jnp.asarray(rng.normal(size=(1, N)))
    lw = jnp.ones((1, 1))
    rmse = float(jnp.sqrt(lat_weighted_mse(fc.mean(0), truth, lw)))
    spread = float(ensemble_spread(fc, lw, ensemble_axis=0))
    np.testing.assert_allclose(rmse, spread * np.sqrt((E + 1) / E),
                               rtol=0.05)


def test_zonal_power_spectrum_single_mode_and_parseval():
    H, W, k0, A = 6, 48, 5, 3.0
    lon = np.arange(W) * 2 * np.pi / W
    x = A * np.cos(k0 * lon)[None, :] * np.ones((H, 1))
    p = np.asarray(zonal_power_spectrum(jnp.asarray(x)))
    assert p.shape == (W // 2 + 1,)
    np.testing.assert_allclose(p[k0], A**2 / 2, rtol=1e-5)
    mask = np.ones_like(p, bool)
    mask[k0] = False
    assert np.all(p[mask] < 1e-8)
    # Parseval: total power == zonal mean of x^2
    rng = np.random.default_rng(3)
    y = rng.normal(size=(H, W))
    py = np.asarray(zonal_power_spectrum(jnp.asarray(y)))
    np.testing.assert_allclose(py.sum(), (y**2).mean(), rtol=1e-5)


def test_merge_rank_shards_uneven_and_empty(tmp_path):
    """Ranks scoring different init-time counts (incl. zero) must merge
    in rank order without padding artifacts."""
    from ladcast_tpu.cli.evaluate_ens import merge_rank_shards

    d = str(tmp_path)
    a = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    b = np.zeros((0, 1, 1), np.float32)                  # rank 1 scored none
    c = 100 + np.arange(1 * 3 * 4, dtype=np.float32).reshape(1, 3, 4)
    for r, arr in enumerate((a, b, c)):
        np.save(f"{d}/crps.rank{r}.npy", arr)
    merged = merge_rank_shards(d, ["crps"], 3)
    assert merged["crps"].shape == (3, 3, 4)
    np.testing.assert_array_equal(merged["crps"][:2], a)
    np.testing.assert_array_equal(merged["crps"][2:], c)
    np.testing.assert_array_equal(np.load(f"{d}/crps.npy"), merged["crps"])

    # all-empty -> (0, 1, 1) sentinel the caller turns into a clear error
    for r in range(2):
        np.save(f"{d}/acc.rank{r}.npy", np.zeros((0, 1, 1), np.float32))
    assert merge_rank_shards(d, ["acc"], 2)["acc"].shape == (0, 1, 1)


def test_plot_ens_diagnostics_smoke(tmp_path):
    import os

    from ladcast_tpu.utils.visualization import plot_ens_diagnostics

    rng = np.random.default_rng(4)
    N, C, T, M, K = 2, 84, 8, 5, 121
    np.save(tmp_path / "ens_mean_mse.npy",
            rng.uniform(0.5, 2.0, (N, C, T)).astype(np.float32))
    np.save(tmp_path / "spread.npy",
            rng.uniform(0.5, 2.0, (N, C, T)).astype(np.float32))
    rh = rng.uniform(size=(N, C, T, M + 1)).astype(np.float32)
    np.save(tmp_path / "rank_hist.npy", rh / rh.sum(-1, keepdims=True))
    np.save(tmp_path / "spectrum_fc.npy",
            rng.uniform(1e-6, 1.0, (N, C, T, K)).astype(np.float32))
    np.save(tmp_path / "spectrum_truth.npy",
            rng.uniform(1e-6, 1.0, (N, C, T, K)).astype(np.float32))
    png = str(tmp_path / "diag.png")
    plot_ens_diagnostics(str(tmp_path), png)
    assert os.path.getsize(png) > 20000


def test_zonal_power_spectrum_lat_weighted():
    H, W = 4, 16
    x = np.zeros((H, W))
    x[0] = 2.0  # constant row -> all power in k=0 of that row
    lw = np.zeros(H)
    lw[0] = 1.0
    p = np.asarray(zonal_power_spectrum(jnp.asarray(x), jnp.asarray(lw)))
    np.testing.assert_allclose(p[0], 4.0, rtol=1e-6)
    np.testing.assert_allclose(p[1:], 0.0, atol=1e-9)
