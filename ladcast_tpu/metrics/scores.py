"""Probabilistic forecast scores (WB2-replicated; reference
evaluate/utils.py:51-149 and evaluate/evaluate_ens_gpu.py:339-419) as pure
jnp functions that run on-device, so a full 240h evaluation never leaves
HBM.

NaN handling follows the reference: the SST channel is scored with
nan-aware means (ocean-only); use the ``nan_safe`` variants for it.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def pointwise_crps_skill(forecast, truth, ensemble_axis: int = 0):
    """mean_i |truth - forecast_i| (evaluate/utils.py:51-59)."""
    return jnp.abs(truth - forecast).mean(axis=ensemble_axis)


def pointwise_crps_spread(forecast, ensemble_axis: int = 0):
    """O(M log M) sorted-forecast spread estimator (evaluate/utils.py:62-101):
    2/(M(M-1)) * sum_i (2i - M - 1) * sorted_i, ranks 1-based."""
    m = forecast.shape[ensemble_axis]
    if m < 2:
        return jnp.zeros_like(jnp.take(forecast, 0, axis=ensemble_axis))
    srt = jnp.sort(forecast, axis=ensemble_axis)
    w = 2.0 * jnp.arange(1, m + 1, dtype=forecast.dtype) - m - 1
    shape = [1] * forecast.ndim
    shape[ensemble_axis] = m
    weighted = (srt * w.reshape(shape)).sum(axis=ensemble_axis)
    return 2.0 * weighted / (m * (m - 1))


def crps(forecast, truth, ensemble_axis: int = 0):
    """CRPS = skill - spread/2 (fair-CRPS variant of WB2,
    evaluate/utils.py:104-118)."""
    return (pointwise_crps_skill(forecast, truth, ensemble_axis)
            - 0.5 * pointwise_crps_spread(forecast, ensemble_axis))


def acc(forecast, truth, climate, lat_weight: Optional[jnp.ndarray] = None,
        nan_safe: bool = False):
    """Anomaly correlation coefficient over the trailing (lat, lon) axes
    (evaluate/utils.py:121-149)."""
    mean = jnp.nanmean if nan_safe else jnp.mean
    fa = forecast - climate
    ta = truth - climate
    if lat_weight is not None:
        num = mean(fa * ta * lat_weight, axis=(-2, -1))
        den = jnp.sqrt(mean(fa**2 * lat_weight, axis=(-2, -1))
                       * mean(ta**2 * lat_weight, axis=(-2, -1)))
    else:
        num = mean(fa * ta, axis=(-2, -1))
        den = jnp.sqrt(mean(fa**2, axis=(-2, -1)) * mean(ta**2, axis=(-2, -1)))
    return num / den


def lat_weighted_mse(pred, truth, lat_weight, nan_safe: bool = False):
    """Latitude-weighted MSE over trailing (lat, lon); lat_weight
    broadcastable with (..., lat, lon)."""
    mean = jnp.nanmean if nan_safe else jnp.mean
    return mean(lat_weight * (pred - truth) ** 2, axis=(-2, -1))


def lat_weighted_rmse(pred, truth, lat_weight, nan_safe: bool = False):
    return jnp.sqrt(lat_weighted_mse(pred, truth, lat_weight, nan_safe))


# ---------------------------------------------------------------------------
# Ensemble-calibration diagnostics (beyond the reference, which scores
# RMSE/CRPS/ACC only). Definitions follow WeatherBench2 / standard
# ensemble-verification practice.
# ---------------------------------------------------------------------------

def ensemble_spread(forecast, lat_weight, ensemble_axis: int = 0,
                    nan_mask=None):
    """Lat-weighted ensemble spread: sqrt of the domain-mean unbiased
    (ddof=1) ensemble variance over the trailing (lat, lon) axes.

    The spread/skill ratio pairs this with the ens-mean RMSE; a
    calibrated M-member ensemble satisfies
    RMSE ~= spread * sqrt((M+1)/M) (the "fair" finite-ensemble factor).
    ``nan_mask``: optional boolean (..., lat, lon), True where valid
    (e.g. SST ocean points).
    """
    var = forecast.var(axis=ensemble_axis, ddof=1)
    if nan_mask is not None:
        var = jnp.where(nan_mask, var, jnp.nan)
    return jnp.sqrt(jnp.nanmean(lat_weight * var, axis=(-2, -1)))


def rank_histogram(forecast, truth, lat_weight, ensemble_axis: int = 0):
    """Lat-weighted rank histogram (Talagrand diagram) over the trailing
    (lat, lon) axes.

    Returns normalized frequencies over M+1 bins: bin r is the weighted
    fraction of grid points where exactly r members fall below the
    truth. Flat == calibrated; U-shape == under-dispersive; dome ==
    over-dispersive. Truth NaNs (SST over land) get zero weight. Ties
    are measure-zero for continuous fields and break low.
    """
    m = forecast.shape[ensemble_axis]
    ranks = (forecast < jnp.expand_dims(truth, ensemble_axis)).sum(
        axis=ensemble_axis)                       # (..., lat, lon) in [0, M]
    valid = jnp.isfinite(truth)
    w = jnp.broadcast_to(lat_weight * valid, ranks.shape)
    onehot = (ranks[..., None] == jnp.arange(m + 1)).astype(jnp.float32)
    hist = (onehot * w[..., None]).sum(axis=(-3, -2))   # (..., M+1)
    return hist / jnp.maximum(hist.sum(axis=-1, keepdims=True), 1e-12)


def zonal_power_spectrum(x, lat_weight=None):
    """Zonal (along-longitude) power spectrum, lat-averaged.

    x: (..., lat, lon). Returns (..., lon//2 + 1) with Parseval
    normalization: ``sum_k P_k == mean_lon x**2`` per latitude row,
    before the (optionally lat-weighted) average over latitude. The
    standard blur diagnostic for diffusion forecasts: ensemble-mean
    spectra falling off faster than truth at high wavenumber == smoothing.
    """
    n = x.shape[-1]
    coef = jnp.fft.rfft(x.astype(jnp.float32), axis=-1) / n
    p = jnp.abs(coef) ** 2
    mult = jnp.full((p.shape[-1],), 2.0).at[0].set(1.0)
    if n % 2 == 0:
        mult = mult.at[-1].set(1.0)
    p = p * mult
    if lat_weight is not None:
        lw = (lat_weight / lat_weight.sum()).reshape(-1, 1)
        return (p * lw).sum(axis=-2)
    return p.mean(axis=-2)
