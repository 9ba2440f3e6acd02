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
