"""Normalization transforms for fields and latents.

Ports of dataloader/utils.py:223-306 with a channels-LAST convention:
tensors are (..., H, W, C) and mean/std are per-channel (C,) vectors.
``target_std`` rescales normalized data to match the EDM sigma_data
(latents use target_std=0.5, train_AR.py:498-500).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize(x, mean, std, target_std: float = 1.0):
    """(x - mean)/std * target_std over the trailing channel axis."""
    return (x - mean) / std * target_std


def inverse_normalize(x, mean, std, target_std: float = 1.0):
    return (x / target_std) * std + mean


def mask_sst_nans(x, sst_channel: int, fill_value: float = -2.0):
    """Replace NaNs in the SST channel with -2 (out-of-distribution for
    normalized SST; GenCast-style masking, weather_dataset.py:216-221).
    Returns (masked_x, nan_mask) with nan_mask True where NaN was."""
    sst = x[..., sst_channel]
    nan_mask = jnp.isnan(sst)
    sst = jnp.where(nan_mask, fill_value, sst)
    x = x.at[..., sst_channel].set(sst)
    return x, nan_mask


def crop_south_pole(x: np.ndarray, lat_axis: int = -3) -> np.ndarray:
    """Drop the first latitude row (-90 deg) from a (..., lat, lon, C)
    array (weather_dataset.py:211-212; latitude ascends from -90)."""
    idx = [slice(None)] * x.ndim
    idx[lat_axis] = slice(1, None)
    return x[tuple(idx)]


def periodic_roll(x, shift_lat: int, shift_lon: int, lat_axis: int = -3,
                  lon_axis: int = -2):
    """Periodic re-anchoring augmentation (dataloader/utils.py:83-141):
    roll the grid so a new (lat, lon) becomes the top-left corner."""
    return jnp.roll(x, shift=(-shift_lat, -shift_lon),
                    axis=(lat_axis, lon_axis))
