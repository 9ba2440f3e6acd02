"""Latitude / cell-area weighting (WeatherBench2-replicated formulas,
reference evaluate/utils.py:9-48)."""

from __future__ import annotations

import numpy as np


def cos_lat_weights(lat_deg) -> np.ndarray:
    """cos(lat) normalized to mean 1 (evaluate/utils.py:40-48)."""
    w = np.cos(np.deg2rad(np.asarray(lat_deg, dtype=np.float64)))
    return (w / w.mean()).astype(np.float64)


def cell_area_weights(lat_deg) -> np.ndarray:
    """Exact spherical cell-area weights normalized to mean 1
    (evaluate/utils.py:9-37): cell bounds at latitude midpoints, poles at
    +-pi/2; weight = sin(upper) - sin(lower), / mean."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    mid = (lat[:-1] + lat[1:]) / 2
    bounds = np.concatenate([[-np.pi / 2], mid, [np.pi / 2]])
    area = np.sin(bounds[1:]) - np.sin(bounds[:-1])
    return area / area.mean()


def grid_lat_weights(kind: str = "cos", grid_lat: int = 120) -> np.ndarray:
    """Weights for the standard cropped 1.5-degree grid (lat -88.5..90)."""
    lat = np.linspace(-88.5, 90.0, grid_lat)
    if kind == "cos":
        return cos_lat_weights(lat)
    if kind == "area":
        return cell_area_weights(lat)
    raise ValueError(kind)


def latent_lat_weights() -> np.ndarray:
    """cos-lat weights on the 15-row latent grid (train_AR.py:858-861)."""
    return cos_lat_weights(np.linspace(-83.25, 84.75, 15))
