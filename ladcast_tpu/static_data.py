"""Loaders for bundled static assets: normalization statistics and the
land-sea-mask / orography conditioning fields.

Asset provenance (verbatim data ports, see SURVEY.md section 2 item 32):
  - ERA5_normal_1979_2017.json: per-variable (per-level for atmospheric)
    mean/std (reference ladcast/static/ERA5_normal_1979_2017.json)
  - ERA5_latent_normal_1979_2017_lat84.json: 84-vector latent mean/std
  - 240x121_land_sea_mask.npy / 240x121_orography.npy: converted from the
    reference .pt tensors (shape (121,240) and (4,121,240), lat x lon).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Tuple

import numpy as np

from ladcast_tpu import channels as ch

_STATIC_DIR = os.path.join(os.path.dirname(__file__), "static")


def _static_path(name: str) -> str:
    """Resolve a static asset, honoring the LADCAST_STATIC_DIR override.

    Set LADCAST_STATIC_DIR to a directory holding same-named replacement
    files to retarget normalization stats and static fields for a custom
    retraining -- the TPU-side equivalent of the reference's
    --normalization_json / --latent_normal_json / --lsm_path /
    --orography_path flags (evaluate/pred_rollout.py:82-209), covering
    every CLI at once. Files absent from the override dir fall back to
    the bundled assets. Read at first use (results are lru_cached): set
    the env var before the first static_data call.
    """
    override = os.environ.get("LADCAST_STATIC_DIR")
    if override:
        p = os.path.join(override, name)
        if os.path.exists(p):
            return p
    return os.path.join(_STATIC_DIR, name)


@functools.lru_cache(maxsize=None)
def load_normalization_json(name: str = "ERA5_normal_1979_2017.json") -> Dict:
    with open(_static_path(name)) as f:
        return json.load(f)


def precompute_mean_std(
    normalization_param_dict: Dict,
    variable_names: List[str],
) -> Tuple[np.ndarray, np.ndarray]:
    """Expand per-variable stats into flat per-channel mean/std vectors.

    Level-keyed dicts expand in their JSON insertion order (the reference
    relies on dict order too, dataloader/utils.py:272-306).
    """
    means, stds = [], []
    for var in variable_names:
        if var not in normalization_param_dict:
            raise ValueError(f"No normalization parameters for variable {var}.")
        p = normalization_param_dict[var]
        if isinstance(p["mean"], dict):
            for level in p["mean"].keys():
                means.append(p["mean"][level])
                stds.append(p["std"][level])
        else:
            means.append(p["mean"])
            stds.append(p["std"])
    return (np.asarray(means, dtype=np.float32), np.asarray(stds, dtype=np.float32))


@functools.lru_cache(maxsize=None)
def era5_mean_std(incl_sur_pressure: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std for the 84-channel dynamic stack."""
    d = load_normalization_json("ERA5_normal_1979_2017.json")
    names = list(ch.ATM_VARIABLES) + list(ch.SURFACE_VARIABLES)
    if incl_sur_pressure:
        names = names + ["surface_pressure"]
    return precompute_mean_std(d, names)


@functools.lru_cache(maxsize=None)
def latent_mean_std() -> Tuple[np.ndarray, np.ndarray]:
    """84-vector latent mean/std (ERA5_latent_normal_1979_2017_lat84.json)."""
    d = load_normalization_json("ERA5_latent_normal_1979_2017_lat84.json")
    return (np.asarray(d["mean"], dtype=np.float32),
            np.asarray(d["std"], dtype=np.float32))


@functools.lru_cache(maxsize=None)
def _raw_static_fields() -> Tuple[np.ndarray, np.ndarray]:
    lsm = np.load(_static_path("240x121_land_sea_mask.npy"))
    oro = np.load(_static_path("240x121_orography.npy"))
    return lsm, oro


def static_conditioning_tensor(
    crop_south_pole: bool = True,
    normalize: bool = True,
    eps: float = 0.0,
    layout: str = "CHW",
) -> np.ndarray:
    """(5, lat, lon) [or HWC] static conditioning stack: lsm + 4 orography.

    Matches evaluate/pred_rollout.py:260-291: z-score each field over the
    *cropped* grid. torch.std uses the unbiased (ddof=1) estimator; we
    replicate that so the statics match the reference bit-for-bit.
    """
    lsm, oro = _raw_static_fields()
    stack = np.concatenate([lsm[None], oro], axis=0).astype(np.float32)  # (5,121,240)
    if crop_south_pole:
        stack = stack[:, 1:, :]  # latitude starts at -90; drop the pole row
    if normalize:
        mean = stack.mean(axis=(1, 2), keepdims=True)
        std = stack.std(axis=(1, 2), keepdims=True, ddof=1)
        stack = (stack - mean) / (std + eps)
    if layout == "HWC":
        return np.transpose(stack, (1, 2, 0))
    return stack


def static_mean_std(crop_south_pole: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Per-field mean/std of the 5 static channels over the (cropped) grid
    (the z-scoring applied by :func:`static_conditioning_tensor`); used to
    unnormalize static-channel reconstruction metrics
    (train_encdec.py:975-981)."""
    lsm, oro = _raw_static_fields()
    stack = np.concatenate([lsm[None], oro], axis=0).astype(np.float32)
    if crop_south_pole:
        stack = stack[:, 1:, :]
    return (stack.mean(axis=(1, 2)),
            stack.std(axis=(1, 2), ddof=1))


def latent_lat_centers() -> np.ndarray:
    start, stop, num = ch.LATENT_LAT_CENTERS
    return np.linspace(start, stop, num)
