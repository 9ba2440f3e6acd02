"""Export decoded forecasts to georeferenced xarray Datasets / zarr.

Equivalent of the reference ``latent_ens_to_xarr`` / zarr-append path
(pipelines/utils.py:83-246, evaluate/pred_rollout.py:497-506): unpack the
84-channel stack into named variables with
(idx, time, prediction_timedelta, [level,] latitude, longitude) coords.

xarray is an optional dependency; in its absence use
:func:`decoded_to_npz` which stores the same content as arrays + JSON
coordinate metadata.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np

from ladcast_tpu import channels as ch


def grid_coords(num_steps: int, step_size_hour: int = 6):
    """Decoded bundles are forecast-only: frame i is valid at init +
    (i+1)*step (the reference reserves prediction_timedelta 0 for the
    analysis frame, pipelines/utils.py:339,494-510, which decode paths
    here never include)."""
    return {
        "prediction_timedelta_hours": [step_size_hour * (i + 1)
                                       for i in range(num_steps)],
        "level": list(ch.PRESSURE_LEVELS),
        "latitude": np.arange(ch.LAT_START_DEG, ch.LAT_END_DEG + 1e-6,
                              ch.INTERVAL_DEG).tolist(),
        "longitude": np.arange(ch.LON_START_DEG, ch.LON_END_DEG + 1e-6,
                               ch.INTERVAL_DEG).tolist(),
    }


def pack_variables(
    decoded: np.ndarray,          # (ens, T, lat, lon, C_total) channels-last
    atm_names: Sequence[str],
    sur_names: Sequence[str],
    num_levels: int,
    extract_variables: Optional[Sequence[str]] = None,
):
    """Unpack the channel stack into per-variable arrays.

    The channel convention is the reference's (dataloader/utils.py:309-353,
    pipelines/utils.py:211-229): atmospheric variables first, each
    contributing ``num_levels`` consecutive channels at
    ``var_idx * num_levels``, then one channel per surface variable.
    Returns ``{var: (ens, T, num_levels, lat, lon)}`` for atmospheric and
    ``{var: (ens, T, lat, lon)}`` for surface variables — the
    (prediction_timedelta, level) axis order of the reference
    ``latent_ens_to_xarr`` (oracle-pinned in tests/test_oracle_export.py).
    """
    atm_names, sur_names = list(atm_names), list(sur_names)
    names = (list(extract_variables) if extract_variables is not None
             else atm_names + sur_names)
    base = len(atm_names) * num_levels
    out = {}
    for var in names:
        if var in atm_names:
            start = atm_names.index(var) * num_levels
            block = decoded[..., start:start + num_levels]  # (E,T,la,lo,lev)
            out[var] = np.moveaxis(block, -1, 2)            # (E,T,lev,la,lo)
        else:
            out[var] = decoded[..., base + sur_names.index(var)]
    return out


def decoded_to_dataset(
    decoded: np.ndarray,          # (ens, T, lat, lon, 84) physical fields
    init_ts_int: int,
    step_size_hour: int = 6,
    extract_variables: Optional[Sequence[str]] = None,
):
    """Pack a decoded ensemble into an xr.Dataset (requires xarray)."""
    import pandas as pd
    import xarray as xr

    E, T = decoded.shape[:2]
    co = grid_coords(T, step_size_hour)
    coords = {
        "idx": np.arange(E),
        "time": [pd.to_datetime(str(init_ts_int), format="%Y%m%d%H")],
        "prediction_timedelta": [pd.Timedelta(hours=h)
                                 for h in co["prediction_timedelta_hours"]],
        "level": co["level"],
        "latitude": co["latitude"],
        "longitude": co["longitude"],
    }
    ds = xr.Dataset(coords=coords)
    packed = pack_variables(decoded, ch.ATM_VARIABLES, ch.SURFACE_VARIABLES,
                            ch.NUM_LEVELS, extract_variables)
    for var, arr in packed.items():
        if var in ch.ATM_VARIABLES:
            data = arr[:, None]  # (E, 1, T, lev, lat, lon)
            dims = ("idx", "time", "prediction_timedelta", "level",
                    "latitude", "longitude")
        else:
            data = arr[:, None]
            dims = ("idx", "time", "prediction_timedelta", "latitude",
                    "longitude")
        ds[var] = xr.DataArray(data.astype(np.float32), dims=dims)
    return ds


def append_to_zarr(ds, path: str, append_dim: str = "time") -> None:
    """Create-or-append (pred_rollout.py:497-506 behavior)."""
    import os
    if os.path.exists(path):
        ds.to_zarr(path, mode="a", append_dim=append_dim)
    else:
        ds.to_zarr(path, mode="w")


def decoded_to_npz(
    decoded: np.ndarray,
    init_ts_int: int,
    path: str,
    step_size_hour: int = 6,
) -> None:
    """xarray-free export: arrays + JSON coordinate metadata."""
    T = decoded.shape[1]
    meta = grid_coords(T, step_size_hour)
    meta["init_time"] = init_ts_int
    meta["variables"] = list(ch.ATM_VARIABLES) + list(ch.SURFACE_VARIABLES)
    meta["channel_names"] = ch.channel_names()
    np.savez_compressed(path, fields=decoded.astype(np.float32),
                        meta=json.dumps(meta))
