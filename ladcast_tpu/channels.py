"""Channel-layout conventions for the 84-channel ERA5 stack.

Replicates the stacking order of the reference
(dataloader/utils.py:309-353 ``xarr_varname_to_tensor`` and
configs/*.yaml ``channel_names``): 6 atmospheric variables x 13 pressure
levels (level-major within each variable) followed by 6 surface variables.
SST is surface index 4 => global channel index 82.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

ATM_VARIABLES: Tuple[str, ...] = (
    "geopotential",
    "specific_humidity",
    "temperature",
    "u_component_of_wind",
    "v_component_of_wind",
    "vertical_velocity",
)

SURFACE_VARIABLES: Tuple[str, ...] = (
    "10m_u_component_of_wind",
    "10m_v_component_of_wind",
    "2m_temperature",
    "mean_sea_level_pressure",
    "sea_surface_temperature",
    "total_precipitation_6hr",
)

STATIC_VARIABLES: Tuple[str, ...] = (
    "land_sea_mask",
    "standard_deviation_of_orography",
    "angle_of_sub_gridscale_orography",
    "anisotropy_of_sub_gridscale_orography",
    "slope_of_sub_gridscale_orography",
)

PRESSURE_LEVELS: Tuple[int, ...] = (
    50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)

NUM_ATM_VARS = len(ATM_VARIABLES)
NUM_SURFACE_VARS = len(SURFACE_VARIABLES)
NUM_LEVELS = len(PRESSURE_LEVELS)
NUM_DYNAMIC_CHANNELS = NUM_ATM_VARS * NUM_LEVELS + NUM_SURFACE_VARS  # 84
NUM_STATIC_CHANNELS = len(STATIC_VARIABLES)  # 5

# Grid: 1.5 deg, south-pole row cropped (reference README.md + preprocessing).
LAT_START_DEG = -88.5
LAT_END_DEG = 90.0
LON_START_DEG = 0.0
LON_END_DEG = 358.5
INTERVAL_DEG = 1.5
GRID_LAT = 120
GRID_LON = 240
LATENT_LAT = 15
LATENT_LON = 30
LATENT_SPATIAL_SCALE = 8

# Latent patch-center latitudes on the 15-row latent grid
# (reference train_AR.py:859-861: np.linspace(-83.25, 84.75, 15)).
LATENT_LAT_CENTERS = (-83.25, 84.75, 15)  # (start, stop, num) for np.linspace

SST_SURFACE_INDEX = SURFACE_VARIABLES.index("sea_surface_temperature")
SST_CHANNEL_INDEX = NUM_ATM_VARS * NUM_LEVELS + SST_SURFACE_INDEX  # 82


def channel_names() -> List[str]:
    """Full 84-channel name list, ``var_level_{p}`` for atmospheric."""
    names = [f"{v}_level_{p}" for v in ATM_VARIABLES for p in PRESSURE_LEVELS]
    names.extend(SURFACE_VARIABLES)
    return names


def channel_index(var: str, level: int | None = None) -> int:
    if var in ATM_VARIABLES:
        assert level is not None, f"{var} needs a pressure level"
        return ATM_VARIABLES.index(var) * NUM_LEVELS + PRESSURE_LEVELS.index(level)
    assert level is None
    return NUM_ATM_VARS * NUM_LEVELS + SURFACE_VARIABLES.index(var)


def channel_slices() -> Dict[str, slice]:
    """Per-variable channel slices in the 84-channel stack."""
    out = {}
    for i, v in enumerate(ATM_VARIABLES):
        out[v] = slice(i * NUM_LEVELS, (i + 1) * NUM_LEVELS)
    base = NUM_ATM_VARS * NUM_LEVELS
    for i, v in enumerate(SURFACE_VARIABLES):
        out[v] = slice(base + i, base + i + 1)
    return out
