"""Climatology handling for ACC scoring.

Port of the reference ``climatology_to_timeseries``
(evaluate/utils.py:152-201): index a (dayofyear, hour, ...) climatology
by the day-of-year/hour of each forecast valid time, producing a
forecast-aligned series. Works on plain numpy arrays (no xarray needed):
clim[dayofyear-1, hour_index, ...].
"""

from __future__ import annotations

from datetime import timedelta
from typing import Sequence

import numpy as np

from ladcast_tpu.data import time_utils


def climatology_to_timeseries(
    clim: np.ndarray,           # (366, n_hours, ...) dayofyear x hour bins
    hour_values: Sequence[int],  # e.g. (0, 6, 12, 18)
    start_ts_int: int,
    lead_time_hours: int,
    interval_hours: int = 6,
    exclude_start: bool = True,
) -> np.ndarray:
    """Return clim values aligned to the forecast valid times
    [start(+interval) .. start+lead] at ``interval_hours`` spacing."""
    hour_values = list(hour_values)
    start = time_utils.int_to_datetime(start_ts_int)
    n = lead_time_hours // interval_hours + 1
    times = [start + timedelta(hours=interval_hours * i) for i in range(n)]
    if exclude_start:
        times = times[1:]
    out = []
    for t in times:
        doy = t.timetuple().tm_yday
        hidx = hour_values.index(t.hour)
        out.append(clim[doy - 1, hidx])
    return np.stack(out)


def compute_climatology(
    fields: np.ndarray,          # (N, ...) samples
    ts_ints: Sequence[int],
    hour_values: Sequence[int] = (0, 6, 12, 18),
) -> np.ndarray:
    """Day-of-year/hour-binned mean climatology from a sample archive
    (the WB2-style climatology the reference downloads)."""
    hour_values = list(hour_values)
    shape = (366, len(hour_values)) + fields.shape[1:]
    acc = np.zeros(shape, np.float64)
    cnt = np.zeros((366, len(hour_values)), np.int64)
    for x, ts in zip(fields, ts_ints):
        dt = time_utils.int_to_datetime(int(ts))
        doy = dt.timetuple().tm_yday
        h = hour_values.index(dt.hour)
        acc[doy - 1, h] += x
        cnt[doy - 1, h] += 1
    cnt = np.maximum(cnt, 1)
    return (acc / cnt.reshape(366, len(hour_values),
                              *([1] * (fields.ndim - 1)))).astype(np.float32)
