"""Host-side timestamp utilities.

Ports of the reference's calendar helpers (models/embeddings.py:422-464,
dataloader/ar_dataloder.py:11-18, dataloader/utils.py:517-600). Calendar
math stays on the host: jitted code consumes precomputed float
year-progress arrays (see ops/embeddings.year_sincos_embedding).

No pandas/xarray dependency -- plain datetime + numpy, so these work in
the minimal TPU image.
"""

from __future__ import annotations

import calendar
from datetime import datetime, timedelta
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np


def timestamp_str_to_int(ts: str) -> int:
    """'YYYY-MM-DDThh' -> YYYYMMDDHH int (embeddings.py:422-425)."""
    return int(ts.replace("-", "").replace("T", "").replace(" ", "").replace(":", "")[:10])


def int_to_datetime(ts_int: int) -> datetime:
    s = str(int(ts_int))
    return datetime(int(s[0:4]), int(s[4:6]), int(s[6:8]), int(s[8:10]))


def datetime_to_int(dt: datetime) -> int:
    return int(dt.strftime("%Y%m%d%H"))


def add_hours_int(ts_int: int, hours: int) -> int:
    return datetime_to_int(int_to_datetime(ts_int) + timedelta(hours=hours))


def year_progress(dt: datetime) -> float:
    """Fraction of the year elapsed (embeddings.py:442-447)."""
    start = datetime(dt.year, 1, 1)
    end = datetime(dt.year + 1, 1, 1)
    return (dt - start).total_seconds() / (end - start).total_seconds()


def timestamps_to_year_progress(ts_ints: Iterable[int]) -> np.ndarray:
    """(B,) YYYYMMDDHH ints -> (B,) float32 year progress
    (embeddings.py:454-464)."""
    return np.asarray([year_progress(int_to_datetime(t)) for t in ts_ints],
                      dtype=np.float32)


def rollout_year_progress(
    init_ts_int: int,
    num_repetitions: int,
    hours_per_repetition: int,
) -> np.ndarray:
    """Year progress for each AR repetition of a rollout: the reference
    advances the sampler timestamp by step*hours_per_repetition from the
    init time (pipelines/utils.py:538-544)."""
    return np.asarray(
        [year_progress(int_to_datetime(init_ts_int) +
                       timedelta(hours=i * hours_per_repetition))
         for i in range(num_repetitions)], dtype=np.float32)


def filter_eval_timestamps(
    years: Sequence[int],
    num_samples_per_month: int,
    hours: Sequence[int] = (0, 12),
) -> List[int]:
    """Evenly spaced evaluation init times (dataloader/utils.py:517-600):
    per month, ``num_samples_per_month`` days linspaced over [1, last_day)
    (endpoint excluded, first day forced to 1), at 00z and 12z.
    Returns YYYYMMDDHH ints.
    """
    out: List[int] = []
    for year in years:
        for month in range(1, 13):
            for day in _sample_month_days(year, month,
                                          num_samples_per_month):
                for hour in hours:
                    out.append(datetime_to_int(datetime(year, month, int(day), hour)))
    return sorted(out)


def date_bounds(start_date: Optional[str], end_date: Optional[str],
                lead_hours: int = 0) -> Tuple[int, int]:
    """(lo, hi) YYYYMMDDHH bounds from optional date strings; ``hi`` is
    shifted back by ``lead_hours`` so a forecast started at ``hi`` still
    verifies inside the range (the reference's end - total_lead rule,
    evaluate_ens_gpu.py:213-215). Missing bounds are wide open."""
    lo = date_str_to_int(start_date) if start_date else 0
    hi = (add_hours_int(date_str_to_int(end_date), -lead_hours)
          if end_date else 9_999_999_999)
    return lo, hi


def _sample_month_days(year: int, month: int,
                       num_samples_per_month: int) -> np.ndarray:
    """The reference's per-month day selection (dataloader/utils.py:
    558-562): linspace over [1, last_day) (endpoint excluded), rounded,
    first day forced to 1."""
    _, last_day = calendar.monthrange(year, month)
    days = np.linspace(1, last_day, num_samples_per_month, endpoint=False)
    days = np.round(days).astype(int)
    days[0] = 1
    return days


def date_str_to_int(s: str) -> int:
    """'YYYY-MM-DD[Thh]' -> YYYYMMDDHH int; a date-only string gets
    hour 00 (the reference passes --start_date/--end_date as dates,
    pred_rollout.py:110-117)."""
    digits = "".join(c for c in s if c.isdigit())
    if len(digits) == 8:
        digits += "00"
    if len(digits) != 10:
        raise ValueError(f"expected YYYY-MM-DD[Thh], got {s!r}")
    return int(digits)


def filter_eval_timestamps_range(
    start: int,
    end: int,
    num_samples_per_month: int,
    hours: Sequence[int] = (0, 12),
) -> List[int]:
    """Date-range variant of the evaluation init-time protocol: the
    reference's ``--start_date/--end_date`` + ``filter_time_range``
    WITHOUT enforce_year (pred_rollout.py:242-250 feeding
    dataloader/utils.py:577-600). For every (year, month) intersecting
    [start, end]: ``num_samples_per_month`` days linspaced over
    [1, last_day) (first day forced to 1) at 00z/12z, keeping only
    timestamps <= end. Faithful reference quirk: generated days BEFORE
    ``start`` in the first partial month are kept -- the reference clips
    only against the range maximum.
    """
    sd, ed = int_to_datetime(start), int_to_datetime(end)
    if sd > ed:
        raise ValueError(f"start {start} is after end {end}")
    out: List[int] = []
    year, month = sd.year, sd.month
    while (year, month) <= (ed.year, ed.month):
        for day in _sample_month_days(year, month, num_samples_per_month):
            for hour in hours:
                ts = datetime_to_int(datetime(year, month, int(day), hour))
                if ts <= end:
                    out.append(ts)
        year, month = (year + 1, 1) if month == 12 else (year, month + 1)
    return sorted(out)
