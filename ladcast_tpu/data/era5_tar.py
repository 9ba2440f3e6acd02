"""Monthly-tar ERA5 archive reading and streaming.

Equivalent of the reference webdataset path (dataloader/weather_dataset.py
read_tar_files:232-318 and the HF GeneratorBasedBuilder WeatherDataset):
monthly ``YYYY_MM.tar`` archives of per-hour ``YYYY-MM-DDTHH.npy`` arrays
(channels-first (C, 121, 240), 85 channels = 78 atm + 7 surface with surface_pressure last in the
reference layout).

Provides:
  * :func:`read_tar_range` -- the random-access reader
  * :class:`TarFieldSource` -- field-source protocol (frames_at) over a
    tar directory, for the trainers/eval CLIs
  * :func:`preprocess_batch` -- south-pole crop, surface-pressure drop,
    normalize, SST NaN masking (weather_dataset.py:203-224)
  * :func:`write_tar_archive` -- the xr2webdataset-equivalent writer
    (preprocecss/xr2webdataset.py:14-133) from any field source
"""

from __future__ import annotations

import io
import os
import tarfile
from datetime import datetime, timedelta
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ladcast_tpu.data import time_utils


def _member_name(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H") + ".npy"


def _tar_name(dt: datetime) -> str:
    return f"{dt.year}_{dt.month:02d}.tar"


# ---------------------------------------------------------------------------
# Split semantics (reference dataloader/weather_dataset.py:14-48): the HF
# WeatherDataset builder's year-range splits over the monthly tar archive.
# ---------------------------------------------------------------------------

TRAIN_YEARS: Tuple[int, int] = (1979, 2017)
VAL_YEARS: Tuple[int, int] = (2018, 2018)
TEST_YEARS: Tuple[int, int] = (2022, 2022)
FULL_YEARS: Tuple[int, int] = (1979, 2022)

_SPLIT_RANGES = {
    "train": TRAIN_YEARS,
    "validation": VAL_YEARS,
    "test": TEST_YEARS,
    "full": FULL_YEARS,
}


def split_year_range(split: str) -> Tuple[int, int]:
    """(start_year, end_year) of a named split; per-year splits
    ("2018".."2022") select that single year (weather_dataset.py:43-47)."""
    if split in _SPLIT_RANGES:
        return _SPLIT_RANGES[split]
    year = int(split)
    assert 1979 <= year <= 2100, split
    return (year, year)


def split_tar_files(tar_dir: str, split: str) -> list:
    """Existing monthly tar paths of a split, in (year, month) order
    (weather_dataset.py:26-48: missing months are silently skipped)."""
    start, end = split_year_range(split)
    files = []
    for year in range(start, end + 1):
        for month in range(1, 13):
            p = os.path.join(tar_dir, f"{year}_{month:02d}.tar")
            if os.path.exists(p):
                files.append(p)
    return files


def split_timestamps(timestamps: Sequence[int], split: str) -> np.ndarray:
    """Filter YYYYMMDDHH ints to a split's year range (the same selection
    the tar splits express, usable for zarr/npz sources)."""
    ts = np.asarray(timestamps, np.int64)
    start, end = split_year_range(split)
    years = ts // 10**6
    return ts[(years >= start) & (years <= end)]


def available_timestamps(tar_dir: str, split: str = "full") -> np.ndarray:
    """All member timestamps present in a split's tars, in archive order
    (the HF generator's iteration order, weather_dataset.py:172-200)."""
    out = []
    for path in split_tar_files(tar_dir, split):
        with tarfile.open(path, "r") as t:
            for m in t.getmembers():
                if m.name.endswith(".npy"):
                    out.append(time_utils.timestamp_str_to_int(
                        m.name[:-len(".npy")]))
    return np.asarray(out, np.int64)


def read_tar_range(
    tar_dir: str,
    start_ts: int,
    end_ts: int,
    dh: int = 1,
) -> Tuple[np.ndarray, list]:
    """Read hourly frames [start_ts, end_ts] (YYYYMMDDHH ints) from the
    monthly tars. Returns (array (N, ...), list of ts ints)."""
    start = time_utils.int_to_datetime(start_ts)
    end = time_utils.int_to_datetime(end_ts)
    dts = []
    cur = start
    while cur <= end:
        dts.append(cur)
        cur += timedelta(hours=dh)

    frames = []
    open_tars: Dict[str, tarfile.TarFile] = {}
    try:
        for dt in dts:
            tname = _tar_name(dt)
            if tname not in open_tars:
                path = os.path.join(tar_dir, tname)
                open_tars[tname] = tarfile.open(path, "r")
            member = open_tars[tname].extractfile(_member_name(dt))
            frames.append(np.load(io.BytesIO(member.read())))
    finally:
        for t in open_tars.values():
            t.close()
    return np.stack(frames), [time_utils.datetime_to_int(d) for d in dts]


class TarFieldSource:
    """frames_at over a directory of monthly tars. Frames are converted to
    channels-last (lat, lon, C) and optionally cropped/trimmed to the
    84-channel convention.

    ``native="auto"`` (default) serves member reads through the C++
    threaded pread pool (data/native_reader.TarNpyMemberSource -- the
    Ray-lazy-mapper role, SURVEY.md section 2.1 item 21). Archives are
    indexed LAZILY, one tar at a time on first access (a 44-year archive
    directory costs nothing at construction and only the months actually
    read are ever indexed); an archive with non-uniform member strides or
    a missing toolchain falls back to the tarfile path for that archive
    only, with a log line naming it. ``native=False`` forces the tarfile
    path; ``native=True`` raises on the first archive that cannot be
    served natively."""

    def __init__(self, tar_dir: str, crop_south_pole: bool = True,
                 drop_last_channel: bool = True, native="auto"):
        self.tar_dir = tar_dir
        self.crop_south_pole = crop_south_pole
        self.drop_last_channel = drop_last_channel
        self._cache: Dict[str, tarfile.TarFile] = {}
        self._native_mode = native if native in ("auto", True) else False
        # per-tar native sources, opened on first touch; None marks a tar
        # that failed native indexing and uses the tarfile path instead
        self._native_srcs: Dict[str, object] = {}

    def _native_for(self, tname: str):
        """Lazily open (and memoize) the native source for one archive."""
        if not self._native_mode:
            return None
        if tname in self._native_srcs:
            return self._native_srcs[tname]
        src = None
        try:
            from ladcast_tpu.data.native_reader import TarNpyMemberSource
            src = TarNpyMemberSource([os.path.join(self.tar_dir, tname)])
        except Exception as e:
            if self._native_mode is True:
                raise
            import logging
            logging.getLogger(__name__).warning(
                "native tar reader disabled for %s (%s); "
                "using tarfile fallback for this archive", tname, e)
        self._native_srcs[tname] = src
        return src

    def _post(self, arr: np.ndarray) -> np.ndarray:
        # (C, lat, lon) raw member -> framework conventions
        if self.drop_last_channel:
            arr = arr[:-1]  # surface_pressure (weather_dataset.py:213)
        if self.crop_south_pole:
            arr = arr[:, 1:, :]
        return np.moveaxis(arr, 0, -1)

    def frames_at(self, ts_ints: Sequence[int]) -> np.ndarray:
        out = [None] * len(ts_ints)
        # group by archive so each native source is asked once per call
        by_tar: Dict[str, list] = {}
        dts = [time_utils.int_to_datetime(int(ts)) for ts in ts_ints]
        for pos, dt in enumerate(dts):
            by_tar.setdefault(_tar_name(dt), []).append(pos)
        for tname, positions in by_tar.items():
            src = self._native_for(tname)
            if src is not None:
                try:
                    idx = [src.index_by_name[_member_name(dts[p])]
                           for p in positions]
                except KeyError as e:
                    raise KeyError(f"timestamp not in archive: {e}") from e
                raw = src.frames(np.asarray(idx, np.int64))
                if self.drop_last_channel:
                    raw = raw[:, :-1]
                if self.crop_south_pole:
                    raw = raw[:, :, 1:, :]
                raw = np.ascontiguousarray(
                    np.moveaxis(raw, 1, -1), dtype=np.float32)
                for j, p in enumerate(positions):
                    out[p] = raw[j]
                continue
            if tname not in self._cache:
                self._cache[tname] = tarfile.open(
                    os.path.join(self.tar_dir, tname), "r")
            for p in positions:
                member = self._cache[tname].extractfile(_member_name(dts[p]))
                arr = np.load(io.BytesIO(member.read()))  # (C, lat, lon)
                out[p] = self._post(arr)
        return np.asarray(out, np.float32)

    def close(self):
        for t in self._cache.values():
            t.close()
        self._cache.clear()
        for src in self._native_srcs.values():
            if src is not None:
                src.close()
        self._native_srcs.clear()


def preprocess_batch(
    batch: np.ndarray,           # (B, lat, lon, C) raw physical fields
    mean: np.ndarray,
    std: np.ndarray,
    sst_channel: Optional[int] = None,
    mask_value: float = -2.0,
):
    """Normalize + SST NaN->mask (weather_dataset.py:203-224; crop/drop
    handled by the source). Returns (batch, nan_mask or None)."""
    batch = (batch - mean) / std
    if sst_channel is None:
        return batch, None
    nan_mask = np.isnan(batch[..., sst_channel])
    batch = np.where(np.isnan(batch), mask_value, batch)
    return batch.astype(np.float32), nan_mask


def write_tar_archive(
    source,
    timestamps: Sequence[int],
    tar_dir: str,
) -> None:
    """Write per-hour .npy members into monthly tars
    (preprocecss/xr2webdataset.py semantics; frames stored channels-first
    like the reference so archives interoperate)."""
    os.makedirs(tar_dir, exist_ok=True)
    open_writers: Dict[str, tarfile.TarFile] = {}
    try:
        for ts in timestamps:
            dt = time_utils.int_to_datetime(int(ts))
            tname = _tar_name(dt)
            if tname not in open_writers:
                open_writers[tname] = tarfile.open(
                    os.path.join(tar_dir, tname), "a")
            frame = source.frames_at([ts])[0]  # (lat, lon, C)
            buf = io.BytesIO()
            np.save(buf, np.moveaxis(frame, -1, 0).astype(np.float32))
            data = buf.getvalue()
            info = tarfile.TarInfo(_member_name(dt))
            info.size = len(data)
            open_writers[tname].addfile(info, io.BytesIO(data))
    finally:
        for t in open_writers.values():
            t.close()
