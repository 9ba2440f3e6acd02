"""ctypes bindings for the native shard reader (native/shard_reader.cpp).

Provides ``NpyShardSource``, a drop-in latent source (same protocol as
``ArrayLatentSource``) backed by the C++ threaded pread pool: frames are
gathered from standard ``.npy`` shard files without loading them into
RAM and without holding the GIL during I/O. The npy v1/v2 header is
parsed here (offset + shape + dtype), the byte-level reads happen in C++.

The library builds on demand with ``make -C native`` (g++ only); if the
toolchain is unavailable the caller should fall back to the numpy mmap
path (ArrayLatentSource over np.load(mmap_mode='r')).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libshard_reader.so")

_lib = None


def _build_library() -> str:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   capture_output=True)
    return _LIB_PATH


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build_library()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sr_open.restype = ctypes.c_void_p
    lib.sr_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int]
    lib.sr_num_frames.restype = ctypes.c_int64
    lib.sr_num_frames.argtypes = [ctypes.c_void_p]
    lib.sr_open2.restype = ctypes.c_void_p
    lib.sr_open2.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int]
    lib.sr_read.restype = ctypes.c_int
    lib.sr_read.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                            ctypes.c_char_p]
    lib.sr_prefetch.restype = None
    lib.sr_prefetch.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.sr_close.restype = None
    lib.sr_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def parse_npy_header(path: str) -> Tuple[int, tuple, np.dtype]:
    """Return (data_offset, shape, dtype) of an uncompressed .npy file."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        if version >= (2, 0):
            shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
        else:
            shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
        if fortran:
            raise ValueError(f"{path}: fortran-order npy unsupported")
        return f.tell(), shape, dtype


def parse_npy_header_bytes(buf: bytes, origin: str = "<buffer>"
                           ) -> Tuple[int, tuple, np.dtype]:
    """(data_offset, shape, dtype) of an in-memory .npy prefix."""
    import io as _io

    f = _io.BytesIO(buf)
    version = np.lib.format.read_magic(f)
    if version >= (2, 0):
        shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
    else:
        shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
    if fortran:
        raise ValueError(f"{origin}: fortran-order npy unsupported")
    return f.tell(), shape, dtype


class TarNpyMemberSource:
    """Threaded random access over tar archives of EQUAL-SIZE .npy members
    (the reference webdataset layout, dataloader/weather_dataset.py) via
    the C++ pread pool.

    A tar of same-shaped members is a strided container: member i's array
    data sits at ``first_data_offset + i * stride`` where stride =
    512-byte header + payload rounded to 512. One index pass per archive
    (python tarfile, headers only), then all frame gathers run in C++
    without the GIL. Raises ValueError for archives that are not
    uniformly strided (caller falls back to the tarfile path)."""

    def __init__(self, tar_paths: Sequence[str], num_threads: int = 4):
        lib = load_library()
        counts, data_offsets, strides = [], [], []
        self.member_names: list = []
        frame_shape = None
        dtype = None
        import tarfile as _tarfile

        for p in tar_paths:
            with _tarfile.open(p, "r") as tf:
                infos = [m for m in tf.getmembers()
                         if m.name.endswith(".npy")]
            if not infos:
                raise ValueError(f"{p}: no .npy members")
            infos.sort(key=lambda m: m.offset_data)
            offs = np.asarray([m.offset_data for m in infos], np.int64)
            if len({m.size for m in infos}) != 1:
                raise ValueError(f"{p}: mixed member sizes")
            d = np.diff(offs)
            if d.size and (d != d[0]).any():
                raise ValueError(f"{p}: non-uniform member stride")
            stride = int(d[0]) if d.size else int(
                -(-infos[0].size // 512) * 512 + 512)
            with open(p, "rb") as f:
                f.seek(int(offs[0]))
                hdr, shape, dt = parse_npy_header_bytes(
                    f.read(min(infos[0].size, 4096)), p)
            if frame_shape is None:
                frame_shape, dtype = shape, dt
            elif shape != frame_shape or dt != dtype:
                raise ValueError(f"{p}: member layout mismatch")
            counts.append(len(infos))
            data_offsets.append(int(offs[0]) + hdr)
            strides.append(stride)
            self.member_names.extend(m.name for m in infos)

        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self.frame_bytes = int(np.prod(frame_shape)) * self.dtype.itemsize
        c_paths = (ctypes.c_char_p * len(tar_paths))(
            *[p.encode() for p in tar_paths])
        self._lib = lib
        self._h = lib.sr_open2(
            c_paths, len(tar_paths),
            (ctypes.c_int64 * len(counts))(*counts),
            (ctypes.c_int64 * len(counts))(*data_offsets),
            (ctypes.c_int64 * len(counts))(*strides),
            self.frame_bytes, num_threads)
        if not self._h:
            raise OSError(f"failed to open tar shards: {tar_paths}")
        self.index_by_name = {n: i for i, n in
                              enumerate(self.member_names)}

    def __len__(self):
        return len(self.member_names)

    def frames(self, idx) -> np.ndarray:
        idx = np.asarray(idx, np.int64)
        out = np.empty((idx.size, *self.frame_shape), self.dtype)
        rc = self._lib.sr_read(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.size, out.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            raise OSError("native tar read failed")
        return out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.sr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NpyShardSource:
    """Latent source over one or more .npy shards, each (time, h, w, C),
    plus a timestamps vector covering all shards in order."""

    def __init__(self, paths: Sequence[str], timestamps: Sequence[int],
                 num_threads: int = 4):
        lib = load_library()
        offsets, counts = [], []
        shape_tail = None
        dtype = None
        for p in paths:
            off, shape, dt = parse_npy_header(p)
            if shape_tail is None:
                shape_tail, dtype = shape[1:], dt
            else:
                assert shape[1:] == shape_tail and dt == dtype, \
                    f"shard {p} layout mismatch"
            offsets.append(off)
            counts.append(shape[0])
        self.frame_shape = tuple(shape_tail)
        self.dtype = np.dtype(dtype)
        self.frame_bytes = int(np.prod(shape_tail)) * self.dtype.itemsize

        c_paths = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        c_counts = (ctypes.c_int64 * len(paths))(*counts)
        c_offsets = (ctypes.c_int64 * len(paths))(*offsets)
        self._lib = lib
        self._h = lib.sr_open(c_paths, len(paths), c_counts, c_offsets,
                              self.frame_bytes, num_threads)
        if not self._h:
            raise OSError(f"failed to open shards: {paths}")
        total = lib.sr_num_frames(self._h)
        assert total == len(timestamps), (total, len(timestamps))
        self.timestamps = np.asarray(timestamps, np.int64)

    def __len__(self):
        return int(self.timestamps.shape[0])

    def frames(self, idx) -> np.ndarray:
        idx = np.asarray(idx, np.int64)
        out = np.empty((idx.size, *self.frame_shape), self.dtype)
        c_idx = idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        rc = self._lib.sr_read(self._h, c_idx, idx.size,
                               out.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            raise OSError("native shard read failed")
        return out

    def prefetch(self, idx) -> None:
        idx = np.asarray(idx, np.int64)
        self._lib.sr_prefetch(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.size)

    def timestamp(self, idx: int) -> int:
        return int(self.timestamps[idx])

    def close(self):
        if getattr(self, "_h", None):
            self._lib.sr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# Measurement note (round 2): on the 1-vCPU dev host the tar path is
# cache-state-bound and the pool cannot parallelize (observed anywhere
# from 2.6x faster cold to ~parity warm vs the tarfile path); the
# design targets multi-core trainer hosts, where member gathers run on
# n_threads preads without the GIL while the training step executes.
