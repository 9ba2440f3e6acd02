"""Native shard reader: build, correctness vs numpy, multi-shard gather."""

import os
import shutil
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    rng = np.random.RandomState(0)
    arrays, paths = [], []
    for i, n in enumerate([7, 5]):
        a = rng.randn(n, 3, 4, 2).astype(np.float32)
        p = os.fspath(d / f"shard{i}.npy")
        np.save(p, a)
        arrays.append(a)
        paths.append(p)
    full = np.concatenate(arrays)
    ts = [2018010100 + i for i in range(len(full))]
    return paths, full, ts


def test_reader_matches_numpy(shards):
    from ladcast_tpu.data.native_reader import NpyShardSource

    paths, full, ts = shards
    src = NpyShardSource(paths, ts, num_threads=3)
    assert len(src) == 12

    idx = np.asarray([0, 6, 7, 11, 3])  # spans the shard boundary
    got = src.frames(idx)
    np.testing.assert_array_equal(got, full[idx])

    src.prefetch(idx)  # no-op correctness, must not crash
    got2 = src.frames(np.arange(12))
    np.testing.assert_array_equal(got2, full)
    assert src.timestamp(7) == ts[7]
    src.close()


def test_reader_with_ar_dataset(shards):
    from ladcast_tpu.data.latent_dataset import ARLatentDataset, ARWindowConfig
    from ladcast_tpu.data.native_reader import NpyShardSource

    paths, full, ts = shards
    src = NpyShardSource(paths, ts)
    ds = ARLatentDataset(src, ARWindowConfig(1, 2, 1, 1))
    inp, out, t0 = ds[0]
    np.testing.assert_array_equal(inp[0], full[0])
    np.testing.assert_array_equal(out, full[1:3])
    assert t0 == ts[0]
    src.close()


def test_cli_shard_dir_loading(shards, tmp_path):
    """cli/train_ar.load_latent_source opens a shard directory through the
    native reader (--reader native/auto) and the batch iterator drives the
    prefetch readahead path."""
    from ladcast_tpu.cli.train_ar import load_latent_source
    from ladcast_tpu.data.latent_dataset import (
        ARLatentDataset, ARWindowConfig, batch_iterator)

    paths, full, ts = shards
    d = tmp_path / "latents"
    d.mkdir()
    for i, p in enumerate(paths):
        shutil.copy(p, d / f"shard{i}.npy")
    np.save(d / "timestamps.npy", np.asarray(ts, np.int64))

    src = load_latent_source(os.fspath(d), reader="native")
    assert type(src).__name__ == "NpyShardSource"
    np.testing.assert_array_equal(src.frames(np.asarray([2, 9])),
                                  full[[2, 9]])

    calls = []
    orig = src.prefetch
    src.prefetch = lambda idx: (calls.append(np.asarray(idx)), orig(idx))
    ds = ARLatentDataset(src, ARWindowConfig(1, 2, 1, 1))
    it = batch_iterator(ds, 4, shuffle=False, drop_last=True)
    batches = list(it)
    assert len(batches) == 2 and batches[0][0].shape[0] == 4
    assert calls and all(c.dtype == np.int64 for c in calls)
    src.close()

    # mmap fallback yields the same data
    src2 = load_latent_source(os.fspath(d), reader="mmap")
    np.testing.assert_array_equal(src2.frames(np.asarray([2, 9])),
                                  full[[2, 9]])


def test_header_parser(shards):
    from ladcast_tpu.data.native_reader import parse_npy_header

    paths, full, _ = shards
    off, shape, dtype = parse_npy_header(paths[0])
    assert shape == (7, 3, 4, 2) and dtype == np.float32
    with open(paths[0], "rb") as f:
        f.seek(off)
        raw = np.frombuffer(f.read(), np.float32).reshape(shape)
    np.testing.assert_array_equal(raw, full[:7])


def test_native_tar_member_source(tmp_path):
    """TarNpyMemberSource serves the same frames as the tarfile path
    (uniform-stride archives written by write_tar_archive), and
    TarFieldSource transparently prefers it."""
    import os

    from ladcast_tpu.data import era5_tar, time_utils
    from ladcast_tpu.data.native_reader import TarNpyMemberSource

    rng = np.random.RandomState(0)
    N = 10
    ts = [time_utils.add_hours_int(2018013118, 6 * i) for i in range(N)]

    class Src:
        def frames_at(self, tss):
            out = []
            for t in tss:
                r = np.random.RandomState(int(t) % 100000)
                out.append(r.randn(8, 12, 5).astype(np.float32))
            return np.asarray(out)

    d = os.fspath(tmp_path / "tars")
    era5_tar.write_tar_archive(Src(), ts, d)  # spans a month boundary
    assert len(os.listdir(d)) == 2

    tars = sorted(os.path.join(d, f) for f in os.listdir(d))
    native = TarNpyMemberSource(tars)
    assert len(native) == N and native.frame_shape == (5, 8, 12)

    fs_native = era5_tar.TarFieldSource(d, crop_south_pole=False,
                                        drop_last_channel=False,
                                        native=True)
    fs_python = era5_tar.TarFieldSource(d, crop_south_pole=False,
                                        drop_last_channel=False,
                                        native=False)
    sel = [ts[7], ts[0], ts[9]]  # cross-archive, out of order
    np.testing.assert_array_equal(fs_native.frames_at(sel),
                                  fs_python.frames_at(sel))
    fs_native.close()
    fs_python.close()
