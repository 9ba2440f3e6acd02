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


def test_header_parser(shards):
    from ladcast_tpu.data.native_reader import parse_npy_header

    paths, full, _ = shards
    off, shape, dtype = parse_npy_header(paths[0])
    assert shape == (7, 3, 4, 2) and dtype == np.float32
    with open(paths[0], "rb") as f:
        f.seek(off)
        raw = np.frombuffer(f.read(), np.float32).reshape(shape)
    np.testing.assert_array_equal(raw, full[:7])
