"""Data plane tests: AR windowing semantics, time utilities, transforms."""

from datetime import datetime

import numpy as np

from ladcast_tpu.data import time_utils
from ladcast_tpu.data.latent_dataset import (
    ARLatentDataset,
    ARWindowConfig,
    ArrayLatentSource,
    batch_iterator,
)
from ladcast_tpu.data.transforms import normalize, inverse_normalize


def _hourly_source(n=200):
    # latent value == hour index so windows are checkable
    lat = np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1) \
        * np.ones((n, 2, 3, 4), np.float32)
    ts = [time_utils.add_hours_int(2018010100, h) for h in range(n)]
    return ArrayLatentSource(lat, ts)


def test_ar_window_semantics():
    """Reference windowing (ar_dataloder.py:107-161): input_seq_len=1,
    return_seq_len=4, interval=6 -> item 0 = (frame 0, frames 6,12,18,24)."""
    src = _hourly_source()
    ds = ARLatentDataset(src, ARWindowConfig(1, 4, 6, 1))
    inp, out, ts = ds[0]
    assert inp.shape == (1, 2, 3, 4) and out.shape == (4, 2, 3, 4)
    assert inp[0, 0, 0, 0] == 0
    np.testing.assert_array_equal(out[:, 0, 0, 0], [6, 12, 18, 24])
    assert ts == 2018010100

    inp, out, ts = ds[5]
    assert inp[0, 0, 0, 0] == 5
    np.testing.assert_array_equal(out[:, 0, 0, 0], [11, 17, 23, 29])
    assert ts == 2018010105

    # full_seq_len = (1+4-1)*6+1 = 25 -> length = 200-25+1 = 176
    assert len(ds) == 176


def test_ar_window_multi_input():
    src = _hourly_source()
    ds = ARLatentDataset(src, ARWindowConfig(2, 3, 6, 1))
    inp, out, ts = ds[0]
    np.testing.assert_array_equal(inp[:, 0, 0, 0], [0, 6])
    np.testing.assert_array_equal(out[:, 0, 0, 0], [12, 18, 24])
    assert ts == 2018010100  # timestamp of FIRST input frame


def test_batch_iterator_year_progress():
    src = _hourly_source()
    ds = ARLatentDataset(src, ARWindowConfig(1, 4, 6, 1))
    it = batch_iterator(ds, 4, shuffle=False, num_push_forward_steps=2)
    inp, out, yp = next(it)
    assert inp.shape[0] == 4 and out.shape == (4, 4, 2, 3, 4)
    assert yp.shape == (4, 2)
    # chunk 1 is 6h later than chunk 0
    assert (yp[:, 1] > yp[:, 0]).all()


def test_normalize_transform_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 4, 5).astype(np.float32)
    mean = rng.randn(5).astype(np.float32)
    std = rng.rand(5).astype(np.float32) + 0.5
    y = normalize(x, mean, std, target_std=0.5)
    x2 = inverse_normalize(np.asarray(y), mean, std, target_std=0.5)
    np.testing.assert_allclose(np.asarray(x2), x, rtol=1e-4, atol=1e-5)


def test_timestamp_utils():
    assert time_utils.timestamp_str_to_int("2018-03-05T12") == 2018030512
    assert time_utils.datetime_to_int(datetime(2018, 3, 5, 12)) == 2018030512
    assert time_utils.add_hours_int(2018123123, 1) == 2019010100
    yp = time_utils.year_progress(datetime(2018, 7, 2, 12))
    assert 0.49 < yp < 0.51
    # mid-year +6h monotonicity across the whole schedule
    arr = time_utils.rollout_year_progress(2018010100, 10, 24)
    assert (np.diff(arr) > 0).all()


def test_filter_eval_timestamps_vs_reference():
    """Run the ACTUAL reference filter_time_range (dataloader/utils.py:
    517-600) as the oracle for the 2018 eval-protocol init-time list.

    The reference call shape is the pred_rollout one (pred_rollout.py:
    241-250): a full-year 6-hourly DatetimeIndex with
    enforce_year='2018'. Any divergence here would silently score
    different init times in the science acceptance run.
    """
    import pandas as pd

    from tests.oracles.refload import load_reference

    dutils = load_reference("ladcast.dataloader.utils")
    idx = pd.date_range("2018-01-01", "2018-12-31T18:00", freq="6h")
    for n in (2, 10):
        ref = dutils.filter_time_range(idx, num_samples_per_month=n,
                                       enforce_year="2018")
        ref_ints = sorted(int(ts.strftime("%Y%m%d%H")) for ts in ref)
        assert time_utils.filter_eval_timestamps([2018], n) == ref_ints


def test_filter_eval_timestamps():
    ts = time_utils.filter_eval_timestamps([2018], 10)
    # 10 days x 2 hours x 12 months
    assert len(ts) == 240
    assert ts[0] == 2018010100 and ts[1] == 2018010112
    # first day of each month always sampled (dataloader/utils.py:561)
    assert 2018020100 in ts
    # last day never sampled (endpoint=False)
    assert not any(t // 100 % 100 == 31 and (t // 10000) % 100 == 1
                   for t in ts)


def test_ar_window_vs_reference_dataset():
    """Run the ACTUAL reference XarrayDataset3D (ar_dataloder.py:74-162)
    over a fake-xarray DataArray as the windowing oracle: item tensors
    (normalize transform incl. target_std) and first-input timestamps
    must match ARLatentDataset across every index, for several window
    configs including the reference's double-truncate_first length quirk
    (ar_dataloder.py:117 subtracts truncate_first again after isel).
    """
    import torch

    from tests.oracles.fake_xarray import FakeDataArray
    from tests.oracles.refload import load_reference

    ar_dl = load_reference("ladcast.dataloader.ar_dataloder")

    n, C, H, W = 120, 3, 4, 5
    rng = np.random.RandomState(0)
    raw = rng.randn(C, n, H, W).astype(np.float32)
    times = (np.datetime64("2017-12-28T00") +
             np.arange(n) * np.timedelta64(1, "h"))
    da = FakeDataArray(raw, ("C", "time", "H", "W"), {"time": times})
    mean = rng.randn(C).astype(np.float32)
    std = rng.rand(C).astype(np.float32) + 0.5

    src = ArrayLatentSource(
        np.transpose(raw, (1, 2, 3, 0)),
        [time_utils.datetime_to_int(t.astype("datetime64[h]").tolist())
         for t in times])

    for in_len, out_len, ibp, samp, trunc in (
            (1, 4, 6, 1, 0), (2, 3, 6, 1, 0), (1, 4, 2, 3, 0),
            (1, 2, 6, 1, 5)):
        ref_ds = ar_dl.XarrayDataset3D(
            da, transform="normalize",
            transform_args={"mean": torch.from_numpy(mean),
                            "std": torch.from_numpy(std),
                            "target_std": 0.5},
            input_seq_len=in_len, return_seq_len=out_len,
            truncate_first=trunc, sampling_interval=samp,
            interval_between_pred=ibp)
        ds = ARLatentDataset(
            src, ARWindowConfig(in_len, out_len, ibp, samp, trunc),
            mean=mean, std=std, target_std=0.5)
        assert len(ref_ds) == len(ds), (in_len, out_len, ibp, samp, trunc)
        for i in range(len(ds)):
            r_in, r_out, r_ts = ref_ds[i]
            inp, out, ts = ds[i]
            np.testing.assert_allclose(
                np.transpose(inp, (3, 0, 1, 2)), r_in.numpy(), rtol=1e-6)
            np.testing.assert_allclose(
                np.transpose(out, (3, 0, 1, 2)), r_out.numpy(), rtol=1e-6)
            assert ts == r_ts


def test_filter_eval_timestamps_range_vs_reference():
    """Date-range protocol oracle: the ACTUAL reference filter_time_range
    WITHOUT enforce_year over a partial multi-month (and cross-year)
    range (pred_rollout.py:242-250 with --start_date/--end_date)."""
    import pandas as pd

    from tests.oracles.refload import load_reference

    dutils = load_reference("ladcast.dataloader.utils")
    for start, end in (("2018-06-15", "2018-09-30"),
                       ("2017-11-03", "2018-02-20"),
                       ("2018-03-01", "2018-03-02")):
        idx = pd.date_range(start, end, freq="12h")
        ref = dutils.filter_time_range(idx, num_samples_per_month=4)
        ref_ints = sorted(int(ts.strftime("%Y%m%d%H")) for ts in ref)
        got = time_utils.filter_eval_timestamps_range(
            time_utils.date_str_to_int(start),
            time_utils.date_str_to_int(end), 4)
        assert got == ref_ints, (start, end)


def test_date_str_to_int():
    assert time_utils.date_str_to_int("2018-06-01") == 2018060100
    assert time_utils.date_str_to_int("2018-06-01T12") == 2018060112
    import pytest
    with pytest.raises(ValueError):
        time_utils.date_str_to_int("2018-6")


def test_static_dir_override(tmp_path):
    """LADCAST_STATIC_DIR retargets normalization stats / static fields
    (the reference's --normalization_json / --lsm_path etc. in one
    mechanism); absent files fall back to the bundled assets."""
    import json
    import os

    from ladcast_tpu import static_data

    base_mean, base_std = static_data.era5_mean_std()
    lat_m, lat_s = static_data.latent_mean_std()
    custom = {"mean": (np.asarray(lat_m) + 1.0).tolist(),
              "std": (np.asarray(lat_s) * 2.0).tolist()}
    with open(tmp_path / "ERA5_latent_normal_1979_2017_lat84.json",
              "w") as f:
        json.dump(custom, f)
    old = os.environ.get("LADCAST_STATIC_DIR")
    try:
        os.environ["LADCAST_STATIC_DIR"] = os.fspath(tmp_path)
        static_data.load_normalization_json.cache_clear()
        static_data.latent_mean_std.cache_clear()
        static_data.era5_mean_std.cache_clear()
        m2, s2 = static_data.latent_mean_std()
        np.testing.assert_allclose(m2, np.asarray(lat_m) + 1.0)
        np.testing.assert_allclose(s2, np.asarray(lat_s) * 2.0)
        # field stats file absent from the override dir -> bundled
        fm2, fs2 = static_data.era5_mean_std()
        np.testing.assert_array_equal(fm2, base_mean)
    finally:
        if old is None:
            os.environ.pop("LADCAST_STATIC_DIR", None)
        else:
            os.environ["LADCAST_STATIC_DIR"] = old
        static_data.load_normalization_json.cache_clear()
        static_data.latent_mean_std.cache_clear()
        static_data.era5_mean_std.cache_clear()


def test_sharded_latent_source_lazy(tmp_path):
    """The --reader mmap fallback streams multi-shard archives lazily.

    Correctness: shuffled cross-shard gathers equal the in-memory
    concatenation. Laziness: a ~1.6 GB sparse shard must not be
    materialized by construction + a few-row read (the old
    np.concatenate fallback would pull the whole archive into RAM —
    VERDICT r4 weak #4)."""
    import os
    import resource

    from ladcast_tpu.data.latent_dataset import ShardedLatentSource

    rng = np.random.RandomState(0)
    arrays, paths = [], []
    for i, n in enumerate([6, 3, 8]):
        a = rng.randn(n, 2, 3, 4).astype(np.float32)
        p = os.fspath(tmp_path / f"s{i}.npy")
        np.save(p, a)
        arrays.append(a)
        paths.append(p)
    full = np.concatenate(arrays)
    ts = [2018010100 + i for i in range(len(full))]
    src = ShardedLatentSource(paths, ts)
    assert len(src) == 17 and src.frame_shape == (2, 3, 4)
    idx = np.asarray([16, 0, 6, 8, 5, 9, 1])  # shuffled, spans all shards
    np.testing.assert_array_equal(src.frames(idx), full[idx])
    assert src.timestamp(7) == ts[7]
    # batch_iterator-compatible: scalar + list index forms
    np.testing.assert_array_equal(src.frames([3]), full[[3]])

    # laziness: sparse 1.6 GB shard (400k frames x 4 KiB), touch 3 rows.
    # Measured in a SUBPROCESS: ru_maxrss is a process-lifetime high-water
    # mark, so an in-process delta is vacuous when earlier suite tests
    # already peaked higher (full-res DCAE tests do).
    big_frames = 400_000
    big_path = os.fspath(tmp_path / "big.npy")
    big = np.lib.format.open_memmap(
        big_path, mode="w+", dtype=np.float32,
        shape=(big_frames, 8, 16, 8))
    big[0] = 1.0
    big[big_frames - 1] = 2.0
    del big
    import pathlib
    import subprocess
    import sys as _sys
    # NOTE: the child must report VmHWM, not ru_maxrss — ru_maxrss
    # inherits the parent's fork-time high-water mark on Linux (a pytest
    # parent with torch/jax loaded forks at ~400+ MB), while VmHWM is
    # reset by execve.
    snippet = f"""
import numpy as np
from ladcast_tpu.data.latent_dataset import ShardedLatentSource
ts2 = np.arange({big_frames}, dtype=np.int64) + 2018010100
src2 = ShardedLatentSource([{big_path!r}], ts2)
got = src2.frames(np.asarray([0, {big_frames} - 1, 17]))
assert got.shape == (3, 8, 16, 8)
assert got[0, 0, 0, 0] == 1.0 and got[1, 0, 0, 0] == 2.0
hwm = [l for l in open("/proc/self/status") if l.startswith("VmHWM")]
print(int(hwm[0].split()[1]))
"""
    env = dict(os.environ, PYTHONPATH=os.fspath(
        pathlib.Path(__file__).resolve().parent.parent))
    out = subprocess.run([_sys.executable, "-c", snippet], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    peak_kib = int(out.stdout.strip().splitlines()[-1])
    # numpy + interpreter baseline is ~60-100 MB; materializing the
    # 1.6 GB shard would blow far past 300 MB.
    assert peak_kib < 300_000, \
        f"mmap fallback materialized the archive (peak RSS {peak_kib / 1024:.0f} MB)"
