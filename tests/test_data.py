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
