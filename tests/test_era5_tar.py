"""Tar archive data path: write -> read roundtrip, preprocessing."""

import numpy as np

from ladcast_tpu.data.era5_tar import (
    TarFieldSource,
    preprocess_batch,
    read_tar_range,
    write_tar_archive,
)


class _FakeSource:
    def __init__(self, n=30, C=5, H=9, W=8):
        rng = np.random.RandomState(0)
        self.data = rng.randn(n, H, W, C).astype(np.float32)
        from ladcast_tpu.data import time_utils
        self.ts = [time_utils.add_hours_int(2018013110, h) for h in range(n)]

    def frames_at(self, ts_ints):
        return np.stack([self.data[self.ts.index(int(t))] for t in ts_ints])


def test_tar_roundtrip(tmp_path):
    src = _FakeSource()
    d = str(tmp_path / "tars")
    write_tar_archive(src, src.ts, d)
    import os
    # spans a month boundary: Jan 31 10:00 + 30h -> Feb
    assert sorted(os.listdir(d)) == ["2018_01.tar", "2018_02.tar"]

    arr, ts = read_tar_range(d, src.ts[0], src.ts[-1])
    assert ts == src.ts
    np.testing.assert_allclose(arr, np.moveaxis(src.data, -1, 1), rtol=1e-6)

    reader = TarFieldSource(d, crop_south_pole=True, drop_last_channel=True)
    got = reader.frames_at(src.ts[:3])
    want = src.data[:3, 1:, :, :-1]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    reader.close()


def test_preprocess_batch_sst_mask():
    rng = np.random.RandomState(1)
    batch = rng.randn(2, 4, 5, 3).astype(np.float32)
    batch[0, 1, 2, 1] = np.nan
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out, mask = preprocess_batch(batch, mean, std, sst_channel=1)
    assert mask[0, 1, 2] and mask.sum() == 1
    assert out[0, 1, 2, 1] == -2.0
    assert np.isfinite(out).all()


def test_split_year_arithmetic():
    """Golden test of the reference WeatherDataset split boundaries
    (weather_dataset.py:14-23, 26-48)."""
    from ladcast_tpu.data.era5_tar import split_timestamps, split_year_range

    assert split_year_range("train") == (1979, 2017)
    assert split_year_range("validation") == (2018, 2018)
    assert split_year_range("test") == (2022, 2022)
    assert split_year_range("full") == (1979, 2022)
    assert split_year_range("2020") == (2020, 2020)

    ts = np.asarray([1978123123, 1979010100, 2017123123, 2018010100,
                     2018123123, 2019010100, 2021123123, 2022010100,
                     2022123123, 2023010100], np.int64)
    assert list(split_timestamps(ts, "train")) == [1979010100, 2017123123]
    assert list(split_timestamps(ts, "validation")) == [2018010100,
                                                        2018123123]
    assert list(split_timestamps(ts, "test")) == [2022010100, 2022123123]
    assert list(split_timestamps(ts, "full")) == list(ts[1:-1])
    assert list(split_timestamps(ts, "2019")) == [2019010100]


def test_split_tar_files_and_available_timestamps(tmp_path):
    """split_tar_files skips missing months silently (the reference checks
    os.path.exists per month); available_timestamps walks archive order."""
    from ladcast_tpu.data import time_utils
    from ladcast_tpu.data.era5_tar import (
        available_timestamps,
        split_tar_files,
        write_tar_archive,
    )

    class _TinySource:
        def __init__(self, ts):
            self.ts = list(ts)

        def frames_at(self, ts_ints):
            return np.full((len(ts_ints), 2, 3, 1),
                           float(int(ts_ints[0]) % 97), np.float32)

    d = str(tmp_path / "tars")
    ts = ([time_utils.add_hours_int(2017120100, 6 * k) for k in range(3)]
          + [time_utils.add_hours_int(2018030100, 6 * k) for k in range(2)]
          + [2022010112])
    write_tar_archive(_TinySource(ts), ts, d)

    import os
    assert sorted(os.listdir(d)) == ["2017_12.tar", "2018_03.tar",
                                     "2022_01.tar"]
    assert [os.path.basename(p) for p in split_tar_files(d, "train")] == \
        ["2017_12.tar"]
    assert [os.path.basename(p) for p in split_tar_files(d, "validation")] \
        == ["2018_03.tar"]
    assert [os.path.basename(p) for p in split_tar_files(d, "test")] == \
        ["2022_01.tar"]
    assert len(split_tar_files(d, "full")) == 3

    np.testing.assert_array_equal(available_timestamps(d, "train"), ts[:3])
    np.testing.assert_array_equal(available_timestamps(d, "validation"),
                                  ts[3:5])
    np.testing.assert_array_equal(available_timestamps(d, "full"), ts)


def test_preprocess_matches_reference_oracle():
    """Run the ACTUAL reference weather_dataset_preprocess_batch
    (dataloader/weather_dataset.py:203-224, torch NCHW) on the same
    physical fields: normalization + SST -2 masking must agree
    elementwise (NaNs occur only in the SST channel per the data
    contract; crop/drop are handled by the source here)."""
    import torch

    from tests.oracles.refload import load_reference

    wd = load_reference("ladcast.dataloader.weather_dataset")
    rng = np.random.RandomState(7)
    B, H, W, C, sst = 3, 6, 8, 5, 2
    batch = rng.randn(B, H, W, C).astype(np.float32) * 4 + 1
    batch[0, 2, 3, sst] = np.nan
    batch[2, 0, 0, sst] = np.nan
    mean = rng.randn(C).astype(np.float32)
    std = (rng.rand(C).astype(np.float32) + 0.5)

    got, mask = preprocess_batch(batch, mean, std, sst_channel=sst)

    t = torch.from_numpy(np.ascontiguousarray(
        batch.transpose(0, 3, 1, 2)))                      # NCHW
    tm = torch.from_numpy(mean.reshape(1, C, 1, 1))
    ts = torch.from_numpy(std.reshape(1, C, 1, 1))
    ref, ref_mask = wd.weather_dataset_preprocess_batch(
        t, tm, ts, crop_south_pole=False, sst_channel_idx=sst)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(mask, ref_mask.numpy())
