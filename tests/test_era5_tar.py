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
