"""compare_baseline CLI: digitized-curve acceptance check
(BASELINE.md table -> pass/fail verdict JSON + plot)."""

import json
import os

import numpy as np
import pytest

from ladcast_tpu import channels as ch
from ladcast_tpu.cli import compare_baseline


def _scores_dir(tmp_path, scale):
    """ens_mean_mse.npy where every baselined channel's RMSE is
    `scale` x its digitized day-10 value at ALL lead times."""
    C, T = 84, 40
    mse = np.full((3, C, T), 1e-12, np.float32)
    for (var, level), days in compare_baseline.BASELINE_RMSE.items():
        ci = ch.channel_index(var, level)
        for day, base in days.items():
            t = day * 24 // 6 - 1
            mse[:, ci, t] = (scale * base) ** 2
    d = str(tmp_path)
    np.save(os.path.join(d, "ens_mean_mse.npy"), mse)
    return d


def test_compare_passes_when_beating_baseline(tmp_path):
    res = compare_baseline.compare(_scores_dir(tmp_path, 0.9))
    assert res["all_pass"] and res["num_scored"] == 36
    z = res["verdicts"]["geopotential@500"]["day5"]
    assert z["status"] == "pass" and abs(z["ratio"] - 0.9) < 1e-3


def test_compare_fails_beyond_tolerance(tmp_path):
    res = compare_baseline.compare(_scores_dir(tmp_path, 1.5))
    assert not res["all_pass"]
    assert res["verdicts"]["2m_temperature"]["day1"]["status"] == "FAIL"
    # and the CLI exits nonzero
    with pytest.raises(SystemExit):
        compare_baseline.main(["--scores", str(tmp_path)])


def test_short_rollout_marks_unscored(tmp_path):
    d = str(tmp_path)
    np.save(os.path.join(d, "ens_mean_mse.npy"),
            np.ones((2, 84, 4), np.float32))  # 24 h only
    res = compare_baseline.compare(d)
    assert res["verdicts"]["geopotential@500"]["day5"]["status"] == \
        "not_scored"
    assert res["num_scored"] == 12  # only the day-1 points


def test_plot_smoke(tmp_path):
    d = _scores_dir(tmp_path, 1.0)
    png = os.path.join(d, "curves.png")
    compare_baseline.plot(d, png)
    assert os.path.getsize(png) > 10000
