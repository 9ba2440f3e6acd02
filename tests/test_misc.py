"""Smaller-component tests: climatology alignment, decoder-freeze
optimizer mask, exporters, visualization smoke, KML parsing."""

import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.metrics.climatology import (
    climatology_to_timeseries,
    compute_climatology,
)


def test_climatology_roundtrip():
    from ladcast_tpu.data import time_utils

    # two years of 6-hourly scalars equal to dayofyear + hour/100
    ts, vals = [], []
    for year in (2016, 2017):
        t = 2016010100 + (year - 2016) * 1_000_000 * 10000
        t = int(f"{year}010100")
        while t // 1_000_000 == year:
            dt = time_utils.int_to_datetime(t)
            ts.append(t)
            vals.append(dt.timetuple().tm_yday + dt.hour / 100)
            t = time_utils.add_hours_int(t, 6)
    clim = compute_climatology(np.asarray(vals, np.float32)[:, None], ts)
    assert clim.shape[:2] == (366, 4)
    # день 10, hour 12 -> 10.12
    np.testing.assert_allclose(clim[9, 2, 0], 10.12, atol=1e-4)

    series = climatology_to_timeseries(clim, (0, 6, 12, 18), 2017060100,
                                       24, 6)
    dt0 = datetime(2017, 6, 1, 6)
    want0 = dt0.timetuple().tm_yday + dt0.hour / 100
    np.testing.assert_allclose(series[0, 0], want0, atol=1e-4)
    assert series.shape == (4, 1)


def test_decoder_only_mask_freezes_encoder():
    import optax

    from ladcast_tpu.train.optim import decoder_only_mask, make_optimizer

    params = {"params": {"encoder": {"k": jnp.ones((3,))},
                         "decoder": {"k": jnp.ones((3,))}}}
    mask = decoder_only_mask(params)
    assert mask["params"]["decoder"]["k"] is True
    assert mask["params"]["encoder"]["k"] is False

    opt = make_optimizer(lr=1e-1, num_warmup_steps=0, num_training_steps=10,
                         trainable_mask=mask)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    assert float(jnp.abs(updates["params"]["encoder"]["k"]).max()) == 0.0
    assert float(jnp.abs(updates["params"]["decoder"]["k"]).max()) > 0.0


def test_npz_exporter(tmp_path):
    from ladcast_tpu.evaluate.export import decoded_to_npz

    dec = np.random.RandomState(0).randn(2, 3, 120, 240, 84).astype(np.float32)
    p = os.fspath(tmp_path / "fc.npz")
    decoded_to_npz(dec, 2018010100, p)
    d = np.load(p, allow_pickle=True)
    assert d["fields"].shape == (2, 3, 120, 240, 84)
    import json
    meta = json.loads(str(d["meta"]))
    assert meta["init_time"] == 2018010100
    assert len(meta["channel_names"]) == 84
    # forecast-only bundle: frame i valid at init + (i+1)*step
    # (timedelta 0 = analysis, never included in decoded output)
    assert meta["prediction_timedelta_hours"] == [6, 12, 18]


def test_visualization_smoke(tmp_path):
    from ladcast_tpu.utils.visualization import (
        plot_reconstruction_comparison,
        to_rgb,
    )

    rng = np.random.RandomState(0)
    f = rng.randn(12, 24).astype(np.float32)
    lat = np.linspace(-88.5, 90, 12)
    lon = np.linspace(0, 358.5, 24)
    out = os.fspath(tmp_path / "recon.png")
    plot_reconstruction_comparison(f, f + 0.1, lat, lon, "z500", out)
    assert os.path.getsize(out) > 0
    rgb = to_rgb(f)
    assert rgb.shape == (12, 24, 3) and rgb.dtype == np.uint8

    from ladcast_tpu.utils.visualization import save_comparison_animation
    pred = rng.randn(3, 12, 24).astype(np.float32)
    gif = os.fspath(tmp_path / "cmp.gif")
    save_comparison_animation(pred, pred * 0.9, gif, var_name="z500")
    assert os.path.getsize(gif) > 0


def test_kml_parsing(tmp_path):
    from ladcast_tpu.evaluate.tracker import load_kml_tracks

    kml = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
<Folder><name>ECMWF</name>
<Placemark><TimeStamp><when>2018-09-01T00:00:00Z</when></TimeStamp>
<Point><coordinates>140.25,21.0,0</coordinates></Point></Placemark>
<Placemark><TimeStamp><when>2018-09-01T06:00:00Z</when></TimeStamp>
<Point><coordinates>-220.5,22.5</coordinates></Point></Placemark>
</Folder></Document></kml>"""
    p = tmp_path / "tracks.kml"
    p.write_text(kml)
    tracks = load_kml_tracks(os.fspath(p))
    assert "ECMWF" in tracks and len(tracks["ECMWF"]) == 2
    t, la, lo = tracks["ECMWF"][0]
    assert (t.year, t.hour, la, lo) == (2018, 0, 21.0, 140.25)
    # negative longitudes wrap into [0, 360)
    assert abs(tracks["ECMWF"][1][2] - 139.5) < 1e-6


def test_push_forward_year_progress_calendar_walk():
    """Property test (ROADMAP item 7): the push-forward year-progress
    chunk advance must equal the reference's calendar walk, which adds
    pd.Timedelta(hours=6) to the YYYYMMDDHH int once per chunk
    (train_AR.py:934-939) and converts via compute_year_progress
    (embeddings.py:442-447). Exercised across month/year boundaries and
    the leap-year length change."""
    import pandas as pd

    from ladcast_tpu.data import time_utils

    def reference_walk(ts_int, n_chunks):
        # transcription of the reference loop: timestamps[i] updated
        # in place by +6h per push_forward_step >= 1, then
        # compute_year_progress(datetime)
        out = []
        ts = ts_int
        for _ in range(n_chunks):
            dt = pd.Timestamp(time_utils.int_to_datetime(ts))
            year_start = pd.Timestamp(dt.year, 1, 1)
            year_end = pd.Timestamp(dt.year + 1, 1, 1)
            out.append((dt - year_start).total_seconds()
                       / (year_end - year_start).total_seconds())
            ts = int((dt + pd.Timedelta(hours=6)).strftime("%Y%m%d%H"))
        return np.asarray(out, np.float32)

    boundary_inits = [
        2016022818,  # leap-year Feb 28 -> 29
        2015022818,  # non-leap Feb 28 -> Mar 1
        2018123118,  # year boundary (progress resets, denominator changes)
        2016123118,  # leap -> non-leap year boundary
        2018013118,  # month boundary
        2018063018,  # mid-year month boundary
        2000022818,  # century leap year
    ]
    for ts in boundary_inits:
        for n in (1, 2, 4, 8):
            ref = reference_walk(ts, n)
            ours = np.asarray(
                [time_utils.year_progress(time_utils.int_to_datetime(
                    time_utils.add_hours_int(ts, 6 * k)))
                 for k in range(n)], np.float32)
            np.testing.assert_allclose(ours, ref, atol=1e-7, err_msg=str(ts))
    # rollout_year_progress (inference advance: step * hours_per_rep)
    rp = time_utils.rollout_year_progress(2018123118, 4, 24)
    manual = [time_utils.year_progress(time_utils.int_to_datetime(
        time_utils.add_hours_int(2018123118, 24 * i))) for i in range(4)]
    np.testing.assert_allclose(rp, np.asarray(manual, np.float32))
