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
