"""Execute the ACTUAL ``scripts/acceptance_2018.sh`` end-to-end on
synthetic fixtures (VERDICT round-3 weak #4: every component was tested
but the bash glue itself had never run).

Covers, at smoke scale (env knobs; defaults in the script remain the
reference protocol of its README.md:124-149):
  * the zarr climatology branch: a synthetic WB2-layout store opened
    through the stub ``xarray`` fixture, converted by the real
    ``cli.convert_wb2_climatology`` main with ``--allow_partial_doy``;
  * hub-layout checkpoint ingestion -> ``cli.pred_rollout`` ->
    ``cli.evaluate_ens`` argument plumbing exactly as the script spells
    it;
  * ``cli.compare_baseline`` verdict plumbing: with random tiny weights
    the day-1 points MUST score (lead 24 h) and fail, the verdict json
    and curves png must be written, and the script must exit nonzero.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ladcast_tpu import channels as ch  # noqa: E402
from ladcast_tpu import static_data  # noqa: E402
from ladcast_tpu.models import hub  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STUB_XR = os.path.join(REPO, "tests", "fixtures", "stub_xarray")


def _write_fake_wb2_store(store, n_doy=2):
    """Synthetic WB2-layout climatology readable by the stub xarray:
    121 north->south lats (incl. the -90 pole row the converter crops),
    240 lons, 8 on-disk hours, the canonical 13 levels."""
    os.makedirs(store)
    rng = np.random.RandomState(7)
    lat = np.linspace(90.0, -90.0, 121)
    lon = np.arange(240, dtype=np.float64) * 1.5
    hours = np.arange(0, 24, 3)
    levels = np.asarray(ch.PRESSURE_LEVELS, np.int64)
    meta = {
        "dayofyear": ["dayofyear"], "hour": ["hour"],
        "latitude": ["latitude"], "longitude": ["longitude"],
        "level": ["level"],
    }
    np.save(os.path.join(store, "dayofyear.npy"), np.arange(1, n_doy + 1))
    np.save(os.path.join(store, "hour.npy"), hours)
    np.save(os.path.join(store, "latitude.npy"), lat)
    np.save(os.path.join(store, "longitude.npy"), lon)
    np.save(os.path.join(store, "level.npy"), levels)
    fm, _ = static_data.era5_mean_std()  # (84,) channel means
    for var in ch.ATM_VARIABLES:
        meta[var] = ["dayofyear", "hour", "level", "latitude", "longitude"]
        v = np.empty((n_doy, 8, len(levels), 121, 240), np.float32)
        for li, lev in enumerate(ch.PRESSURE_LEVELS):
            # physical-scale climatology: channel mean + small noise
            base = float(fm[ch.channel_index(var, lev)])
            v[:, :, li] = base + rng.randn(n_doy, 8, 121, 240) * 0.01
        np.save(os.path.join(store, var + ".npy"), v)
    for var in ch.SURFACE_VARIABLES:
        meta[var] = ["dayofyear", "hour", "latitude", "longitude"]
        base = float(fm[ch.channel_index(var, None)])
        v = (base + rng.randn(n_doy, 8, 121, 240) * 0.01).astype(np.float32)
        np.save(os.path.join(store, var + ".npy"), v)
    with open(os.path.join(store, "meta.json"), "w") as f:
        json.dump(meta, f)


@pytest.mark.slow
def test_acceptance_script_end_to_end(tmp_path):
    from tests.test_cli_chain import TINY_DCAE_84, TINY_DIT_84
    from ladcast_tpu.models.dcae import AutoencoderDC
    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D

    dit = LaDCastTransformer3D(TINY_DIT_84)
    dp = dit.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 15, 30, 84)),
                  jnp.zeros((1,)), jnp.zeros((1, 1, 15, 30, 84)),
                  jnp.zeros((1,)))
    dcae = AutoencoderDC(TINY_DCAE_84)
    cp = dcae.init(jax.random.PRNGKey(0), jnp.zeros((1, 120, 240, 84)),
                   jnp.zeros((120, 240, 5)))
    dit_dir, dcae_dir = str(tmp_path / "dit"), str(tmp_path / "dcae")
    hub.save_pretrained(dit_dir, "dit", TINY_DIT_84, dp)
    hub.save_pretrained(dcae_dir, "dcae", TINY_DCAE_84, cp)

    # synthetic "2018": Jan 1 00z .. Jan 2 00z, enough truth for a
    # 24 h lead from the 2018010100 init
    fm, fs = static_data.era5_mean_std()
    rng = np.random.RandomState(0)
    ts = np.asarray([2018010100, 2018010106, 2018010112, 2018010118,
                     2018010200], np.int64)
    fields = (rng.randn(5, 120, 240, 84) * fs + fm).astype(np.float32)
    fields[:, :40, :40, 82] = np.nan  # SST land NaNs
    era5 = str(tmp_path / "era5.npz")
    np.savez(era5, fields=fields, timestamps=ts)

    store = str(tmp_path / "clim.zarr")
    _write_fake_wb2_store(store)

    out = str(tmp_path / "out")
    os.makedirs(out)
    env = dict(os.environ)
    env["PYTHONPATH"] = STUB_XR + os.pathsep + REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no 8-device mesh needed in the children
    env.update(ACC2018_SAMPLES_PER_MONTH="1", ACC2018_ENS="2",
               ACC2018_STEPS="2", ACC2018_RETURN_SEQ="2",
               ACC2018_LEAD_H="24",
               ACC2018_CONVERT_ARGS="--allow_partial_doy")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "acceptance_2018.sh"),
         dit_dir, dcae_dir, era5, store, out],
        env=env, capture_output=True, text=True, timeout=3000)
    sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])

    # random weights cannot beat the published curves: the script must
    # run every stage, then exit nonzero from the verdict
    assert proc.returncode != 0
    assert "Verdict:" in proc.stdout

    # zarr branch artifacts
    clim = np.load(os.path.join(out, "climatology.npz"))["clim"]
    assert clim.shape == (2, 4, 120, 240, 84)
    # rollout + scorer artifacts
    assert os.path.exists(os.path.join(out, "latents",
                                       "latent_2018010100.npy"))
    mse = np.load(os.path.join(out, "scores", "ens_mean_mse.npy"))
    assert mse.shape[1:] == (84, 4)  # 4 lead frames (6..24 h)
    # verdict plumbing: day-1 points were scored (not "not_scored")
    # and failed; json + plot written despite the nonzero exit
    with open(os.path.join(out, "scores", "baseline_verdict.json")) as f:
        verdict = json.load(f)
    assert verdict["num_scored"] == 12  # every variable's day-1 point
    assert not verdict["all_pass"]
    day1 = verdict["verdicts"]["geopotential@500"]["day1"]
    assert day1["status"] == "FAIL" and day1["ours"] > 0
    assert os.path.exists(os.path.join(out, "scores",
                                       "curves_vs_baseline.png"))
