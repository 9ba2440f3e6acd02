"""encode_latents CLI: ERA5 npz -> latent npz (reference
preprocecss/encode_data.py), incl. the --start_date/--end_date range
bounds and AR-trainer consumability of the output."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.mark.slow
def test_encode_latents_cli_with_date_range(tmp_path):
    from tests.test_cli_chain import TINY_DCAE_84

    from ladcast_tpu import static_data
    from ladcast_tpu.cli import encode_latents
    from ladcast_tpu.models import hub
    from ladcast_tpu.models.dcae import AutoencoderDC

    dcae = AutoencoderDC(TINY_DCAE_84)
    cp = dcae.init(jax.random.PRNGKey(0), jnp.zeros((1, 120, 240, 84)),
                   jnp.zeros((120, 240, 5)))
    dcae_dir = os.fspath(tmp_path / "dcae")
    hub.save_pretrained(dcae_dir, "dcae", TINY_DCAE_84, cp)

    fm, fs = static_data.era5_mean_std()
    rng = np.random.RandomState(0)
    ts = np.asarray([2018010100, 2018010106, 2018010112, 2018010118,
                     2018010200, 2018010206], np.int64)
    fields = (rng.randn(6, 120, 240, 84) * fs + fm).astype(np.float32)
    fields[:, :30, :30, 82] = np.nan  # SST land NaNs
    era5 = os.fspath(tmp_path / "era5.npz")
    np.savez(era5, fields=fields, timestamps=ts)

    out = os.fspath(tmp_path / "latents.npz")
    encode_latents.main([
        "--data", era5, "--dcae_params", dcae_dir, "--output", out,
        "--batch_size", "2",
        "--start_date", "2018-01-01T06", "--end_date", "2018-01-02"])
    d = np.load(out)
    np.testing.assert_array_equal(
        d["timestamps"], [2018010106, 2018010112, 2018010118, 2018010200])
    assert d["latents"].shape == (4, 15, 30, 84)
    assert np.isfinite(d["latents"]).all()

    # parity with a direct encode of one filtered frame
    from ladcast_tpu.data import transforms
    x = transforms.normalize(fields[1:2], fm, fs)
    x = np.where(np.isnan(x), -2.0, x).astype(np.float32)
    static = jnp.asarray(static_data.static_conditioning_tensor(layout="HWC"))
    z = dcae.apply(cp, jnp.asarray(x), static, method=AutoencoderDC.encode)
    np.testing.assert_allclose(d["latents"][0], np.asarray(z)[0],
                               rtol=2e-5, atol=1e-4)


def test_empty_date_range_is_a_clear_error(tmp_path):
    """A range matching zero timestamps exits with a message instead of
    an opaque np.concatenate crash."""
    from ladcast_tpu.cli import encode_latents

    src = tmp_path / "era5.npz"
    np.savez(src,
             fields=np.zeros((2, 120, 240, 84), np.float32),
             timestamps=np.asarray([2018010100, 2018010106], np.int64))
    with pytest.raises(SystemExit, match="no timestamps in range"):
        encode_latents.main([
            "--data", os.fspath(src), "--dcae_params", "unused",
            "--output", os.fspath(tmp_path / "out.npz"),
            "--start_date", "2019-01-01", "--end_date", "2019-12-31"])
