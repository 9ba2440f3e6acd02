"""End-to-end forecast pipeline on tiny models (CPU): encode -> AR
ensemble rollout -> decode, plus the host-stepped engine equivalence and
the on-device scorer."""

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import EDMSchedulerConfig, RolloutConfig
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from ladcast_tpu.rollout.engine import (
    ensemble_rollout,
    ensemble_rollout_hostloop,
    make_repetition_fn,
)
from tests.test_dit import TINY

SCHED = EDMSchedulerConfig()
H, W, C = 4, 6, 6


def _net(params, model):
    def net_fn(lat, cn, cond, yp):
        return model.apply(params, lat, cn, cond, yp)
    return net_fn


def test_hostloop_matches_scanned_engine():
    rcfg = RolloutConfig(ensemble_size=3, num_inference_steps=3,
                         return_seq_len=2, input_seq_len=1,
                         total_lead_time_hour=24, step_size_hour=6)
    model = LaDCastTransformer3D(TINY)
    lat = jnp.zeros((1, rcfg.return_seq_len, H, W, C))
    cond = jnp.zeros((1, 1, H, W, C))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), cond,
                        jnp.zeros((1,)))
    net_fn = _net(params, model)

    known = jax.random.normal(jax.random.PRNGKey(1), (3, 1, H, W, C)) * 0.5
    yp = np.linspace(0.3, 0.33, rcfg.num_repetitions).astype(np.float32)
    key = jax.random.PRNGKey(9)

    scanned = ensemble_rollout(net_fn, known, jnp.asarray(yp), key, SCHED,
                               rcfg)

    rep_fn = jax.jit(make_repetition_fn(SCHED, rcfg), static_argnums=0)

    def pnet(p, lat, cn, cond, ypp):
        return model.apply(p, lat, cn, cond, ypp)

    stepped = ensemble_rollout_hostloop(
        lambda p, k, y, kk: rep_fn(pnet, p, k, y, kk),
        params, known, yp, key, rcfg)

    np.testing.assert_allclose(np.asarray(scanned), np.asarray(stepped),
                               rtol=2e-4, atol=2e-4)


def test_forecast_pipeline_tiny(monkeypatch):
    """Full ForecastPipeline with tiny models; normalization constants
    monkeypatched to tiny channel counts."""
    from ladcast_tpu.rollout import pipeline as pl_mod
    from tests.test_dcae import TINY as TINY_DCAE

    C_dyn = 8
    monkeypatch.setattr(pl_mod.static_data, "latent_mean_std",
                        lambda: (np.zeros(6, np.float32),
                                 np.ones(6, np.float32)))
    monkeypatch.setattr(pl_mod.static_data, "era5_mean_std",
                        lambda: (np.zeros(C_dyn, np.float32),
                                 np.ones(C_dyn, np.float32)))
    monkeypatch.setattr(
        pl_mod.static_data, "static_conditioning_tensor",
        lambda layout="HWC": np.zeros((16, 32, 1), np.float32))

    import dataclasses

    from ladcast_tpu.models.dcae import AutoencoderDC

    # tiny DCAE with 6 latent channels to match the tiny DiT (C=6);
    # widths chosen so all shortcut group sizes stay integral
    dcae_cfg = dataclasses.replace(
        TINY_DCAE, latent_channels=6,
        encoder_block_out_channels=(6, 12, 24, 48),
        decoder_block_out_channels=(6, 12, 24, 48))
    rcfg = RolloutConfig(ensemble_size=2, num_inference_steps=2,
                         return_seq_len=2, input_seq_len=1,
                         total_lead_time_hour=12, step_size_hour=6)

    dcae = AutoencoderDC(dcae_cfg)
    fields = jnp.asarray(
        np.random.RandomState(0).randn(1, 16, 32, C_dyn), jnp.float32)
    static = jnp.zeros((16, 32, 1))
    dcae_params = dcae.init(jax.random.PRNGKey(0), fields, static)

    dit = LaDCastTransformer3D(TINY)
    dit_params = dit.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 2, 2, 4, 6)), jnp.zeros((1,)),
                          jnp.zeros((1, 1, 2, 4, 6)), jnp.zeros((1,)))

    pipe = pl_mod.ForecastPipeline(TINY, dcae_cfg, SCHED, rcfg,
                                   dit_params, dcae_params,
                                   compute_dtype="float32")
    traj, decoded, z_analysis = pipe.forecast_from_fields(
        fields, 2018070100, jax.random.PRNGKey(2))
    assert traj.shape == (2, 2, 2, 4, 6)
    assert z_analysis.shape == (1, 2, 4, 6)
    assert decoded.shape == (2, 2, 16, 32, C_dyn)
    assert np.isfinite(np.asarray(decoded)).all()
