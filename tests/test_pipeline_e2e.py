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


def _tiny_pipeline_fixture(monkeypatch, ensemble_size=2):
    """Tiny DCAE+DiT configs/params + monkeypatched normalization
    constants for ForecastPipeline tests. Returns (pl_mod, args, fields)
    where args are the ForecastPipeline positional args."""
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
    rcfg = RolloutConfig(ensemble_size=ensemble_size, num_inference_steps=2,
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
    return pl_mod, (TINY, dcae_cfg, SCHED, rcfg, dit_params, dcae_params), \
        fields


def test_forecast_pipeline_tiny(monkeypatch):
    """Full ForecastPipeline with tiny models; normalization constants
    monkeypatched to tiny channel counts."""
    pl_mod, args, fields = _tiny_pipeline_fixture(monkeypatch)

    pipe = pl_mod.ForecastPipeline(*args, compute_dtype="float32")
    traj, decoded, z_analysis = pipe.forecast_from_fields(
        fields, 2018070100, jax.random.PRNGKey(2))
    assert traj.shape == (2, 2, 2, 4, 6)
    assert z_analysis.shape == (1, 2, 4, 6)
    assert decoded.shape == (2, 2, 16, 32, 8)
    assert np.isfinite(np.asarray(decoded)).all()


def test_forecast_pipeline_ens_mesh_matches_single_device(monkeypatch):
    """ForecastPipeline(ens_mesh=...) shards members/decode frames over
    the 8-device mesh and reproduces the unsharded results up to fp32
    reassociation (the member PRNG is index-folded so the random draws
    are identical; GSPMD partitioning changes XLA fusion/reduction
    order, so ~1e-4 relative drift over a 2-step AR chain is expected)."""
    from jax.sharding import PartitionSpec as P

    from ladcast_tpu.parallel.mesh import make_mesh

    pl_mod, args, fields = _tiny_pipeline_fixture(monkeypatch,
                                                  ensemble_size=8)
    ref_pipe = pl_mod.ForecastPipeline(*args, compute_dtype="float32")
    ref_traj, ref_dec, ref_z = ref_pipe.forecast_from_fields(
        fields, 2018070100, jax.random.PRNGKey(2))

    pipe = pl_mod.ForecastPipeline(*args, compute_dtype="float32",
                                   ens_mesh=make_mesh("ens"))
    traj, decoded, z = pipe.forecast_from_fields(
        fields, 2018070100, jax.random.PRNGKey(2))
    assert traj.sharding.spec == P("ens")
    assert decoded.sharding.spec == P("ens")
    np.testing.assert_allclose(np.asarray(traj), np.asarray(ref_traj),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(ref_dec),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(ref_z))


def test_forecast_pipeline_ens_mesh_uneven(monkeypatch):
    """Ensemble size not divisible by the mesh (20-member protocol on 8
    chips): the pipeline pads the member axis to a mesh multiple and
    slices the extras off; results still match the unsharded run."""
    pl_mod, args, fields = _tiny_pipeline_fixture(monkeypatch,
                                                  ensemble_size=3)
    from ladcast_tpu.parallel.mesh import make_mesh

    ref = pl_mod.ForecastPipeline(*args, compute_dtype="float32")
    r_traj, r_dec, _ = ref.forecast_from_fields(
        fields, 2018070100, jax.random.PRNGKey(2))
    pipe = pl_mod.ForecastPipeline(*args, compute_dtype="float32",
                                   ens_mesh=make_mesh("ens"))
    traj, dec, _ = pipe.forecast_from_fields(
        fields, 2018070100, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(traj), np.asarray(r_traj),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(r_dec),
                               rtol=2e-4, atol=2e-4)


def test_forecast_pipeline_host_step_matches_scanned(monkeypatch):
    """ForecastPipeline(host_step=True) reproduces the scanned pipeline
    (same key split -> same perturbation + per-repetition PRNG streams;
    only program boundaries differ, so tolerance covers XLA fusion/
    reduction-order drift). Covers noise_level > 0: the host-stepped
    path applies the initial-latent perturbation eagerly with the SAME
    pert_key the scanned engine uses inside jit."""
    import dataclasses

    pl_mod, args, fields = _tiny_pipeline_fixture(monkeypatch,
                                                  ensemble_size=3)
    for noise_level in (0.0, 0.5):
        a = list(args)
        a[3] = dataclasses.replace(a[3], noise_level=noise_level)
        ref = pl_mod.ForecastPipeline(*a, compute_dtype="float32")
        r_traj, r_dec, r_z = ref.forecast_from_fields(
            fields, 2018070100, jax.random.PRNGKey(2))
        pipe = pl_mod.ForecastPipeline(*a, compute_dtype="float32",
                                       host_step=True)
        traj, dec, z = pipe.forecast_from_fields(
            fields, 2018070100, jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(traj), np.asarray(r_traj),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(r_dec),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(r_z))


def test_forecast_pipeline_host_step_ens_mesh(monkeypatch):
    """host_step composes with ens_mesh: members sharded over the
    8-device mesh through the per-repetition programs (the pred_rollout
    --shard_ensemble --host_step deployment), matching unsharded.
    Ensemble 3 on 8 devices also exercises the member-padding path."""
    from ladcast_tpu.parallel.mesh import make_mesh

    pl_mod, args, fields = _tiny_pipeline_fixture(monkeypatch,
                                                  ensemble_size=3)
    ref = pl_mod.ForecastPipeline(*args, compute_dtype="float32")
    r_traj, r_dec, _ = ref.forecast_from_fields(
        fields, 2018070100, jax.random.PRNGKey(2))
    pipe = pl_mod.ForecastPipeline(*args, compute_dtype="float32",
                                   ens_mesh=make_mesh("ens"),
                                   host_step=True)
    traj, dec, _ = pipe.forecast_from_fields(
        fields, 2018070100, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(traj), np.asarray(r_traj),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(r_dec),
                               rtol=2e-4, atol=2e-4)
