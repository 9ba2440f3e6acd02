"""Ensemble rollout engine tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ladcast_tpu.config import EDMSchedulerConfig, RolloutConfig
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from ladcast_tpu.parallel.mesh import make_mesh
from ladcast_tpu.rollout.engine import ensemble_rollout, member_noise
from tests.test_dit import TINY

SCHED = EDMSchedulerConfig()
RCFG = RolloutConfig(ensemble_size=8, num_inference_steps=4,
                     return_seq_len=2, input_seq_len=1,
                     total_lead_time_hour=24, step_size_hour=6)
H, W, C = 4, 6, 6


def _setup():
    model = LaDCastTransformer3D(TINY)
    lat = jnp.zeros((1, RCFG.return_seq_len, H, W, C))
    cond = jnp.zeros((1, RCFG.input_seq_len, H, W, C))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), cond,
                        jnp.zeros((1,)))

    def net_fn(latents, c_noise, cond, yp):
        return model.apply(params, latents, c_noise, cond, yp)

    return net_fn


def test_rollout_shapes_and_determinism():
    net_fn = _setup()
    E = RCFG.ensemble_size
    known = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, 1, H, W, C)),
        (E, 1, H, W, C))
    yp = jnp.linspace(0.2, 0.25, RCFG.num_repetitions)
    key = jax.random.PRNGKey(7)

    traj = ensemble_rollout(net_fn, known, yp, key, SCHED, RCFG)
    assert traj.shape == (E, RCFG.total_num_steps, H, W, C)
    assert np.isfinite(np.asarray(traj)).all()

    traj2 = ensemble_rollout(net_fn, known, yp, key, SCHED, RCFG)
    np.testing.assert_array_equal(np.asarray(traj), np.asarray(traj2))

    # Members differ from each other (independent noise streams).
    assert not np.allclose(np.asarray(traj[0]), np.asarray(traj[1]))


def test_member_noise_index_stability():
    """Member i's noise must not depend on the ensemble size (the
    reference's seed-by-member contract, pipelines/utils.py:703-705)."""
    key = jax.random.PRNGKey(3)
    small = np.asarray(member_noise(key, 4, (2, 3)))
    large = np.asarray(member_noise(key, 8, (2, 3)))
    np.testing.assert_array_equal(small, large[:4])


def test_rollout_sharded_over_mesh():
    net_fn = _setup()
    mesh = make_mesh("ens")
    assert len(mesh.devices.ravel()) == 8
    E = 8
    known = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, 1, H, W, C)),
        (E, 1, H, W, C))
    yp = jnp.linspace(0.2, 0.25, RCFG.num_repetitions)

    ens_sh = NamedSharding(mesh, P("ens"))
    repl = NamedSharding(mesh, P())
    known = jax.device_put(known, ens_sh)

    fn = jax.jit(lambda k, y, kk: ensemble_rollout(net_fn, k, y, kk, SCHED,
                                                   RCFG),
                 in_shardings=(ens_sh, repl, repl),
                 out_shardings=ens_sh)
    traj = fn(known, yp, jax.device_put(jax.random.PRNGKey(7), repl))
    assert traj.sharding.spec == P("ens")

    # Sharded result == unsharded result.
    ref = ensemble_rollout(net_fn, jax.device_put(known, repl), yp,
                           jax.random.PRNGKey(7), SCHED, RCFG)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dpm_sampler_rollout():
    net_fn = _setup()
    cfg = RolloutConfig(ensemble_size=2, num_inference_steps=4,
                        return_seq_len=2, input_seq_len=1,
                        total_lead_time_hour=12, step_size_hour=6,
                        sampler_type="dpm")
    known = jax.random.normal(jax.random.PRNGKey(1), (2, 1, H, W, C))
    yp = jnp.asarray([0.5])
    traj = ensemble_rollout(net_fn, known, yp, jax.random.PRNGKey(0), SCHED,
                            cfg)
    assert traj.shape == (2, 2, H, W, C)
    assert np.isfinite(np.asarray(traj)).all()
