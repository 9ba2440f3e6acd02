"""Trainer smoke tests: loss decreases, EMA tracks, push-forward path,
DCAE reconstruction step, checkpoint roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import (
    DCAEConfig,
    EDMSchedulerConfig,
    NoiseSamplerConfig,
)
from ladcast_tpu.train import ema as ema_lib
from ladcast_tpu.train.optim import cosine_with_min_lr, make_optimizer
from ladcast_tpu.train.trainer_ar import ARTrainConfig, make_ar_train_step
from ladcast_tpu.train.trainer_dcae import DCAETrainConfig, make_dcae_train_step
from tests.test_dcae import TINY as TINY_DCAE
from tests.test_dit import TINY as TINY_DIT


def test_ema_decay_schedule():
    # diffusers EMAModel formula: zero during warmup, then rising to max.
    assert float(ema_lib.ema_decay(jnp.asarray(500),
                                   update_after_step=1000)) == 0.0
    d5k = float(ema_lib.ema_decay(jnp.asarray(5000), update_after_step=1000))
    d50k = float(ema_lib.ema_decay(jnp.asarray(50000), update_after_step=1000))
    assert 0.0 < d5k < d50k <= 0.9999
    # closed form at step s: 1 - (1 + (s-1001))^(-2/3)
    want = 1 - (1 + (5000 - 1001)) ** (-2.0 / 3.0)
    np.testing.assert_allclose(d5k, want, rtol=1e-6)


def test_cosine_min_lr_schedule():
    f = cosine_with_min_lr(1e-4, 1e-6, 10, 100)
    assert abs(float(f(0))) < 1e-12
    np.testing.assert_allclose(float(f(10)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(f(100)), 1e-6, rtol=1e-4)
    np.testing.assert_allclose(float(f(1000)), 1e-6, rtol=1e-4)  # floor


def _ar_setup(n_pf=1):
    tcfg = ARTrainConfig(num_push_forward_steps=n_pf,
                         lat_weighted_loss=True, compute_dtype="float32",
                         ema_update_after_step=0)
    opt = make_optimizer(lr=1e-3, num_warmup_steps=0, num_training_steps=50)
    init_fn, train_step = make_ar_train_step(
        TINY_DIT, EDMSchedulerConfig(), NoiseSamplerConfig(), tcfg, opt)
    rng = np.random.RandomState(0)
    B, T, Tin, H, W, C = 4, 4, 1, 4, 6, 6
    batch = (jnp.asarray(rng.randn(B, Tin, H, W, C), jnp.float32),
             jnp.asarray(rng.randn(B, T, H, W, C), jnp.float32),
             jnp.asarray(rng.rand(B, n_pf), jnp.float32))
    state = init_fn(jax.random.PRNGKey(0), batch)
    return train_step, state, batch


def test_ar_train_step_loss_decreases():
    train_step, state, batch = _ar_setup()
    step = jax.jit(train_step)
    losses = []
    for i in range(8):
        state, aux = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    # same-batch training must reduce loss on average
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert int(state.step) == 8
    assert state.ema is not None


def test_ar_push_forward_runs():
    train_step, state, batch = _ar_setup(n_pf=2)
    state, aux = jax.jit(train_step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))


def test_dcae_train_step():
    tcfg = DCAETrainConfig(compute_dtype="float32", subbatch_steps=2,
                           ema_update_after_step=0)
    opt = make_optimizer(lr=1e-3, num_warmup_steps=0, num_training_steps=50)
    init_fn, train_step, eval_step = make_dcae_train_step(
        TINY_DCAE, tcfg, opt, grid_lat=16)
    rng = np.random.RandomState(0)
    B, H, W = 2, 16, 32
    fields = rng.randn(B, H, W, 8).astype(np.float32)
    nan_mask = rng.rand(B, H, W) > 0.8
    statics = rng.randn(H, W, 1).astype(np.float32)
    # our tiny config: C=8 fields + 1 static; pick SST channel inside range
    tcfg2 = DCAETrainConfig(compute_dtype="float32", subbatch_steps=2,
                            sst_channel=5, ema_update_after_step=0)
    init_fn, train_step, eval_step = make_dcae_train_step(
        TINY_DCAE, tcfg2, opt, grid_lat=16)
    batch = (jnp.asarray(fields), jnp.asarray(nan_mask), jnp.asarray(statics))
    state = init_fn(jax.random.PRNGKey(0), batch)
    step = jax.jit(train_step)
    losses = []
    for i in range(6):
        state, aux = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
    ev = eval_step(state.params, batch)
    assert np.isfinite(float(ev["loss"]))
    assert ev["loss_per_var"].shape[0] > 0


def test_checkpoint_roundtrip(tmp_path):
    from ladcast_tpu.train import checkpoint as ckpt

    train_step, state, batch = _ar_setup()
    mgr = ckpt.make_manager(os.fspath(tmp_path / "ckpts"), max_to_keep=2)
    ckpt.save_state(mgr, 0, state, wait=True)
    restored = ckpt.restore_state(mgr, state)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
