"""Trainer convergence: overfitting a tiny synthetic set must drive the
loss down by a large factor (VERDICT item 9 -- catches sign/weighting bugs
that no single-step finiteness test can: a flipped EDM weighting, a wrong
precondition_outputs sign, or a mis-masked loss all leave single steps
finite but destroy convergence)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladcast_tpu.config import (
    EDMSchedulerConfig,
    LaDCastDiTConfig,
    NoiseSamplerConfig,
)
from ladcast_tpu.train.optim import make_optimizer


def _smooth_fields(rng, shape):
    """Low-frequency random fields (compressible, so an AE can overfit)."""
    B, H, W, C = shape
    y = np.linspace(0, 2 * np.pi, H)[None, :, None, None]
    x = np.linspace(0, 2 * np.pi, W)[None, None, :, None]
    out = np.zeros(shape, np.float32)
    for kx in range(2):
        for ky in range(2):
            amp = rng.randn(B, 1, 1, C).astype(np.float32)
            out += amp * np.sin((ky + 1) * y + kx) * np.cos((kx + 1) * x)
    return out


@pytest.mark.slow
def test_dcae_trainer_overfits_tiny_batch():
    from ladcast_tpu.train.trainer_dcae import (
        DCAETrainConfig, make_dcae_train_step)
    from tests.test_dcae import TINY

    cfg = dataclasses.replace(TINY)
    tcfg = DCAETrainConfig(lat_weighted_loss=True, subbatch_steps=1,
                           use_ema=False, sst_channel=5,
                           compute_dtype="float32")
    opt = make_optimizer(lr=1e-2, num_warmup_steps=0,
                         num_training_steps=1000, weight_decay=0.0)
    init_fn, train_step, _ = make_dcae_train_step(cfg, tcfg, grid_lat=16,
                                                  optimizer=opt)

    rng = np.random.RandomState(0)
    fields = jnp.asarray(_smooth_fields(rng, (4, 16, 32, 8)))
    nan_mask = jnp.zeros((4, 16, 32), bool)
    statics = jnp.asarray(_smooth_fields(rng, (1, 16, 32, 1))[0])
    batch = (fields, nan_mask, statics)

    state = init_fn(jax.random.PRNGKey(0), batch)
    step = jax.jit(train_step)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(320):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
        losses.append(float(aux["loss"]))

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < 0.5 * first, (first, last)
    assert last < 0.6, (first, last)  # relative L2 well below "predict 0"


@pytest.mark.slow
def test_ar_trainer_overfits_tiny_batch():
    from ladcast_tpu.train.trainer_ar import ARTrainConfig, make_ar_train_step

    tiny = LaDCastDiTConfig(
        in_channels=4, out_channels=4,
        num_attention_heads=2, attention_head_dim=16,
        num_layers=1, num_single_layers=1, num_refiner_layers=1,
        mlp_ratio=2.0, rope_axes_dim=(4, 6, 6),
        conditioning_tensor_rope_axes_dim=(4, 6, 6),
        conditioning_tensor_in_channels=4, attention_impl="xla")
    tcfg = ARTrainConfig(num_push_forward_steps=1, use_ema=False,
                         compute_dtype="float32")
    opt = make_optimizer(lr=5e-3, num_warmup_steps=0,
                         num_training_steps=2000, weight_decay=0.0)
    init_fn, train_step = make_ar_train_step(
        tiny, EDMSchedulerConfig(), NoiseSamplerConfig(), tcfg, opt)

    # deterministic cond -> target relationship the model can memorize
    rng = np.random.RandomState(0)
    cond = rng.randn(8, 1, 4, 6, 4).astype(np.float32) * 0.5
    clean = np.repeat(cond, 2, axis=1)  # target = cond repeated over T
    yp = rng.rand(8, 1).astype(np.float32)
    batch = (jnp.asarray(cond), jnp.asarray(clean), jnp.asarray(yp))

    state = init_fn(jax.random.PRNGKey(0), batch)
    step = jax.jit(train_step)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(350):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
        losses.append(float(aux["loss"]))

    # EDM loss is noisy step-to-step (random sigma draw); compare windows
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert np.isfinite(losses).all()
    assert last < 0.2 * first, (first, last)
