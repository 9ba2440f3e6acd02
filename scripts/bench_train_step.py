"""AR train-step wall-clock at 375M / batch 4 on one TPU chip.

Round-1 baseline: 267 ms/step (PERFORMANCE.md); VERDICT item 8 target:
<200 ms with the Pallas flash-attention backward. Run from /root/repo.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import (
    EDMSchedulerConfig,
    NoiseSamplerConfig,
    ladcast_375m_config,
)
from ladcast_tpu.train.optim import make_optimizer
from ladcast_tpu.train.trainer_ar import ARTrainConfig, make_ar_train_step


def main():
    cfg = ladcast_375m_config()
    tcfg = ARTrainConfig(num_push_forward_steps=1, use_ema=True)
    opt = make_optimizer(num_training_steps=1000)
    init_fn, train_step = make_ar_train_step(
        cfg, EDMSchedulerConfig(), NoiseSamplerConfig(), tcfg, opt)

    B, T, Tin, H, W, C = 4, 4, 1, 15, 30, 84
    rng = np.random.RandomState(0)
    batch = (jnp.asarray(rng.randn(B, Tin, H, W, C), jnp.float32),
             jnp.asarray(rng.randn(B, T, H, W, C), jnp.float32),
             jnp.asarray(rng.rand(B, 1), jnp.float32))

    state = init_fn(jax.random.PRNGKey(0), batch)
    step = jax.jit(train_step)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    key, sub = jax.random.split(key)
    state, aux = step(state, batch, sub)
    print(f"compile+first step: {time.time() - t0:.1f}s "
          f"loss={float(aux['loss']):.4f}", flush=True)

    N = 20
    t0 = time.time()
    for _ in range(N):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
    _ = float(aux["loss"])  # sync
    dt = (time.time() - t0) / N
    print(f"train step: {dt * 1e3:.1f} ms/step (batch {B})", flush=True)


if __name__ == "__main__":
    main()
