"""DCAE reconstruction train-step wall-clock at batch 4 on one TPU chip.

Round-1 baseline: 479 ms/step (PERFORMANCE.md, fp32-promoted matmuls).
Run from /root/repo.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.train.optim import make_optimizer
from ladcast_tpu.train.trainer_dcae import DCAETrainConfig, make_dcae_train_step


def main():
    cfg = DCAEConfig()
    tcfg = DCAETrainConfig(use_ema=True)
    opt = make_optimizer(num_training_steps=1000)
    init_fn, train_step, _ = make_dcae_train_step(cfg, tcfg, opt)

    B, H, W, C = 4, 120, 240, 84
    rng = np.random.RandomState(0)
    batch = (jnp.asarray(rng.randn(B, H, W, C), jnp.float32),
             jnp.asarray(rng.rand(B, H, W) < 0.3),
             jnp.asarray(rng.randn(H, W, 5), jnp.float32))

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
    print(f"DCAE train step: {dt * 1e3:.1f} ms/step (batch {B})", flush=True)


if __name__ == "__main__":
    main()
