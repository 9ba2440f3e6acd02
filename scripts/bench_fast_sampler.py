"""North-star workload with the opt-in correction-skip sampler
(RolloutConfig.correction_skip_period) vs the exact path.

Approximate acceleration -- see ladcast_tpu/diffusion/samplers.py
docstring. Prints wall-clock and the latent-trajectory deviation from
the exact sampler so the speed/accuracy trade is visible in one run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import (
    DCAEConfig,
    EDMSchedulerConfig,
    RolloutConfig,
    ladcast_375m_config,
)
from ladcast_tpu.models.dcae import AutoencoderDC
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from ladcast_tpu.rollout.engine import make_repetition_fn
from ladcast_tpu.rollout.pipeline import cast_pytree


def main():
    cdt = jnp.bfloat16
    dit_cfg = ladcast_375m_config()
    sched_cfg = EDMSchedulerConfig()
    dit = LaDCastTransformer3D(dit_cfg)
    dcae = AutoencoderDC(DCAEConfig())

    T_in, H, W, C = 1, 15, 30, 84
    fields = jax.random.normal(jax.random.PRNGKey(0), (T_in, 120, 240, C))
    static = jax.random.normal(jax.random.PRNGKey(1), (120, 240, 5))
    dcae_params = cast_pytree(
        jax.jit(dcae.init)(jax.random.PRNGKey(2), fields, static), cdt)
    dit_params = cast_pytree(jax.jit(dit.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 4, H, W, C)), jnp.zeros((1,)),
        jnp.zeros((1, T_in, H, W, C)), jnp.zeros((1,))), cdt)

    def net_fn(p, lat, cn, cond, yp):
        return dit.apply(p, lat.astype(cdt), cn, cond.astype(cdt),
                         yp).astype(jnp.float32)

    @jax.jit
    def encode(p, f, s):
        return dcae.apply(p, f.astype(cdt), s.astype(cdt),
                          method=AutoencoderDC.encode).astype(jnp.float32)

    z = encode(dcae_params, fields, static)
    yp = np.linspace(0.4, 0.45, 10)

    results = {}
    for period in (0, 2, 4):
        rcfg = RolloutConfig(ensemble_size=20,
                             correction_skip_period=period)
        rep_fn = make_repetition_fn(sched_cfg, rcfg)

        @jax.jit
        def rep(dit_p, known, y, kk):
            return rep_fn(net_fn, dit_p, known, y, kk)

        def forecast(key):
            known = jnp.broadcast_to(z[None], (20, T_in, H, W, C))
            keys = jax.random.split(key, rcfg.num_repetitions)
            outs = []
            for r in range(rcfg.num_repetitions):
                known, samples = rep(dit_params, known,
                                     jnp.asarray(yp[r]), keys[r])
                outs.append(samples)
            traj = jnp.concatenate(outs, axis=1)
            _ = float(traj.mean())  # sync
            return traj

        forecast(jax.random.PRNGKey(4))  # compile
        t0 = time.time()
        traj = forecast(jax.random.PRNGKey(5))
        dt = time.time() - t0
        results[period] = (dt, traj)
        if period == 0:
            print(f"exact sampler: {dt:.1f} s", flush=True)
        else:
            ref = results[0][1]
            dev = float(jnp.sqrt(jnp.mean((traj - ref) ** 2)))
            rstd = float(jnp.std(ref))
            print(f"skip period {period}: {dt:.1f} s "
                  f"(exact {results[0][0]:.1f} s), latent-traj RMS dev "
                  f"{dev:.4f} ({dev / rstd:.1%} of traj std)", flush=True)


if __name__ == "__main__":
    main()
