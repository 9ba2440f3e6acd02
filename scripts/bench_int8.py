"""A/B the opt-in int8 (w8a8) DiT matmul path (ops/quant.py) on hardware.

Measures, at the north-star bench shapes (375M DiT, B=20 members, 2250
joint tokens, bf16 params):

  1. single denoiser forward: bf16 vs int8 wall-clock (median of N);
  2. (--full) one host-stepped AR repetition (39 Heun calls + feedback):
     wall-clock A/B plus the int8-vs-exact latent RMS deviation, the same
     deviation metric PERFORMANCE.md records for correction_skip_period.

Usage: python scripts/bench_int8.py [--full] [--members 20] [--n 10]

Remote compiles on this backend are ~2-3 min per program; the default
mode compiles two programs (fp + int8 forward), --full adds two more.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=20)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--full", action="store_true",
                    help="also A/B one full AR repetition (39 net calls)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + shapes (CPU smoke test of the flow)")
    args = ap.parse_args()

    from ladcast_tpu.config import (EDMSchedulerConfig, RolloutConfig,
                                    ladcast_375m_config)
    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
    from ladcast_tpu.rollout.engine import make_repetition_fn
    from ladcast_tpu.rollout.pipeline import cast_pytree

    cdt = jnp.bfloat16
    B, T, T_in, H, W, C = args.members, 4, 1, 15, 30, 84
    cfg_kw = {}
    if args.tiny:
        B, H, W, C = 2, 4, 8, 6
        cfg_kw = dict(in_channels=6, out_channels=6, num_attention_heads=2,
                      attention_head_dim=16, num_layers=1,
                      num_single_layers=1, num_refiner_layers=1,
                      rope_axes_dim=(4, 6, 6),
                      conditioning_tensor_rope_axes_dim=(4, 6, 6),
                      conditioning_tensor_in_channels=6)

    dit_fp = LaDCastTransformer3D(ladcast_375m_config(**cfg_kw))
    dit_q = LaDCastTransformer3D(
        ladcast_375m_config(int8_matmuls=True, **cfg_kw))

    params = cast_pytree(jax.jit(dit_fp.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, H, W, C)), jnp.zeros((1,)),
        jnp.zeros((1, T_in, H, W, C)), jnp.zeros((1,))), cdt)

    lat = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, C), cdt)
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, T_in, H, W, C), cdt)
    cn = jnp.full((B,), 0.1, jnp.float32)
    yp = jnp.full((B,), 0.4, jnp.float32)

    def timed_forward(model, tag):
        fwd = jax.jit(lambda p, l, c, kn, y: model.apply(
            p, l, c, kn, y).astype(jnp.float32))
        out = fwd(params, lat, cn, cond, yp)
        _sync(out)  # compile + warm
        ts = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            _sync(fwd(params, lat, cn, cond, yp))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"forward[{tag}]: median {med*1e3:.1f} ms over {args.n} "
              f"(min {min(ts)*1e3:.1f})", flush=True)
        return out, med

    out_fp, t_fp = timed_forward(dit_fp, "bf16")
    out_q, t_q = timed_forward(dit_q, "int8")
    dev = float(jnp.linalg.norm(out_q - out_fp) / jnp.linalg.norm(out_fp))
    print(f"forward speedup: {t_fp / t_q:.2f}x; output rel deviation "
          f"{dev*100:.2f}% (random weights)", flush=True)

    if not args.full:
        return

    sched_cfg = EDMSchedulerConfig()
    rcfg = RolloutConfig(ensemble_size=B)
    rep_fn = make_repetition_fn(sched_cfg, rcfg)
    known = jax.random.normal(jax.random.PRNGKey(3), (B, T_in, H, W, C),
                              jnp.float32)
    kk = jax.random.PRNGKey(4)
    yps = jnp.asarray(0.4)

    results = {}
    for tag, model in (("bf16", dit_fp), ("int8", dit_q)):
        def net_fn(p, l, c, kn, y, _m=model):
            return _m.apply(p, l.astype(cdt), c, kn.astype(cdt),
                            y).astype(jnp.float32)

        rep = jax.jit(lambda p, k, y, kk_, _f=net_fn: rep_fn(_f, p, k, y, kk_))
        new_known, samples = rep(params, known, yps, kk)
        _sync(samples.mean())  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            nk, s = rep(params, known, yps, kk)
            _sync(s.mean())
            ts.append(time.perf_counter() - t0)
        results[tag] = (float(np.median(ts)), samples)
        print(f"repetition[{tag}]: median {results[tag][0]:.2f} s "
              f"(39 net calls, B={B})", flush=True)

    t_fp, s_fp = results["bf16"]
    t_q, s_q = results["int8"]
    rms = float(jnp.sqrt(jnp.mean((s_q - s_fp) ** 2)))
    std = float(jnp.std(s_fp))
    print(f"repetition speedup: {t_fp / t_q:.2f}x; latent-trajectory RMS "
          f"deviation {rms/std*100:.2f}% of traj std (random weights)",
          flush=True)


if __name__ == "__main__":
    main()
