"""Sweep (block_q, block_k, heads_per_tile) of the fused attention kernel
at the bench's joint-attention shape (B=20 members, S=2250, H=12, D=128).

The kernel is ~18 ms/site inside the 64 s bench while its pure matmul
compute is ~3 ms -- this sweep hunts the remaining overhead. Timings
amortize the ~27 ms axon dispatch overhead by issuing N async calls and
syncing once on a fetched scalar.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.ops.pallas import flash_attention as fa

B, S, H, D = 20, 2250, 12, 128
N_ITERS = 30


def make_inputs(dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, H, D), dtype) * 0.3
    k = jnp.asarray(rng.randn(B, S, H, D), dtype) * 0.3
    v = jnp.asarray(rng.randn(B, S, H, D), dtype)
    cos = jnp.asarray(rng.rand(S, D), jnp.float32)
    sin = jnp.asarray(rng.rand(S, D), jnp.float32)
    w = jnp.asarray(rng.rand(S, D) + 0.5, jnp.float32)
    return q, k, v, cos, sin, w


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # compile+sync
    t0 = time.time()
    for _i in range(N_ITERS):
        out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / N_ITERS * 1e3
    print(f"{name:>46s}: {dt:7.2f} ms", flush=True)
    return dt


def main():
    q, k, v, cos, sin, w = make_inputs()

    def fused(bq, bk, hpt):
        def f(q, k, v):
            return fa._fused_impl(q, k, v, cos, sin, w, cos, sin, w,
                                  1e-7, block_q=bq, block_k=bk,
                                  heads_per_tile=hpt)
        return f

    timed("xla composite bf16", lambda q, k, v: fa._xla_composite(
        q, k, v, cos, sin, w, cos, sin, w, 1e-7), q, k, v)
    kp = jnp.pad(k.reshape(B, S, H * D), ((0, 0), (0, 54), (0, 0)))
    timed("preprocess pass alone",
          lambda x: fa._preprocess_packed(
              x, jnp.pad(cos, ((0, 54), (0, 0))),
              jnp.pad(sin, ((0, 54), (0, 0))),
              jnp.pad(w, ((0, 54), (0, 0))), D, 1e-7), kp)

    configs = [
        (256, 512, 3),    # current default
        (256, 2304, 3),   # single K block (no inner loop)
        (512, 2304, 3),
        (1152, 2304, 3),
        (2304, 2304, 3),  # one grid step per (b, head-group)
        (256, 512, 6),
        (256, 2304, 6),
        (1152, 2304, 6),
        (2304, 2304, 6),
        (256, 2304, 12),
        (1152, 2304, 12),
        (2304, 1152, 12),
        (2304, 2304, 12),
    ]
    for bq, bk, hpt in configs:
        try:
            timed(f"fused bq={bq} bk={bk} hpt={hpt}",
                  fused(bq, bk, hpt), q, k, v)
        except Exception as e:
            print(f"fused bq={bq} bk={bk} hpt={hpt}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
