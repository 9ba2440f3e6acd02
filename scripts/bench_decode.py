"""Micro-benchmark: DCAE decode of one 20-member lead-time chunk on TPU.

Round-1 baseline (padded-copy sphere conv): 0.263 s per call / 13 ms per
frame (PERFORMANCE.md). Run after kernel changes to track the decode lever.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.models.dcae import AutoencoderDC
from ladcast_tpu.rollout.pipeline import cast_pytree


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20,
                    help="frames per decode chunk (bench.py fuses 80 = "
                         "20 members x 4 frames per repetition)")
    args = ap.parse_args()
    B = args.batch

    cdt = jnp.bfloat16
    cfg = DCAEConfig()
    dcae = AutoencoderDC(cfg)
    fields = jax.random.normal(jax.random.PRNGKey(0), (1, 120, 240, 84))
    static = jax.random.normal(jax.random.PRNGKey(1), (120, 240, 5))
    params = cast_pytree(
        jax.jit(dcae.init)(jax.random.PRNGKey(2), fields, static), cdt)

    z = jax.random.normal(jax.random.PRNGKey(3), (B, 15, 30, 84))

    @jax.jit
    def decode_chunk(p, z):
        return dcae.apply(p, z.astype(cdt),
                          method=AutoencoderDC.decode).astype(jnp.float32)

    @jax.jit
    def encode(p, f, s):
        return dcae.apply(p, f.astype(cdt), s.astype(cdt),
                          method=AutoencoderDC.encode).astype(jnp.float32)

    float(decode_chunk(params, z).mean())  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(decode_chunk(params, z).mean())  # scalar fetch = sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"decode {B}-frame chunk: {best*1e3:.1f} ms "
          f"({best/B*1e3:.2f} ms/frame); bench-total estimate "
          f"{best*800/B:.2f} s for 800 frames")

    float(encode(params, fields, static).mean())
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(encode(params, fields, static).mean())
        times.append(time.perf_counter() - t0)
    print(f"encode 1 frame full-res: {min(times)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
