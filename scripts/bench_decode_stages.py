"""Per-stage timing of the DCAE decoder on TPU (B=20 chunk).

Each module is applied K times inside ONE jitted call (chained for
shape-preserving blocks, input-scaled summation otherwise, defeating CSE)
to amortize the ~30 ms axon per-dispatch overhead. v5e bf16 peak ~197 TFLOP/s.
"""

import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from ladcast_tpu.models.dcae import (
    DCUpBlock,
    EfficientViTBlock,
    ResBlock,
    SphereConv,
)

K = 8


def bench(label, module, shape, flops, chain):
    cdt = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), shape, cdt)
    from ladcast_tpu.rollout.pipeline import cast_pytree
    params = cast_pytree(jax.jit(module.init)(jax.random.PRNGKey(1), x), cdt)

    if chain:
        @jax.jit
        def f(p, xx):
            def body(h, _):
                return module.apply(p, h).astype(h.dtype), None
            h, _ = jax.lax.scan(body, xx, None, length=K)
            return h.astype(jnp.float32).mean()
    else:
        @jax.jit
        def f(p, xx):
            acc = 0.0
            for i in range(K):
                acc = acc + module.apply(p, xx * (1.0 + 0.01 * i)).mean()
            return acc

    float(f(params, x))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(f(params, x))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / K
    print(f"{label:40s}: {per*1e3:6.1f} ms  ({flops/1e9:5.0f} GFLOP, "
          f"{flops/per/197e12*100:3.0f}% MXU)")
    return per


def main():
    B = 20
    convf = lambda h, w, ci, co: B * h * w * ci * co * 9 * 2

    total = 0.0
    total += bench("conv_in 84->1008 @15x30", SphereConv(1008),
                   (B, 15, 30, 84), convf(15, 30, 84, 1008), False)
    total += 4 * bench("EViT block @15x30x1008", EfficientViTBlock(32, (5,)),
                       (B, 15, 30, 1008), B * 450 * (3 * 1008 * 992
                       + 2 * 992 * 1008 + 1008 * 8064 + 4032 * 1008) * 2, True)
    total += bench("DCUp 1008->504 @15x30", DCUpBlock(504), (B, 15, 30, 1008),
                   convf(15, 30, 1008, 2016), False)
    total += 4 * bench("EViT block @30x60x504", EfficientViTBlock(32, (5,)),
                       (B, 30, 60, 504), B * 1800 * (3 * 504 * 480
                       + 2 * 480 * 504 + 504 * 4032 + 2016 * 504) * 2, True)
    total += bench("DCUp 504->504 @30x60", DCUpBlock(504), (B, 30, 60, 504),
                   convf(30, 60, 504, 2016), False)
    total += 4 * bench("ResBlock @60x120x504", ResBlock(504),
                       (B, 60, 120, 504), 2 * convf(60, 120, 504, 504), True)
    total += bench("DCUp 504->252 @60x120", DCUpBlock(252), (B, 60, 120, 504),
                   convf(60, 120, 504, 1008), False)
    total += 4 * bench("ResBlock @120x240x252", ResBlock(252),
                       (B, 120, 240, 252), 2 * convf(120, 240, 252, 252), True)
    total += bench("conv_out 252->89 @120x240", SphereConv(89),
                   (B, 120, 240, 252), convf(120, 240, 252, 89), False)
    print(f"{'SUM (decoder reconstruction)':40s}: {total*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
