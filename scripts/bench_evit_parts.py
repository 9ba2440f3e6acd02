"""Sub-component timing of the EfficientViT block on TPU (B=20)."""

import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from ladcast_tpu.models.dcae import (
    GLUMBConv,
    SanaMultiscaleLinearAttention,
    SphereConv,
)

K = 8


def bench(label, module, shape):
    cdt = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), shape, cdt)
    from ladcast_tpu.rollout.pipeline import cast_pytree
    params = cast_pytree(jax.jit(module.init)(jax.random.PRNGKey(1), x), cdt)

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
    print(f"{label:46s}: {min(ts)/K*1e3:6.2f} ms")


def main():
    B = 20
    for H, W, C in [(30, 60, 504), (15, 30, 1008)]:
        print(f"--- {H}x{W}x{C} ---")
        bench("Sana attention", SanaMultiscaleLinearAttention(C, 32, (5,)),
              (B, H, W, C))
        bench("GLUMBConv", GLUMBConv(C), (B, H, W, C))
        inner = (C // 32) * 32
        bench(f"depthwise 5x5 sphere ({3*inner}ch)",
              SphereConv(3 * inner, kernel_size=5, groups=3 * inner,
                         use_bias=False), (B, H, W, 3 * inner))
        bench(f"depthwise 3x3 sphere ({8*C}ch)",
              SphereConv(8 * C, groups=8 * C), (B, H, W, 8 * C))
        bench("dense qkv-equivalent 1x1 (C->3C)",
              __import__("flax.linen", fromlist=["Dense"]).Dense(3 * C),
              (B, H, W, C))


if __name__ == "__main__":
    main()
