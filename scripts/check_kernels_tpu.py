"""Hardware correctness check of the Pallas attention paths at PRODUCTION
shapes, against the XLA composite on the same chip.

The unit suite runs kernels in CPU interpret mode at small shapes; grid /
blocking bugs that only bite at real sizes (round-2 example: K-preprocess
tail truncation at sk_pad=2304) pass it silently. This script asserts
numerical agreement at the exact shapes the 375M/1.6B models use, in both
the bf16 production dtype and the fp32 parity dtype.

Run on any attached TPU after touching ops/pallas/ (part of the verify
recipe, .claude/skills/verify/SKILL.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.ops.pallas import flash_attention as fa

# (B, Sq, Sk, H): inference joint attention (members=20), training
# (batch 4, latent-only query), refiner (450 cond tokens), 1.6B heads.
SHAPES = [
    (20, 2250, 2250, 12),
    (4, 1800, 2250, 12),
    (4, 450, 450, 12),
    (20, 2250, 2250, 16),
]
# abs tolerances at output scale ~1. fp32-on-TPU note: at the default
# matmul precision BOTH the XLA composite and the kernel run fp32 dots
# as bf16 passes (measured: each sits ~2e-3 from a
# default_matmul_precision("highest") reference, and they agree with
# each other to the same order) -- so the fp32 bound here is the
# default-precision agreement bound, not true-fp32 1e-5 (the CPU parity
# suite pins that separately).
TOL = {jnp.bfloat16: 3e-2, jnp.float32: 8e-3}


def main():
    rng = np.random.RandomState(0)
    ref_f = jax.jit(lambda q, k, v, qc, qs, qw, kc, ks, kw: fa._xla_composite(
        q, k, v, qc, qs, qw, kc, ks, kw, 1e-7))
    fused_f = jax.jit(lambda q, k, v, qc, qs, qw, kc, ks, kw: fa._fused_impl(
        q, k, v, qc, qs, qw, kc, ks, kw, 1e-7))
    failures = 0
    for dtype in (jnp.bfloat16, jnp.float32):
        for (B, Sq, Sk, H) in SHAPES:
            D = 128
            q = jnp.asarray(rng.randn(B, Sq, H, D), dtype) * 0.3
            k = jnp.asarray(rng.randn(B, Sk, H, D), dtype) * 0.3
            v = jnp.asarray(rng.randn(B, Sk, H, D), dtype)
            qc = jnp.asarray(rng.rand(Sq, D), jnp.float32)
            qs = jnp.asarray(rng.rand(Sq, D), jnp.float32)
            qw = jnp.asarray(rng.rand(Sq, D) + 0.5, jnp.float32)
            kc = jnp.asarray(rng.rand(Sk, D), jnp.float32)
            ks = jnp.asarray(rng.rand(Sk, D), jnp.float32)
            kw = jnp.asarray(rng.rand(Sk, D) + 0.5, jnp.float32)
            ref = ref_f(q, k, v, qc, qs, qw, kc, ks, kw).astype(jnp.float32)
            out = fused_f(q, k, v, qc, qs, qw, kc, ks, kw).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(out - ref)))
            ok = np.isfinite(err) and err < TOL[dtype]
            failures += 0 if ok else 1
            print(f"{np.dtype(dtype).name} B={B} Sq={Sq} Sk={Sk} H={H}: "
                  f"maxerr={err:.5f} {'OK' if ok else 'FAIL'}", flush=True)
    failures += check_depthwise(rng)
    if failures:
        raise SystemExit(f"{failures} kernel checks FAILED")
    print("all kernel hardware checks passed")


# Production depthwise shapes (padded input, kernel size): the DCAE
# EfficientViT Sana-multiscale 5x5 and GLUMBConv 3x3 depthwise convs at
# both EViT stages (B=20 decode chunk; channel counts incl. the
# non-128-multiple 1440/2976 that exercise the channel-pad path).
DW_SHAPES = [
    ((20, 34, 64, 1440), 5),
    ((20, 19, 34, 2976), 5),
    ((20, 32, 62, 4032), 3),
    ((20, 17, 32, 8064), 3),
]
DW_TOL = {jnp.bfloat16: 2e-2, jnp.float32: 1e-4}


def check_depthwise(rng):
    from ladcast_tpu.ops.pallas import depthwise_conv as dw

    failures = 0
    ref_f = jax.jit(dw._xla_depthwise_valid)
    fast_f = jax.jit(dw._pallas_depthwise_valid)
    for dtype in (jnp.bfloat16, jnp.float32):
        for (shape, ksz) in DW_SHAPES:
            assert dw._use_pallas(shape, ksz, ksz), (shape, ksz)
            x = jnp.asarray(rng.randn(*shape), dtype)
            k = jnp.asarray(rng.randn(ksz, ksz, shape[-1]), dtype) * 0.2
            ref = ref_f(x, k).astype(jnp.float32)
            out = fast_f(x, k).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(out - ref)))
            ok = np.isfinite(err) and err < DW_TOL[dtype]
            failures += 0 if ok else 1
            print(f"depthwise {np.dtype(dtype).name} {shape} k={ksz}: "
                  f"maxerr={err:.5f} {'OK' if ok else 'FAIL'}", flush=True)
    return failures


if __name__ == "__main__":
    main()
