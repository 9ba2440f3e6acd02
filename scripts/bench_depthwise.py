"""Depthwise sphere-conv: grouped-conv HLO vs shifted-slice lowering, at
the DCAE EViT/GLUMB shapes (the 8-13%-MXU decode stages)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ladcast_tpu.ops import sphere


def grouped_hlo(x, kernel, padding):
    xp = x if padding == "VALID" else jnp.pad(
        x, ((0, 0), padding[0], padding[1], (0, 0)))
    return lax.conv_general_dilated(
        xp, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=kernel.shape[-1])


def timed(name, f, *args):
    g = jax.jit(f)
    out = g(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _i in range(30):
        out = g(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"{name:>44s}: {(time.time() - t0) / 30 * 1e3:6.2f} ms",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    for (B, H, W, C, k) in [(20, 30, 60, 4032, 3), (20, 15, 30, 8064, 3),
                            (20, 30, 60, 1440, 5), (20, 15, 30, 2976, 5)]:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        kern = jnp.asarray(rng.randn(k, k, 1, C), jnp.bfloat16)
        p = ((k // 2, k // 2), (k // 2, k // 2))
        timed(f"grouped HLO  {B}x{H}x{W}x{C} k={k}",
              lambda x, kern, p=p: grouped_hlo(x, kern, p), x, kern)
        timed(f"shifted FMA  {B}x{H}x{W}x{C} k={k}",
              lambda x, kern, p=p: sphere._depthwise_shift_conv(x, kern, p),
              x, kern)
        timed(f"full sphere depthwise {B}x{H}x{W}x{C} k={k}",
              lambda x, kern, C=C: sphere.sphere_conv2d(x, kern, groups=C),
              x, kern)
        if jax.default_backend() == "tpu":
            from ladcast_tpu.ops.pallas import depthwise_conv as dw
            timed(f"pallas v2 same-pad {B}x{H}x{W}x{C} k={k}",
                  lambda x, kern, p=p: dw._pallas_depthwise(
                      x, kern[:, :, 0, :], p), x, kern)
            xp = jnp.pad(x, ((0, 0), p[0], p[1], (0, 0)))
            timed(f"pallas v2 valid (prepadded) {B}x{H}x{W}x{C} k={k}",
                  lambda xp, kern: dw._pallas_depthwise(xp, kern[:, :, 0, :]),
                  xp, kern)


if __name__ == "__main__":
    main()
