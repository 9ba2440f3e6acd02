"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def static_roll(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """jnp.roll with a STATIC shift as slice+concat. Mosaic lowers
    ``pltpu.roll`` to ``tpu.dynamic_rotate``, which is unimplemented for
    non-32-bit data (caught on hardware, round 3: the bf16 production
    dtype failed to compile); static slices/concat lower for any dtype."""
    n = x.shape[axis]
    s = shift % n
    if s == 0:
        return x
    lo = lax.slice_in_dim(x, n - s, n, axis=axis)
    hi = lax.slice_in_dim(x, 0, n - s, axis=axis)
    return lax.concatenate([lo, hi], axis)
