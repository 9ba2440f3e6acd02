"""Pixel shuffle / unshuffle in NHWC as pure reshape/transpose ops.

Channel ordering matches ``torch.nn.functional.pixel_(un)shuffle`` exactly
(C-major, then intra-block row, then column) so weights imported from the
reference (DCAE.py:477-534) see identical channel semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_unshuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, C*f*f) with torch channel order
    out_channel = c*f*f + i*f + j."""
    B, H, W, C = x.shape
    f = factor
    x = x.reshape(B, H // f, f, W // f, f, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H/f, W/f, C, i, j)
    return x.reshape(B, H // f, W // f, C * f * f)


def pixel_shuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, H, W, C*f*f) -> (B, H*f, W*f, C), inverse of pixel_unshuffle."""
    B, H, W, Cff = x.shape
    f = factor
    C = Cff // (f * f)
    x = x.reshape(B, H, W, C, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, i, W, j, C)
    return x.reshape(B, H * f, W * f, C)
