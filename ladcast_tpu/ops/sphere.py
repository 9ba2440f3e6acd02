"""Spherical-boundary padding and convolution (NHWC, TPU-native).

Re-implements the semantics of the reference ``SphereConv2d``
(models/sphere_conv.py:9-192): circular padding in longitude (width) and
antipodal pole padding in latitude (height) -- the pad rows above/below the
poles are the nearest rows rolled by half the longitude circle and
vertically mirrored, and the kernel rows that read those pad rows are
width-flipped.

TPU-first design notes
----------------------
* Layout is NHWC (channels in the lane dimension) with HWIO kernels, the
  canonical layout for XLA:TPU convolutions; the reference's NCHW tensors
  are transposed once at the framework boundary.
* Instead of the reference's three-slice evaluation (one conv per pole row
  plus a big middle conv, sphere_conv.py:174-192), we run ONE uniform
  valid convolution over the padded input -- which XLA tiles perfectly --
  and then add two tiny single-row correction convolutions that account
  for the width-flipped kernel rows at the two pole rows. The correction
  kernel is ``flip_w(k[:p]) - k[:p]`` applied to the pad rows only, which
  is algebraically identical to the reference's flipped-kernel pole convs.
* Everything is a pure function of (x, kernel, bias); no mutable state,
  no in-place weight flipping (the reference mutates ``weight.data``,
  sphere_conv.py:99-108 -- we reproduce the math, not the hack).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def sphere_pad(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """Pad (B, H, W, C) with antipodal rows in H and circularly in W.

    Matches ``SphereConv2d.sphere_pad`` (sphere_conv.py:62-91): the rows
    above the top are ``flip_h(roll_w(x[:, :pad_h], W//2))`` and similarly
    below the bottom; then the width is padded circularly.
    """
    B, H, W, C = x.shape
    assert W % 2 == 0, "width (longitude) must be even for antipodal rolling"
    half = W // 2

    top = jnp.flip(jnp.roll(x[:, :pad_h], half, axis=2), axis=1)
    bottom = jnp.flip(jnp.roll(x[:, H - pad_h:], half, axis=2), axis=1)
    x = jnp.concatenate([top, x, bottom], axis=1)

    if pad_w > 0:
        x = jnp.concatenate([x[:, :, W - pad_w:], x, x[:, :, :pad_w]], axis=2)
    return x


def _conv_nhwc(x, kernel, groups: int = 1):
    """Valid NHWC/HWIO convolution."""
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def sphere_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    padding: Optional[int] = None,
    groups: int = 1,
) -> jnp.ndarray:
    """SphereConv2d forward: (B, H, W, C_in) -> (B, H, W, C_out).

    kernel: HWIO, (kh, kw, C_in // groups, C_out); kh, kw odd and equal to
    2*padding + 1 (all reference uses are 3x3/pad 1 or 5x5/pad 2 depthwise).
    """
    kh, kw, _, _ = kernel.shape
    if padding is None:
        padding = kh // 2
    p = padding
    assert kh == kw == 2 * p + 1, "sphere_conv2d expects odd kernels with padding=k//2"

    xp = sphere_pad(x, p, p)  # (B, H+2p, W+2p, C)

    out = _conv_nhwc(xp, kernel, groups)  # (B, H, W, C_out)

    # Pole corrections: output row 0 should have read pad rows 0..p-1 with
    # width-flipped kernel rows 0..p-1 (sphere_conv.py:93-110); we already
    # used the unflipped kernel, so add the difference.
    delta_top = jnp.flip(kernel[:p], axis=1) - kernel[:p]
    delta_bot = jnp.flip(kernel[kh - p:], axis=1) - kernel[kh - p:]
    top_fix = _conv_nhwc(xp[:, :p], delta_top, groups)        # (B, 1, W, C_out)
    bot_fix = _conv_nhwc(xp[:, -p:], delta_bot, groups)       # (B, 1, W, C_out)

    H = x.shape[1]
    out = out.at[:, 0:1].add(top_fix)
    out = out.at[:, H - 1:H].add(bot_fix)

    if bias is not None:
        out = out + bias
    return out


def sphere_conv2d_reference_3slice(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    padding: Optional[int] = None,
    groups: int = 1,
) -> jnp.ndarray:
    """Direct 3-slice translation of the reference forward (used only as a
    cross-check in tests against :func:`sphere_conv2d`)."""
    kh, kw, _, _ = kernel.shape
    if padding is None:
        padding = kh // 2
    p = padding
    xp = sphere_pad(x, p, p)

    k_top = jnp.concatenate([jnp.flip(kernel[:p], axis=1), kernel[p:]], axis=0)
    k_bot = jnp.concatenate([kernel[:kh - p], jnp.flip(kernel[kh - p:], axis=1)], axis=0)

    top = _conv_nhwc(xp[:, :kh], k_top, groups)
    mid = _conv_nhwc(xp[:, 1:-1], kernel, groups)
    bot = _conv_nhwc(xp[:, -kh:], k_bot, groups)
    out = jnp.concatenate([top, mid, bot], axis=1)
    if bias is not None:
        out = out + bias
    return out
