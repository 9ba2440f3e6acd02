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

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _pallas_depthwise_enabled() -> bool:
    """Opt-in switch for the experimental Pallas depthwise path. Read at
    trace time: set the env var before the first jit of a model fn."""
    return os.environ.get("LADCAST_PALLAS_DEPTHWISE", "0") == "1"


def _pallas_dense_enabled() -> bool:
    """Opt-in switch for the Pallas implicit-GEMM dense conv path. Read
    at trace time: set the env var before the first jit of a model fn.

    HARDWARE-BROKEN as of 2026-08-19: Mosaic rejects the kernel's
    Element-block halo reads on real TPU ("Low padding not supported
    yet" / the (8,128) block-divisibility rule) even though interpret
    mode is green — see PERFORMANCE.md "Round-4 hardware measurements".
    The gate therefore raises on TPU backends instead of producing a
    confusing Mosaic compile error deep inside jit; interpret-mode CPU
    tests (which exercise the kernel's math) still run.
    """
    if os.environ.get("LADCAST_PALLAS_DENSE", "0") != "1":
        return False
    if jax.default_backend() == "tpu":
        raise RuntimeError(
            "LADCAST_PALLAS_DENSE=1: the Pallas dense-conv kernel does "
            "not lower on real TPU (Mosaic: low-padding/block-divisibility"
            " limits; PERFORMANCE.md round-4). Unset the flag — the XLA "
            "conv HLO is the supported dense-conv path.")
    return True


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


def _depthwise_shift_conv(x, kernel, padding):
    """Depthwise conv as a sum of shifted slices (kernel (kh, kw, 1, C)).

    Used for the THIN boundary-strip convolutions of the fused-boundary
    sphere conv: on strips the grouped-conv HLO pays a large fixed cost
    (~0.5 ms each at feature_group_count in the thousands), while the
    shifted fused multiply-adds fuse into the surrounding elementwise
    graph. For big main convolutions the grouped HLO wins (measured:
    3.4 ms HLO vs 5.6 ms shifted over (20, 30, 60, 4032) k=3 -- XLA's
    conv emitter streams the input once, the shifted form re-reads it
    kh*kw times).
    """
    kh, kw, _, C = kernel.shape
    if padding == "VALID":
        padding = ((0, 0), (0, 0))
    xp = x if padding == ((0, 0), (0, 0)) else jnp.pad(
        x, ((0, 0), padding[0], padding[1], (0, 0)))
    H_out = xp.shape[1] - kh + 1
    W_out = xp.shape[2] - kw + 1
    out = None
    for dy in range(kh):
        for dx in range(kw):
            t = xp[:, dy:dy + H_out, dx:dx + W_out, :] \
                * kernel[dy, dx, 0].astype(x.dtype)
            out = t if out is None else out + t
    return out


def _conv_nhwc(x, kernel, groups: int = 1, padding="VALID"):
    """NHWC/HWIO convolution (padding fused into the conv HLO).

    Depthwise (groups == C) thin-strip calls lower to shifted fused
    multiply-adds (see _depthwise_shift_conv); large depthwise and all
    dense convolutions use the conv HLO. An experimental Pallas depthwise
    kernel (ops/pallas/depthwise_conv.py) is opt-in via
    LADCAST_PALLAS_DEPTHWISE=1: although the grouped-conv HLO runs ~20x
    off the HBM roofline of this pure-VPU op, the kernel measured SLOWER
    in production (EViT 5x5 5.33 -> 8.13 ms; PERFORMANCE.md round-3
    negative results), so the HLO stays the default until the kernel
    beats it at production shapes.
    """
    if groups > 1 and groups == x.shape[-1] and kernel.shape[2] == 1 \
            and kernel.shape[3] == groups:
        kh, kw = kernel.shape[:2]
        if padding == "VALID":
            h_out = x.shape[1] - kh + 1
            w_out = x.shape[2] - kw + 1
        else:
            h_out = x.shape[1] + sum(padding[0]) - kh + 1
            w_out = x.shape[2] + sum(padding[1]) - kw + 1
        if min(h_out, w_out) <= max(kh, kw):  # boundary strip
            return _depthwise_shift_conv(x, kernel, padding)
        if _pallas_depthwise_enabled():
            from ladcast_tpu.ops.pallas.depthwise_conv import (
                _use_pallas,
                depthwise_same_conv,
            )
            pad_hw = ((0, 0), (0, 0)) if padding == "VALID" else \
                tuple(tuple(p) for p in padding)
            hp = x.shape[1] + sum(pad_hw[0])
            wp = x.shape[2] + sum(pad_hw[1])
            if _use_pallas((x.shape[0], hp, wp, x.shape[3]), kh, kw):
                # zero padding happens inside the kernel on the
                # VMEM-resident tile -- no materialized padded copy
                return depthwise_same_conv(x, kernel[:, :, 0, :], pad_hw)
    if groups == 1 and kernel.shape[0] > 1 and _pallas_dense_enabled():
        from ladcast_tpu.ops.pallas.dense_conv import (
            _use_pallas as _use_pallas_dense,
            dense_conv,
        )
        pad_hw = ((0, 0), (0, 0)) if padding == "VALID" else \
            tuple(tuple(p) for p in padding)
        h_out = x.shape[1] + sum(pad_hw[0]) - kernel.shape[0] + 1
        w_out = x.shape[2] + sum(pad_hw[1]) - kernel.shape[1] + 1
        # implicit-GEMM kernel only for the big main convs; thin strips
        # stay on the conv HLO (large fixed Pallas grid cost on strips)
        if min(h_out, w_out) > max(kernel.shape[0], kernel.shape[1]) \
                and _use_pallas_dense(x.shape, kernel.shape, pad_hw,
                                      x.dtype.itemsize):
            return dense_conv(x, kernel, pad_hw)
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=padding,
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

    Fused-boundary formulation (no materialized padded copy): the main
    convolution runs directly on ``x`` with zero padding folded into the
    conv HLO (XLA:TPU handles it natively), and the boundary reads the
    zero-pad got wrong are patched by four thin strip convolutions:

      * wrap-left / wrap-right -- circular-longitude reads with the
        normal kernel (flip applies only to pole-row reads), restricted
        to in-bounds rows via zero H-padding;
      * pole-top / pole-bottom -- antipodal-row reads with the
        width-flipped kernel rows (sphere_conv.py:93-110), on the p-row
        antipodal strips circularly padded in W (covers the corners).

    The strips are O(p*W) / O(p*H) -- negligible next to the main conv --
    while the old sphere_pad path wrote + re-read a full (H+2p)x(W+2p)
    copy of the activation per conv (the DCAE decode was HBM-bound on
    exactly that traffic).
    """
    kh, kw, _, _ = kernel.shape
    if padding is None:
        padding = kh // 2
    p = padding
    assert kh == kw == 2 * p + 1, "sphere_conv2d expects odd kernels with padding=k//2"
    B, H, W, C = x.shape
    assert W % 2 == 0, "width (longitude) must be even for antipodal rolling"
    half = W // 2

    # Main conv. Preferred form (Pallas dense kernel enabled): circular
    # longitude handled IN-KERNEL by cyclic sublane rolls of the
    # VMEM-resident tile -- the two wrap strip convolutions and their
    # full-buffer .at[].add passes disappear. Fallback: zero-padded SAME
    # conv HLO + wrap strip fixes.
    wrap_handled = False
    if groups == 1 and kh > 1 and _pallas_dense_enabled():
        from ladcast_tpu.ops.pallas.dense_conv import (
            _use_pallas as _use_pallas_dense,
            dense_conv,
        )
        if _use_pallas_dense(x.shape, kernel.shape, ((p, p), (p, p)),
                             x.dtype.itemsize, circular_w=True):
            out = dense_conv(x, kernel, ((p, p), (p, p)), True)
            wrap_handled = True
    if not wrap_handled and groups > 1 and groups == x.shape[-1] \
            and kernel.shape[2] == 1 and _pallas_depthwise_enabled():
        from ladcast_tpu.ops.pallas.depthwise_conv import (
            _use_pallas as _use_pallas_dw,
            depthwise_same_conv,
        )
        if _use_pallas_dw((B, H + 2 * p, W, groups), kh, kw):
            out = depthwise_same_conv(x, kernel[:, :, 0, :],
                                      ((p, p), (p, p)), True)
            wrap_handled = True
    if not wrap_handled:
        out = _conv_nhwc(x, kernel, groups, padding=((p, p), (p, p)))
        # Wrap columns (in-bounds rows only -> zero H padding).
        # out[:, :, j], j < p gains sum_{kw < p-j} k[:, kw] * x[:, :, W-p+j+kw].
        left_fix = _conv_nhwc(x[:, :, W - p:], kernel[:, :p], groups,
                              padding=((p, p), (0, p - 1)))      # (B, H, p, O)
        # out[:, :, W-p+j] gains sum_{kw >= 2p-j} k[:, kw] * x[:, :, j+kw-2p].
        right_fix = _conv_nhwc(x[:, :, :p], kernel[:, p + 1:], groups,
                               padding=((p, p), (p - 1, 0)))     # (B, H, p, O)
        out = out.at[:, :, :p].add(left_fix)
        out = out.at[:, :, W - p:].add(right_fix)

    # Pole rows: antipodal strips, circularly padded in W. The reference
    # evaluates output row 0 / H-1 with the width-flipped kernel rows
    # (sphere_conv.py:93-129) but output rows 1..p-1 (p=2 kernels) read
    # their pad rows with the NORMAL kernel (they come from the middle
    # slice of the 3-slice evaluation, :174-192).
    pad_top = jnp.flip(jnp.roll(x[:, :p], half, axis=2), axis=1)
    pad_bot = jnp.flip(jnp.roll(x[:, H - p:], half, axis=2), axis=1)
    pad_top = jnp.concatenate(
        [pad_top[:, :, W - p:], pad_top, pad_top[:, :, :p]], axis=2)
    pad_bot = jnp.concatenate(
        [pad_bot[:, :, W - p:], pad_bot, pad_bot[:, :, :p]], axis=2)

    # out row 0: sum_{kh<p} flip_w(k)[kh] * pad_top[kh]  (VALID -> 1 row)
    top0 = _conv_nhwc(pad_top, jnp.flip(kernel[:p], axis=1), groups)
    out = out.at[:, 0:1].add(top0)
    # out row H-1: sum_{kh>p} flip_w(k)[kh] * pad_bot[kh-(p+1)]
    bot0 = _conv_nhwc(pad_bot, jnp.flip(kernel[kh - p:], axis=1), groups)
    out = out.at[:, H - 1:H].add(bot0)
    if p > 1:
        # out rows 1..p-1: sum_{kh < p-h} k[kh] * pad_top[h+kh], normal k.
        topn = _conv_nhwc(pad_top[:, 1:], kernel[:p - 1], groups,
                          padding=((0, p - 2), (0, 0)))
        out = out.at[:, 1:p].add(topn)
        # out rows H-p..H-2: sum_{kh >= 2p-j} k[kh] * pad_bot[j+kh-2p].
        botn = _conv_nhwc(pad_bot[:, :p - 1], kernel[p + 1:], groups,
                          padding=((p - 1, 0), (0, 0)))
        out = out.at[:, H - p:H - 1].add(botn)

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
