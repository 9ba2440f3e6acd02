"""Pallas depthwise 2D convolution (VALID, NHWC) for TPU.

STATUS: experimental, opt-in via LADCAST_PALLAS_DEPTHWISE=1 (see
ops/sphere.py). Numerically exact vs the grouped-conv HLO on hardware
(scripts/check_kernels_tpu.py), but the first version measured SLOWER
in production (EViT depthwise 5x5 5.33 -> 8.13 ms, 3x3 6.64 -> 9.41 ms
inside SphereConv; PERFORMANCE.md round-3 negative results), so the
default path keeps the HLO.

Why this kernel exists: XLA:TPU lowers depthwise convolutions
(``feature_group_count == channels``) with a large fixed cost when the
group count is in the thousands -- measured 4.6-6.6 ms per call for the
DCAE's EfficientViT depthwise 3x3/5x5 convs at (20, 30, 60, 1440..8064),
versus ~0.3 ms of HBM roofline (the op is pure VPU multiply-add; there
is no MXU work to schedule). Here each (batch, channel-block) grid step
keeps one padded spatial tile resident in VMEM and accumulates the
kh*kw shifted products on-chip, so the input is read from HBM exactly
once. The remaining gap is kernel-internal (sublane shifts per tap and
the materialized zero/channel pads); revisit with a measured win before
flipping the default.

Semantics: ``out[b, h, w, c] = sum_{dy,dx} x[b, h+dy, w+dx, c] *
k[dy, dx, c]`` -- a VALID depthwise convolution on an already-padded
input (sphere/zero padding happens outside; the caller composes this
with ``ops.sphere`` boundary handling). fp32 accumulation, output in the
input dtype.

Gradients: forward runs the Pallas kernel; the backward pass reuses the
XLA composition (``_xla_depthwise_valid``) via ``jax.vjp`` -- training
keeps today's performance, the inference-critical forward gets the
fast path. (The DCAE trains at ~308 ms/step where the depthwise bwd is
not the bottleneck; revisit if it becomes one.)

No reference counterpart: the reference runs these through cuDNN grouped
convolutions (torch F.conv2d with groups, models/DCAE.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One padded spatial tile must fit VMEM alongside its double-buffered
# output block and the fp32 accumulator. Measured bound: cb=512 at a
# 34x64 tile allocates 18.5 MB scoped VMEM (>16 MB hard limit); cb=256
# there is ~6 MB. 600k elements per input block keeps every production
# shape under the limit with headroom.
_MAX_TILE_ELEMS = 600_000
_LANE = 128


def _xla_depthwise_valid(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA lowering (grouped conv HLO): used for CPU fallback,
    for shapes that don't fit the VMEM tile, and for the backward pass."""
    C = xp.shape[-1]
    return lax.conv_general_dilated(
        xp, k[:, :, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def _kernel(x_ref, k_ref, o_ref, *, kh: int, kw: int, H: int, W: int):
    # dx outer so each W-shift (a sublane rotation in the (..., W, C)
    # tile layout) is materialized once and reused by all kh row taps;
    # the dy offsets index full rows, which cost no lane/sublane shuffle.
    acc = None
    for dx in range(kw):
        xs = x_ref[0, :, dx:dx + W, :]  # (Hp, W, cb), input dtype
        for dy in range(kh):
            t = xs[dy:dy + H].astype(jnp.float32) \
                * k_ref[dy * kw + dx, :].astype(jnp.float32)[None, None, :]
            acc = t if acc is None else acc + t
    o_ref[0] = acc.astype(o_ref.dtype)


def _block_channels(C: int, tile_hw: int) -> int:
    """Largest channel block (multiple of 128, capped at 512) whose padded
    input tile fits the VMEM budget; 0 if even 128 lanes don't fit."""
    for cb in (512, 256, 128):
        if cb * tile_hw <= _MAX_TILE_ELEMS:
            return cb
    return 0


def _pallas_depthwise_valid(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    B, Hp, Wp, C = xp.shape
    kh, kw, _ = k.shape
    H, W = Hp - kh + 1, Wp - kw + 1
    cb = _block_channels(C, Hp * Wp)
    assert cb >= _LANE
    C_pad = -(-C // cb) * cb
    if C_pad != C:
        xp = jnp.pad(xp, ((0, 0),) * 3 + ((0, C_pad - C),))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, C_pad - C)))
    kf = k.reshape(kh * kw, C_pad)

    out = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C_pad), xp.dtype),
        grid=(B, C_pad // cb),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, cb), lambda b, c: (b, 0, 0, c)),
            pl.BlockSpec((kh * kw, cb), lambda b, c: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, H, W, cb), lambda b, c: (b, 0, 0, c)),
    )(xp, kf)
    return out[..., :C] if C_pad != C else out


def _use_pallas(xp_shape, kh: int, kw: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    B, Hp, Wp, C = xp_shape
    if C < _LANE:
        return False
    # the win is the avoided grouped-conv fixed cost; tiny outputs are
    # handled fine by the shifted form upstream
    if Hp - kh + 1 < 2 or Wp - kw + 1 < 2:
        return False
    # one channel block must fit the VMEM tile budget
    return _block_channels(C, Hp * Wp) >= _LANE


@jax.custom_vjp
def depthwise_valid_conv(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """VALID depthwise conv, NHWC; ``k`` is (kh, kw, C).

    Pallas fast path on TPU (fp32 accumulation, same numerics contract
    as the conv HLO); XLA grouped-conv fallback elsewhere.
    """
    if _use_pallas(xp.shape, k.shape[0], k.shape[1]):
        return _pallas_depthwise_valid(xp, k)
    return _xla_depthwise_valid(xp, k)


def _fwd(xp, k):
    return depthwise_valid_conv(xp, k), (xp, k)


def _bwd(res, g):
    xp, k = res
    _, vjp = jax.vjp(_xla_depthwise_valid, xp, k)
    return vjp(g)


depthwise_valid_conv.defvjp(_fwd, _bwd)


def depthwise_valid_conv_interpret(xp: jnp.ndarray,
                                   k: jnp.ndarray) -> jnp.ndarray:
    """Interpret-mode run of the Pallas kernel (CPU unit tests)."""
    B, Hp, Wp, C = xp.shape
    kh, kw, _ = k.shape
    H, W = Hp - kh + 1, Wp - kw + 1
    cb = min(_LANE, C) if C % _LANE else _LANE
    if C % cb:
        cb = C  # tiny test channels: single block
    kf = np.reshape(np.asarray(k), (kh * kw, C))
    return pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), xp.dtype),
        grid=(B, C // cb),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, cb), lambda b, c: (b, 0, 0, c)),
            pl.BlockSpec((kh * kw, cb), lambda b, c: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, H, W, cb), lambda b, c: (b, 0, 0, c)),
        interpret=True,
    )(xp, jnp.asarray(kf))
