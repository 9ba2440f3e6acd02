"""Pallas depthwise 2D convolution (NHWC) for TPU.

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
keeps one spatial tile resident in VMEM and accumulates the kh*kw
shifted products on-chip, so the input is read from HBM exactly once.

v2 changes (addressing the v1 slowdown suspects, PERFORMANCE.md):
  * zero padding happens INSIDE the kernel on the VMEM-resident tile
    (``depthwise_same_conv``) -- v1 required the caller to ``jnp.pad``
    in HBM, a full extra write+read of the activation;
  * non-128-multiple channel counts (1440, 2976, ...) use Pallas'
    ragged-grid masking (out-of-bounds lanes read garbage and are
    dropped on write; channels are independent in a depthwise conv, so
    no cross-contamination) -- v1 materialized a channel-padded copy;
  * taps are ordered dx-outer so each W-shift (a sublane rotation in
    the (..., W, C) tile layout) is materialized once and reused by all
    kh row taps.

Semantics: ``out[b, h, w, c] = sum_{dy,dx} xp[b, h+dy, w+dx, c] *
k[dy, dx, c]`` where ``xp`` is the zero-padded input -- i.e. a VALID
depthwise convolution on the padded tensor. Sphere boundary handling
happens outside (the caller composes this with ``ops.sphere`` strip
fixes). fp32 accumulation, output in the input dtype.

Gradients: forward runs the Pallas kernel; the backward pass reuses the
XLA composition via ``jax.vjp`` -- training keeps today's performance,
the inference-critical forward gets the fast path. (The DCAE trains at
~308 ms/step where the depthwise bwd is not the bottleneck; revisit if
it becomes one.)

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

# One padded spatial tile must fit VMEM alongside its double-buffered
# output block and the fp32 accumulator. Measured bound: cb=512 at a
# 34x64 tile allocates 18.5 MB scoped VMEM (>16 MB hard limit); cb=256
# there is ~6 MB. 600k elements per input block keeps every production
# shape under the limit with headroom.
_MAX_TILE_ELEMS = 600_000
_LANE = 128

Pads = tuple  # ((ph0, ph1), (pw0, pw1))

_NO_PAD: Pads = ((0, 0), (0, 0))


def _xla_depthwise(x: jnp.ndarray, k: jnp.ndarray,
                   pads: Pads = _NO_PAD) -> jnp.ndarray:
    """Reference XLA lowering (grouped conv HLO): used for CPU fallback,
    for shapes that don't fit the VMEM tile, and for the backward pass."""
    C = x.shape[-1]
    return lax.conv_general_dilated(
        x, k[:, :, None, :],
        window_strides=(1, 1), padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def _xla_depthwise_circular(x: jnp.ndarray, k: jnp.ndarray,
                            pads: Pads) -> jnp.ndarray:
    """XLA lowering of the circular-longitude variant (wrap columns
    materialized, H zero-padded in the grouped-conv HLO)."""
    (ph0, ph1), (pw0, pw1) = pads
    W = x.shape[2]
    xp = jnp.concatenate([x[:, :, W - pw0:], x, x[:, :, :pw1]], axis=2)
    C = x.shape[-1]
    return lax.conv_general_dilated(
        xp, k[:, :, None, :],
        window_strides=(1, 1), padding=((ph0, ph1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


# shared with dense_conv.py; kernels call it on VMEM-resident tiles
from ladcast_tpu.ops.pallas.utils import static_roll as _static_roll


def _kernel(x_ref, k_ref, o_ref, *, kh: int, kw: int, H: int, W: int,
            pads: Pads, circular_w: bool):
    """One (batch, channel-block) grid step.

    x_ref block: (1, H_in, W_in, cb) UNPADDED input tile; zero padding is
    applied here, in VMEM (zero HBM traffic). dx outer so each W-shift
    (a sublane rotation in the (..., W, C) tile layout) is materialized
    once and reused by all kh row taps; the dy offsets index full rows,
    which cost no lane/sublane shuffle. With ``circular_w`` the W taps
    are cyclic rolls of the full-width tile (sphere longitude wrap
    in-kernel -- no wrap strip fixes outside).
    """
    x = x_ref[0]
    (ph0, ph1), (pw0, pw1) = pads
    if circular_w:
        if ph0 or ph1:
            x = jnp.pad(x, ((ph0, ph1), (0, 0), (0, 0)))
    elif ph0 or ph1 or pw0 or pw1:
        x = jnp.pad(x, ((ph0, ph1), (pw0, pw1), (0, 0)))
    acc = None
    for dx in range(kw):
        if circular_w:
            xs = _static_roll(x, (pw0 - dx) % W, 1)
        else:
            xs = x[:, dx:dx + W, :]  # (Hp, W, cb), input dtype
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


def _pallas_depthwise(x: jnp.ndarray, k: jnp.ndarray,
                      pads: Pads = _NO_PAD, *,
                      circular_w: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    B, H_in, W_in, C = x.shape
    kh, kw, _ = k.shape
    (ph0, ph1), (pw0, pw1) = pads
    Hp, Wp = H_in + ph0 + ph1, W_in + pw0 + pw1
    H, W = Hp - kh + 1, Wp - kw + 1
    assert not circular_w or W == W_in, (W, W_in)
    cb = _block_channels(C, Hp * Wp)
    assert cb >= _LANE
    cb = min(cb, -(-C // _LANE) * _LANE)  # no wider than C rounded to lanes
    kf = k.reshape(kh * kw, C)

    # Ragged last channel block: Pallas masks out-of-bounds lanes (reads
    # see garbage, writes are dropped); channels are independent here so
    # the kept lanes are exact. No materialized channel pad.
    return pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, H=H, W=W, pads=pads,
                          circular_w=circular_w),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B, -(-C // cb)),
        in_specs=[
            pl.BlockSpec((1, H_in, W_in, cb), lambda b, c: (b, 0, 0, c)),
            pl.BlockSpec((kh * kw, cb), lambda b, c: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, H, W, cb), lambda b, c: (b, 0, 0, c)),
        interpret=interpret,
    )(x, kf)


def _use_pallas(xp_shape, kh: int, kw: int) -> bool:
    """xp_shape: the PADDED input shape (B, Hp, Wp, C)."""
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_same_conv(x: jnp.ndarray, k: jnp.ndarray,
                        pads: Pads = _NO_PAD,
                        circular_w: bool = False) -> jnp.ndarray:
    """Depthwise conv with padding ``pads``, NHWC; ``k`` is (kh, kw, C).

    ``pads = ((ph0, ph1), (pw0, pw1))`` zero padding is applied INSIDE the
    Pallas kernel on the VMEM-resident tile -- the unpadded input is read
    from HBM exactly once and no padded copy is materialized. With
    ``circular_w`` the W taps wrap cyclically instead (sphere longitude
    semantics; W pads must sum to kw-1). fp32 accumulation, same numerics
    contract as the conv HLO; XLA grouped-conv fallback off-TPU or when a
    channel block won't fit VMEM.
    """
    B, H_in, W_in, C = x.shape
    kh, kw, _ = k.shape
    (ph0, ph1), (pw0, pw1) = pads
    wp = W_in if circular_w else W_in + pw0 + pw1
    if _use_pallas((B, H_in + ph0 + ph1, wp, C), kh, kw):
        return _pallas_depthwise(x, k, pads, circular_w=circular_w)
    if circular_w:
        return _xla_depthwise_circular(x, k, pads)
    return _xla_depthwise(x, k, pads)


def _fwd(x, k, pads, circular_w):
    return depthwise_same_conv(x, k, pads, circular_w), (x, k)


def _bwd(pads, circular_w, res, g):
    x, k = res
    ref = _xla_depthwise_circular if circular_w else _xla_depthwise
    _, vjp = jax.vjp(lambda xx, kk: ref(xx, kk, pads), x, k)
    return vjp(g)


depthwise_same_conv.defvjp(_fwd, _bwd)


def depthwise_valid_conv(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """VALID depthwise conv on an already-padded input (v1 entry point,
    kept for tests/benches): ``depthwise_same_conv`` with zero pads."""
    return depthwise_same_conv(xp, k, _NO_PAD)


def depthwise_same_conv_interpret(x: jnp.ndarray, k: jnp.ndarray,
                                  pads: Pads = _NO_PAD,
                                  circular_w: bool = False) -> jnp.ndarray:
    """Interpret-mode run of the Pallas kernel (CPU unit tests)."""
    return _pallas_depthwise(x, jnp.asarray(np.asarray(k)), pads,
                             circular_w=circular_w, interpret=True)


def depthwise_valid_conv_interpret(xp: jnp.ndarray,
                                   k: jnp.ndarray) -> jnp.ndarray:
    return depthwise_same_conv_interpret(xp, k, _NO_PAD)
