"""Pallas dense 2D convolution (NHWC, implicit GEMM) for TPU.

STATUS: experimental, opt-in via LADCAST_PALLAS_DENSE=1 (see
ops/sphere.py). Targets the DCAE decoder's dense 3x3 convolutions --
the dominant cost of the decode stage (~10 s of the 57 s north-star
bench at 35-45% MXU through XLA's conv emitter, PERFORMANCE.md).

Design (implicit GEMM, one halo tile per grid step):

* grid = (batch, cout-block, h-tile); the kernel keeps one H-halo'd
  spatial slab ``(th + kh - 1, W_out + kw - 1, Cin)`` resident in VMEM
  and accumulates the kh*kw tap matmuls
  ``(th*W_out, Cin) @ (Cin, co_blk)`` into an fp32 accumulator on the
  MXU -- an im2col GEMM without ever materializing im2col.
* Halo overlap between consecutive H tiles is expressed with
  ``pl.Element`` block dims: the index map returns the UNPADDED element
  start ``h * th`` and the block spans ``[h*th - ph0, h*th - ph0 + bs)``.
  Out-of-bounds halo rows/cols are filled with GARBAGE (not zeros!) by
  the DMA, so the kernel masks them to zero itself (`broadcasted_iota`
  row/col validity) -- this also implements the conv's zero padding
  in-kernel, with zero HBM traffic for pads.
* Ragged Cout blocks (252, 89, ... are not lane multiples) use Pallas'
  grid masking: out-of-bounds weight lanes read garbage, the garbage
  accumulator columns are dropped on the masked output write. Columns
  are independent in the GEMM N dimension, so kept lanes are exact.
* fp32 accumulation via ``preferred_element_type``; output in the input
  dtype. Gradients: forward runs the Pallas kernel, backward reuses the
  XLA conv composition via ``jax.vjp`` (same pattern as
  ops/pallas/depthwise_conv.py).

The sphere boundary handling stays OUTSIDE: ops/sphere.py composes this
kernel (as the SAME-padded main conv) with its thin strip corrections.

No reference counterpart: the reference runs these through cuDNN dense
convolutions (torch F.conv2d, models/DCAE.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from ladcast_tpu.ops.pallas.utils import static_roll as _static_roll

Pads = tuple  # ((ph0, ph1), (pw0, pw1))

_NO_PAD: Pads = ((0, 0), (0, 0))
_LANE = 128
# Conservative VMEM budget for in/out/weight double buffers + the fp32
# accumulator (v5e has 16 MiB per core; leave headroom for semaphores
# and the scalar prologue).
_VMEM_BUDGET = 11 * 2 ** 20
_HALO_BUDGET = 3 * 2 ** 20


def _xla_dense(x: jnp.ndarray, k: jnp.ndarray,
               pads: Pads = _NO_PAD) -> jnp.ndarray:
    """Reference XLA lowering (conv HLO): CPU fallback, shapes without a
    VMEM-feasible plan, and the backward pass."""
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _xla_dense_circular(x: jnp.ndarray, k: jnp.ndarray,
                        pads: Pads) -> jnp.ndarray:
    """XLA lowering of the circular-longitude variant: materialize the W
    wrap columns, zero-pad H inside the conv HLO."""
    (ph0, ph1), (pw0, pw1) = pads
    W = x.shape[2]
    xp = jnp.concatenate([x[:, :, W - pw0:], x, x[:, :, :pw1]], axis=2)
    return lax.conv_general_dilated(
        xp, k, window_strides=(1, 1), padding=((ph0, ph1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _kernel(x_ref, k_ref, o_ref, *, kh: int, kw: int, th: int,
            W_out: int, H_in: int, W_in: int, pads: Pads, cin: int,
            co_blk: int, circular_w: bool):
    """One (batch, cout-block, h-tile) grid step."""
    h = pl.program_id(2)
    (ph0, _), (pw0, _) = pads
    x = x_ref[...]                    # (bs_h, bs_w, Cin), H-halo'd
    bs_h, bs_w, _ = x.shape
    # Mask garbage-filled OOB halo rows (and, in the zero-pad case, halo
    # cols) to zero. This both protects against the undefined DMA pad
    # fill and implements the conv's zero padding (all pad reads land in
    # the invalid region).
    # Masks are built at the full 3-D tile shape: Mosaic cannot insert a
    # minor dim on an i1 vector (`valid[..., None]` failed to lower for
    # bf16 tiles on hardware, round 3).
    row_l = h * th - ph0 + lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = (row_l >= 0) & (row_l < H_in)
    if not circular_w:
        col_l = -pw0 + lax.broadcasted_iota(jnp.int32, x.shape, 1)
        valid &= (col_l >= 0) & (col_l < W_in)
    x = jnp.where(valid, x, jnp.zeros((), x.dtype))

    # dx outer: each W-shift (a sublane rotation in the (..., W, C) tile
    # layout) is materialized once and reused by all kh row taps; the dy
    # offsets index the outer dim, which costs no lane/sublane shuffle.
    # Circular longitude: the tap shift is a cyclic sublane roll of the
    # full-W tile -- wrap columns come from the tile itself, no halo, no
    # strip-fix convolutions outside.
    acc = jnp.zeros((th * W_out, co_blk), jnp.float32)
    for dx in range(kw):
        if circular_w:
            # static slice+concat roll: pltpu.roll -> tpu.dynamic_rotate
            # is unimplemented for bf16 on hardware (see depthwise_conv)
            xs = _static_roll(x, (pw0 - dx) % W_in, 1)
        else:
            xs = x[:, dx:dx + W_out, :]
        for dy in range(kh):
            a = xs[dy:dy + th].reshape(th * W_out, cin)
            acc = acc + jnp.dot(a, k_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(th, W_out, co_blk).astype(o_ref.dtype)


def _plan(x_shape, k_shape, pads: Pads, itemsize: int,
          circular_w: bool = False) -> Optional[Tuple[int, int]]:
    """Pick (th, co_blk) fitting the VMEM budget, or None (XLA fallback).

    th must divide H_out (ragged H tiles would need high-side Element
    padding beyond the halo; production H_out values 15/30/60/120/240
    are highly composite so this costs nothing).
    """
    B, H_in, W_in, Cin = x_shape
    kh, kw, _, Cout = k_shape
    (ph0, ph1), (pw0, pw1) = pads
    H_out = H_in + ph0 + ph1 - kh + 1
    W_out = W_in + pw0 + pw1 - kw + 1
    if H_out < 1 or W_out < 1:
        return None
    if circular_w and W_out != W_in:
        return None
    bs_w = W_in if circular_w else W_out + kw - 1

    def halo_bytes(th):
        return (th + kh - 1) * bs_w * Cin * itemsize

    th = max((t for t in range(1, H_out + 1)
              if H_out % t == 0 and halo_bytes(t) <= _HALO_BUDGET),
             default=0)
    if th == 0:
        return None
    co_cap = -(-Cout // _LANE) * _LANE
    for co_blk in (512, 384, 256, 128):
        if co_blk > co_cap:
            continue
        w_bytes = kh * kw * Cin * co_blk * itemsize
        acc_bytes = th * W_out * co_blk * 4
        out_bytes = th * W_out * co_blk * itemsize
        total = 2 * halo_bytes(th) + 2 * w_bytes + acc_bytes + 2 * out_bytes
        if total <= _VMEM_BUDGET:
            return th, co_blk
    if co_cap < 128:
        return None
    co_blk = co_cap  # Cout < 128: single ragged block
    w_bytes = kh * kw * Cin * co_blk * itemsize
    total = (2 * halo_bytes(th) + 2 * w_bytes
             + th * W_out * co_blk * (4 + 2 * itemsize))
    return (th, co_blk) if total <= _VMEM_BUDGET else None


def _pallas_dense(x: jnp.ndarray, k: jnp.ndarray, pads: Pads = _NO_PAD, *,
                  circular_w: bool = False,
                  plan: Optional[Tuple[int, int]] = None,
                  interpret: bool = False) -> jnp.ndarray:
    B, H_in, W_in, Cin = x.shape
    kh, kw, _, Cout = k.shape
    (ph0, ph1), (pw0, pw1) = pads
    H_out = H_in + ph0 + ph1 - kh + 1
    W_out = W_in + pw0 + pw1 - kw + 1
    if plan is None:
        plan = _plan(x.shape, k.shape, pads, x.dtype.itemsize, circular_w)
    th, co_blk = plan
    assert H_out % th == 0, (H_out, th)
    assert not circular_w or W_out == W_in, (W_out, W_in)
    nh, nco = H_out // th, -(-Cout // co_blk)
    bs_h = th + kh - 1
    # Mosaic requires every dim of an Element-indexed block to be Element
    # or Squeezed (all-or-none; lowering.py raises otherwise -- caught on
    # hardware, round 3): batch is Squeezed (None), W and Cin are
    # full-size Elements, H is the halo'd Element window.
    if circular_w:
        # full width, no W halo: wrap columns come from the tile itself
        w_dim = pl.Element(W_in)
    else:
        w_dim = pl.Element(W_out + kw - 1, (pw0, max(pw1, kw - 1 - pw0)))

    # Grid order (b, co, h): h fastest, so the weight block is revisited
    # across all H tiles (fetched once per (b, co)) and only the small
    # halo slabs restream when nco > 1.
    return pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, th=th, W_out=W_out,
                          H_in=H_in, W_in=W_in, pads=pads, cin=Cin,
                          co_blk=co_blk, circular_w=circular_w),
        out_shape=jax.ShapeDtypeStruct((B, H_out, W_out, Cout), x.dtype),
        grid=(B, nco, nh),
        in_specs=[
            pl.BlockSpec(
                (None, pl.Element(bs_h, (ph0, max(ph1, kh - 1 - ph0))),
                 w_dim, pl.Element(Cin)),
                lambda b, c, h: (b, h * th, 0, 0)),
            pl.BlockSpec((kh, kw, Cin, co_blk),
                         lambda b, c, h: (0, 0, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, th, W_out, co_blk),
                               lambda b, c, h: (b, h, 0, c)),
        interpret=interpret,
    )(x, k)


def _use_pallas(x_shape, k_shape, pads: Pads, itemsize: int,
                circular_w: bool = False) -> bool:
    if jax.default_backend() != "tpu":
        return False
    kh, kw = k_shape[:2]
    if kh == 1 and kw == 1:
        return False  # 1x1 convs are plain matmuls; XLA is optimal
    return _plan(x_shape, k_shape, pads, itemsize, circular_w) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dense_conv(x: jnp.ndarray, k: jnp.ndarray, pads: Pads = _NO_PAD,
               circular_w: bool = False) -> jnp.ndarray:
    """Dense conv, NHWC; ``k`` is HWIO.

    ``pads`` zero-pads H (and W unless ``circular_w``). With
    ``circular_w=True`` the W taps wrap circularly (sphere longitude
    semantics; requires W pads summing to kw-1 so W_out == W_in) -- in
    the Pallas kernel a cyclic sublane roll of the VMEM-resident tile
    replaces the two wrap strip convolutions of
    ``ops.sphere.sphere_conv2d``.

    Pallas implicit-GEMM fast path on TPU (fp32 accumulation, same
    numerics contract as the conv HLO); XLA conv fallback off-TPU or
    when no tile plan fits VMEM.
    """
    if _use_pallas(x.shape, k.shape, pads, x.dtype.itemsize, circular_w):
        return _pallas_dense(x, k, pads, circular_w=circular_w)
    if circular_w:
        return _xla_dense_circular(x, k, pads)
    return _xla_dense(x, k, pads)


def _fwd(x, k, pads, circular_w):
    return dense_conv(x, k, pads, circular_w), (x, k)


def _bwd(pads, circular_w, res, g):
    x, k = res
    ref = _xla_dense_circular if circular_w else _xla_dense
    _, vjp = jax.vjp(lambda xx, kk: ref(xx, kk, pads), x, k)
    return vjp(g)


dense_conv.defvjp(_fwd, _bwd)


def dense_conv_interpret(x: jnp.ndarray, k: jnp.ndarray,
                         pads: Pads = _NO_PAD,
                         circular_w: bool = False,
                         plan: Optional[Tuple[int, int]] = None
                         ) -> jnp.ndarray:
    """Interpret-mode run of the Pallas kernel (CPU unit tests)."""
    if plan is None:
        kh = k.shape[0]
        (ph0, ph1), _ = pads
        H_out = x.shape[1] + ph0 + ph1 - kh + 1
        th = max(t for t in range(1, H_out + 1) if H_out % t == 0 and t <= 8)
        co_blk = int(k.shape[3])
        plan = (th, co_blk)
    return _pallas_dense(x, jnp.asarray(np.asarray(k)), pads,
                         circular_w=circular_w, plan=plan, interpret=True)
