"""Scaled dot-product attention with selectable backend.

The reference leans on ``F.scaled_dot_product_attention`` over <=2250-token
joint sequences (LaDCast_3D_model.py:199-201). Here the canonical layout is
BSHD (batch, seq, heads, head_dim) -- the layout XLA:TPU fuses best -- with
three interchangeable implementations:

  - "xla":    einsum + softmax, always available, autodiff-friendly.
  - "cudnn"-style fused: ``jax.nn.dot_product_attention`` where supported.
  - "pallas": custom flash-attention kernel
    (:mod:`ladcast_tpu.ops.pallas.flash_attention`), used on TPU for the
    inference hot loop.

``impl='auto'`` picks pallas on TPU when shapes qualify, else xla.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _default_backend() -> str:
    try:
        return "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    except Exception:
        return "xla"


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Non-causal SDPA. q/k/v: (B, S, H, D); bias broadcastable to
    (B, H, Sq, Sk), added to logits (torch float attn_mask semantics).
    Softmax statistics are computed in fp32 regardless of input dtype.
    """
    if impl == "auto":
        impl = _default_backend()
        if impl == "pallas" and (bias is not None or q.shape[-1] > 256):
            impl = "xla"
    if impl == "pallas":
        try:
            from ladcast_tpu.ops.pallas.flash_attention import flash_attention
            return flash_attention(q, k, v)
        except (ImportError, NotImplementedError):
            impl = "xla"
    if impl == "xla":
        scale = 1.0 / (q.shape[-1] ** 0.5)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            logits = logits + bias.astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    raise ValueError(f"unknown attention impl {impl!r}")


def norm_rope_attention(q, k, v, qcos, qsin, qw, kcos, ksin, kw,
                        bias=None, impl: str = "auto",
                        norm_eps: float = 1e-7):
    """RMS-norm(Q,K) -> rotary -> attention, the DiT's attention primitive.

    Fused Pallas kernel on TPU; XLA composite elsewhere (and whenever an
    additive bias is requested -- the pallas path has no bias support).
    See ops/pallas/flash_attention.py for table semantics.
    """
    from ladcast_tpu.ops.pallas.flash_attention import (
        fused_norm_rope_attention,
        xla_norm_rope_attention,
    )

    if impl == "auto":
        impl = _default_backend()
    if impl == "pallas" and bias is None and q.shape[-1] % 128 == 0:
        return fused_norm_rope_attention(q, k, v, qcos, qsin, qw, kcos,
                                         ksin, kw, norm_eps)
    return xla_norm_rope_attention(q, k, v, qcos, qsin, qw, kcos, ksin, kw,
                                   norm_eps, bias=bias)
