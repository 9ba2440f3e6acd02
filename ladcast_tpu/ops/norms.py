"""Normalization primitives as pure functions.

Formula-exact ports of the diffusers norm layers the reference depends on
(SURVEY.md "hard parts": diffusers-free reimplementation):

  - rms_norm: diffusers.models.normalization.RMSNorm -- variance in fp32,
    optional affine weight/bias.
  - layer_norm: torch.nn.LayerNorm semantics (biased variance).
  - fp32 variants compute statistics in float32 and cast back.

Epsilons used by the reference models:
  ResBlock/Sana norm_out rms: 1e-5 (diffusers get_normalization default)
  GLUMBConv / decoder norm_out rms: 1e-7
  DiT LayerNorms: 1e-7 (refiner) and 1e-6 (AdaLN-Zero internals)
  AdaLayerNormZeroSingle4Sana FP32LayerNorm: 1e-15
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray], eps: float,
             bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """RMS norm over the last axis, variance computed in fp32
    (diffusers RMSNorm.forward)."""
    dtype = x.dtype
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = x * (1.0 / jnp.sqrt(var + eps))
    if weight is not None:
        if weight.dtype in (jnp.float16, jnp.bfloat16):
            y = y.astype(weight.dtype)
        y = y * weight
        if bias is not None:
            y = y + bias
    else:
        y = y.astype(dtype)
    return y


def layer_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray],
               bias: Optional[jnp.ndarray], eps: float,
               fp32: bool = False) -> jnp.ndarray:
    """LayerNorm over the last axis (biased variance, torch semantics).

    With ``fp32=True`` statistics AND affine are applied in float32 and the
    result is cast back (diffusers FP32LayerNorm)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32) if fp32 else x
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    if weight is not None:
        w = weight.astype(jnp.float32) if fp32 else weight
        y = y * w
    if bias is not None:
        b = bias.astype(jnp.float32) if fp32 else bias
        y = y + b
    return y.astype(dtype) if fp32 else y
