"""Opt-in int8 (w8a8) quantized matmuls for the DiT inference hot path.

No reference equivalent — the reference runs fp32/bf16 throughout. This is
a TPU-specific acceleration: the v5e MXU has 2x the int8 throughput of
bf16 (394 vs 197 T-ops/s), and the 375M denoiser forward is already near
the bf16 MXU roofline (PERFORMANCE.md), so dynamic int8 quantization of
the transformer-block matmuls is the one remaining large lever on the
north-star rollout.

Scheme (standard dynamic w8a8, per-token x per-channel):
  - activations: symmetric per-row (per-token) int8, scale = amax/127
    computed on the fly in fp32;
  - weights: symmetric per-column (per-output-channel) int8;
  - matmul: int8 x int8 -> int32 via ``lax.dot_general`` with
    ``preferred_element_type=int32`` (lowers onto the int8 MXU path);
  - dequant: fp32 row-scale x col-scale outer product, bias added in fp32,
    result cast back to the activation dtype.

Weight quantization happens inside the jitted forward; weights are loop
invariants of the sampler scan, and even when XLA does not hoist it the
cost is one elementwise pass over the (bf16) params — ~1 ms for the 375M
model at 819 GB/s, negligible against a ~140 ms forward.

Accuracy is NOT exact: per-layer relative error is ~0.3-1%% on Gaussian
activations and compounds over blocks and sampler steps. The path is
opt-in (``LaDCastDiTConfig.int8_matmuls``, default False) and must be
validated on trained weights (latent-trajectory deviation + RMSE/CRPS)
before any production default, exactly like ``correction_skip_period``.

INFERENCE-ONLY: the round()/int8 casts are not differentiable; the
training CLIs reject configs that enable it.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray):
    """Symmetric int8 quantization along the last axis.

    Returns ``(q, scale)`` with ``q`` int8 of x.shape and ``scale`` fp32 of
    x.shape[:-1] + (1,) such that ``q * scale ~= x``. All-zero rows get
    scale 1.0 (q is 0 there, so the round trip is exact).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(xf / scale).astype(jnp.int8)  # |xf/scale| <= 127 by construction
    return q, scale


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``x @ kernel + bias`` with dynamic w8a8 int8 quantization.

    x: (..., K) float; kernel: (K, N) float; bias: (N,) float or None.
    Output dtype follows the flax Dense promotion of (x, kernel, bias).
    """
    out_dtype = jnp.promote_types(x.dtype, kernel.dtype)
    if bias is not None:
        out_dtype = jnp.promote_types(out_dtype, bias.dtype)
    xq, xs = quantize_rows(x)
    # Per-output-channel weight scales: amax over the contraction axis.
    kq_t, ks = quantize_rows(kernel.astype(jnp.float32).T)  # (N, K) int8, (N, 1)
    acc = jax.lax.dot_general(
        xq, kq_t,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)        # (..., N) int32
    out = acc.astype(jnp.float32) * xs * ks[:, 0]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


class QuantizableDense(nn.Module):
    """Drop-in for ``nn.Dense`` with an int8 fast path.

    Parameter names/shapes/initializers are identical to ``nn.Dense``
    (``kernel`` (in, features) lecun-normal, ``bias`` (features,) zeros),
    so checkpoints import/export unchanged regardless of ``quant``. With
    ``quant=False`` the math matches ``nn.Dense(dtype=None)`` exactly
    (promote dtypes, jnp.dot, add bias).
    """

    features: int
    quant: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if self.quant:
            return int8_matmul(x, kernel, bias)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=None)
        y = jnp.dot(x, kernel)
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y
