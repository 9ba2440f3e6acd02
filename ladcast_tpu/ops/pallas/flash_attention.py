"""Flash attention (non-causal) as a Pallas TPU kernel.

Replaces the reference's ``F.scaled_dot_product_attention`` hot spot
(LaDCast_3D_model.py:199-201; SURVEY.md section 2.3 item 1) for the DiT's
joint attention: <= ~2.3k tokens, head_dim 128. Online-softmax tiling keeps
the (S x S) logit matrix out of HBM; per grid step the kernel holds one
query block and streams key/value blocks through VMEM.

The caller-facing layout is BSHD; internally (batch, heads) fold into one
leading grid dimension so block shapes satisfy the Mosaic (8, 128)
trailing-dims tiling rule.

The backward pass delegates to the XLA attention VJP (training uses the
XLA path anyway; this keeps autodiff correct if a trainer is configured
with the pallas impl).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_true: int,
               block_k: int):
    # q_ref: (1, Bq, D); k_ref/v_ref: (1, S_pad, D); o_ref like q_ref
    q = q_ref[0].astype(jnp.float32) * scale                  # (Bq, D)
    bq, d = q.shape
    s_pad = k_ref.shape[1]
    num_kb = s_pad // block_k

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (Bq, Bk)
        col = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        logits = jnp.where(col < s_true, logits, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pad_seq(x, s_pad):
    pad = s_pad - x.shape[1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


def _flash_attention_impl(q, k, v, block_q: int = 256, block_k: int = 512):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    scale = 1.0 / (D ** 0.5)

    def fold(x):  # BSHD -> (B*H, S, D)
        return x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], D)

    qf, kf, vf = fold(q), fold(k), fold(v)

    block_q = min(block_q, -(-Sq // 128) * 128)
    block_k = min(block_k, -(-Sk // 128) * 128)
    sq_pad = -(-Sq // block_q) * block_q
    sk_pad = -(-Sk // block_k) * block_k

    qf = _pad_seq(qf, sq_pad)
    kf = _pad_seq(kf, sk_pad)
    vf = _pad_seq(vf, sk_pad)

    grid = (B * H, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, s_true=Sk,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((B * H, sq_pad, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(qf, kf, vf)
    out = out[:, :Sq]  # (B*H, Sq, D)
    return out.reshape(B, H, Sq, D).transpose(0, 2, 1, 3)


def _xla_attention(q, k, v):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@jax.custom_vjp
def flash_attention(q, k, v):
    return _flash_attention_impl(q, k, v)


def _fa_fwd(q, k, v):
    return _flash_attention_impl(q, k, v), (q, k, v)


def _fa_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
