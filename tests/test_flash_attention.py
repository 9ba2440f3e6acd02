"""Pallas attention kernels vs the XLA composites (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladcast_tpu.ops.attention import dot_product_attention


def _ref(q, k, v):
    return np.asarray(dot_product_attention(q, k, v, impl="xla"))


@pytest.mark.parametrize("B,S,H,D", [(1, 128, 2, 128), (2, 300, 1, 128)])
def test_flash_matches_xla_interpret(B, S, H, D):
    from jax.experimental.pallas import tpu as pltpu
    from ladcast_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fa.flash_attention(q, k, v))
    want = _ref(q, k, v)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("B,Sq,Sk,H,D", [(1, 130, 130, 2, 128),
                                         (1, 260, 150, 1, 128)])
def test_fused_norm_rope_attention_interpret(B, Sq, Sk, H, D):
    """Fused kernel == XLA composite, including segment tables with an
    un-rotated tail (the dual-stream conditioning case)."""
    from jax.experimental.pallas import tpu as pltpu
    from ladcast_tpu.ops import rope as rope_ops
    from ladcast_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, Sq, H, D).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(B, Sk, H, D).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(B, Sk, H, D).astype(np.float32))

    n_rot_q, n_rot_k = Sq - 20, Sk - 20
    cos_q, sin_q = rope_ops.rotary_tables_1d(D, np.arange(n_rot_q), 256.0)
    cos_k, sin_k = rope_ops.rotary_tables_1d(D, np.arange(n_rot_k), 256.0)

    def seg_tables(n_rot, n_tot, cos, sin, w1, w2):
        c = np.concatenate([cos, np.ones((n_tot - n_rot, D), np.float32)])
        s = np.concatenate([sin, np.zeros((n_tot - n_rot, D), np.float32)])
        w = np.concatenate([np.broadcast_to(w1, (n_rot, D)),
                            np.broadcast_to(w2, (n_tot - n_rot, D))])
        return jnp.asarray(c), jnp.asarray(s), jnp.asarray(w)

    w_a = rng.rand(D).astype(np.float32) + 0.5
    w_b = rng.rand(D).astype(np.float32) + 0.5
    qcos, qsin, qw = seg_tables(n_rot_q, Sq, cos_q, sin_q, w_a, w_b)
    kcos, ksin, kw = seg_tables(n_rot_k, Sk, cos_k, sin_k, w_a, w_b)

    want = np.asarray(fa.xla_norm_rope_attention(
        q, k, v, qcos, qsin, qw, kcos, ksin, kw, 1e-7))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fa.fused_norm_rope_attention(
            q, k, v, qcos, qsin, qw, kcos, ksin, kw, 1e-7))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_fused_backward_matches_composite_grad():
    from ladcast_tpu.ops.pallas import flash_attention as fa
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(2)
    B, S, H, D = 1, 8, 1, 128
    q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    cos = jnp.ones((S, D)); sin = jnp.zeros((S, D)); w = jnp.ones((S, D))

    def loss_fused(q):
        return jnp.sum(fa.fused_norm_rope_attention(
            q, k, v, cos, sin, w, cos, sin, w, 1e-7) ** 2)

    def loss_ref(q):
        return jnp.sum(fa.xla_norm_rope_attention(
            q, k, v, cos, sin, w, cos, sin, w, 1e-7) ** 2)

    fa.BWD_MODE = "pallas"  # exercise the flash backward kernels
    try:
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_fused)(q)
    finally:
        fa.BWD_MODE = "auto"
    g2 = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)


def test_fused_backward_all_grads_with_segments():
    """Pallas flash backward vs the XLA composite VJP for ALL
    differentiable inputs (q/k/v and the norm-weight tables), with a
    rotated + un-rotated segment layout (the dual-stream case) and
    sequence lengths that exercise block padding."""
    from jax.experimental.pallas import tpu as pltpu
    from ladcast_tpu.ops import rope as rope_ops
    from ladcast_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(3)
    B, Sq, Sk, H, D = 2, 200, 170, 2, 128
    q = jnp.asarray(rng.randn(B, Sq, H, D).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(B, Sk, H, D).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(B, Sk, H, D).astype(np.float32))

    cos_q, sin_q = rope_ops.rotary_tables_1d(D, np.arange(Sq - 30), 256.0)
    cos_k, sin_k = rope_ops.rotary_tables_1d(D, np.arange(Sk - 30), 256.0)
    qcos = jnp.asarray(np.concatenate(
        [cos_q, np.ones((30, D), np.float32)]))
    qsin = jnp.asarray(np.concatenate(
        [sin_q, np.zeros((30, D), np.float32)]))
    kcos = jnp.asarray(np.concatenate(
        [cos_k, np.ones((30, D), np.float32)]))
    ksin = jnp.asarray(np.concatenate(
        [sin_k, np.zeros((30, D), np.float32)]))
    qw = jnp.asarray(np.broadcast_to(
        rng.rand(D).astype(np.float32) + 0.5, (Sq, D)).copy())
    kw = jnp.asarray(np.broadcast_to(
        rng.rand(D).astype(np.float32) + 0.5, (Sk, D)).copy())

    def loss(fn, q, k, v, qw, kw):
        out = fn(q, k, v, qcos, qsin, qw, kcos, ksin, kw, 1e-7)
        return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

    fa.BWD_MODE = "pallas"  # exercise the flash backward kernels
    try:
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(
                lambda *a: loss(fa.fused_norm_rope_attention, *a),
                argnums=(0, 1, 2, 3, 4))(q, k, v, qw, kw)
    finally:
        fa.BWD_MODE = "auto"
    g2 = jax.grad(lambda *a: loss(fa.xla_norm_rope_attention, *a),
                  argnums=(0, 1, 2, 3, 4))(q, k, v, qw, kw)
    for a, b, name in zip(g1, g2, ("dq", "dk", "dv", "dqw", "dkw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_preprocess_tail_coverage_nondivisible_pad():
    """Regression (round-2 hardware NaN): with a wide block_k, sk_pad can
    be a non-multiple of the K-preprocess pass block; the pass grid
    (S // block) then left a raw un-normed/un-rotated K tail, corrupting
    attention for the final positions (data-dependent up to NaN on TPU).
    S=600 pads to 640 under the wide-block default and exercises exactly
    that path; the clamp in _preprocess_packed must keep full coverage."""
    from jax.experimental.pallas import tpu as pltpu
    from ladcast_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(0)
    B, S, H, D = 1, 600, 2, 128
    q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    cos = jnp.asarray(rng.rand(S, D).astype(np.float32))
    sin = jnp.asarray(rng.rand(S, D).astype(np.float32))
    w = jnp.asarray(rng.rand(S, D).astype(np.float32) + 0.5)

    with pltpu.force_tpu_interpret_mode():
        out = fa._fused_impl(q, k, v, cos, sin, w, cos, sin, w, 1e-7)
    ref = fa._xla_composite(q, k, v, cos, sin, w, cos, sin, w, 1e-7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
