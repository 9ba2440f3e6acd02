"""Pallas implicit-GEMM dense conv (ops/pallas/dense_conv.py).

Interpret-mode correctness on CPU; real-shape hardware validation lives
in scripts/check_kernels_tpu.py (interpret mode cannot catch Mosaic
lowering/grid bugs -- see CLAUDE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladcast_tpu.ops.pallas import dense_conv as dc


@pytest.mark.parametrize("shape,cout,ksz,pads", [
    ((2, 12, 18, 16), 24, 3, ((1, 1), (1, 1))),    # SAME 3x3
    ((1, 15, 30, 12), 20, 3, ((1, 1), (1, 1))),    # ragged-ish dims
    ((1, 12, 10, 8), 10, 5, ((2, 2), (2, 2))),     # SAME 5x5
    ((1, 10, 14, 6), 9, 3, ((0, 2), (1, 0))),      # asymmetric pads
    ((2, 9, 11, 4), 7, 3, ((0, 0), (0, 0))),       # VALID
])
def test_interpret_matches_xla(shape, cout, ksz, pads):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(ksz, ksz, shape[-1], cout), jnp.float32) * 0.2
    want = dc._xla_dense(x, k, pads)
    got = dc.dense_conv_interpret(x, k, pads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_interpret_ragged_cout_blocks():
    # co_blk smaller than Cout with a ragged final block: garbage
    # accumulator columns must be dropped on the masked write
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 10, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 22), jnp.float32) * 0.2
    pads = ((1, 1), (1, 1))
    want = dc._xla_dense(x, k, pads)
    got = dc.dense_conv_interpret(x, k, pads, plan=(4, 8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_plan_production_shapes():
    """Every DCAE decoder main conv must get a VMEM-feasible plan with
    th dividing H_out (bf16 itemsize 2)."""
    shapes = [  # (x_shape, cout, ksz) -- B=20 decode chunk
        ((20, 15, 30, 84), 1008, 3),     # conv_in
        ((20, 15, 30, 1008), 2016, 3),   # DCUp1
        ((20, 30, 60, 504), 2016, 3),    # DCUp2
        ((20, 60, 120, 504), 504, 3),    # ResBlock convs
        ((20, 60, 120, 504), 1008, 3),   # DCUp3
        ((20, 120, 240, 252), 252, 3),   # ResBlock convs
        ((20, 120, 240, 252), 89, 3),    # conv_out
    ]
    for x_shape, cout, ksz in shapes:
        p = ksz // 2
        pads = ((p, p), (p, p))
        k_shape = (ksz, ksz, x_shape[-1], cout)
        plan = dc._plan(x_shape, k_shape, pads, 2)
        assert plan is not None, (x_shape, cout)
        th, co_blk = plan
        assert x_shape[1] % th == 0 and co_blk % 128 == 0 or co_blk >= cout


@pytest.mark.parametrize("shape,cout,ksz", [
    ((2, 12, 18, 16), 24, 3),
    ((1, 12, 10, 8), 10, 5),
])
def test_interpret_circular_w_matches_xla(shape, cout, ksz):
    """circular_w: wrap columns come from cyclic rolls of the tile."""
    rng = np.random.RandomState(5)
    p = ksz // 2
    pads = ((p, p), (p, p))
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(ksz, ksz, shape[-1], cout), jnp.float32) * 0.2
    want = dc._xla_dense_circular(x, k, pads)
    got = dc.dense_conv_interpret(x, k, pads, circular_w=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_circular_equals_zeropad_plus_wrap_fixes():
    """The algebra sphere_conv2d's circular fast path relies on: a
    circular-W conv == zero-pad conv + the two wrap strip fixes (the
    pole corrections are identical in both formulations)."""
    from ladcast_tpu.ops.sphere import _conv_nhwc
    rng = np.random.RandomState(6)
    for ksz in (3, 5):
        p = ksz // 2
        x = jnp.asarray(rng.randn(1, 10, 16, 6), jnp.float32)
        k = jnp.asarray(rng.randn(ksz, ksz, 6, 8), jnp.float32)
        W = x.shape[2]
        out = _conv_nhwc(x, k, 1, padding=((p, p), (p, p)))
        left = _conv_nhwc(x[:, :, W - p:], k[:, :p], 1,
                          padding=((p, p), (0, p - 1)))
        right = _conv_nhwc(x[:, :, :p], k[:, p + 1:], 1,
                           padding=((p, p), (p - 1, 0)))
        out = out.at[:, :, :p].add(left).at[:, :, W - p:].add(right)
        circ = dc._xla_dense_circular(x, k, ((p, p), (p, p)))
        np.testing.assert_allclose(np.asarray(circ), np.asarray(out),
                                   atol=1e-5, rtol=1e-5)


def test_circular_gradients_match_xla_composition():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 8, 12, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 16), jnp.float32)
    pads = ((1, 1), (1, 1))
    gx, gk = jax.grad(
        lambda x, k: (dc.dense_conv(x, k, pads, True) ** 2).sum(),
        argnums=(0, 1))(x, k)
    rx, rk = jax.grad(
        lambda x, k: (dc._xla_dense_circular(x, k, pads) ** 2).sum(),
        argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               atol=1e-4, rtol=1e-4)


def test_dispatch_falls_back_off_tpu():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 10, 12, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 16), jnp.float32)
    pads = ((1, 1), (1, 1))
    assert not dc._use_pallas(x.shape, k.shape, pads, 4)  # CPU backend
    np.testing.assert_allclose(
        np.asarray(dc.dense_conv(x, k, pads)),
        np.asarray(dc._xla_dense(x, k, pads)), atol=1e-6, rtol=1e-6)


def test_gradients_match_xla_composition():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 12, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 16), jnp.float32)
    pads = ((1, 1), (1, 1))

    def loss_fast(x, k):
        return (dc.dense_conv(x, k, pads) ** 2).sum()

    def loss_ref(x, k):
        return (dc._xla_dense(x, k, pads) ** 2).sum()

    gx, gk = jax.grad(loss_fast, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               atol=1e-4, rtol=1e-4)


def test_sphere_conv_dense_optin_cpu_exact(monkeypatch):
    """With LADCAST_PALLAS_DENSE=1 on CPU the dispatcher must still route
    to XLA (no TPU) and stay exact through sphere_conv2d."""
    from ladcast_tpu.ops import sphere
    monkeypatch.setenv("LADCAST_PALLAS_DENSE", "1")
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 12, 24, 6), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 6, 10), jnp.float32)
    want = sphere.sphere_conv2d_reference_3slice(x, k)
    got = sphere.sphere_conv2d(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
