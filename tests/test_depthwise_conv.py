"""Pallas depthwise-conv kernel: interpret-mode parity vs the XLA
grouped-conv lowering, plus dispatch-guard and gradient wiring.

Real-shape hardware validation lives in scripts/check_kernels_tpu.py
(run on TPU after any ops/pallas change -- CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladcast_tpu.ops.pallas import depthwise_conv as dw


@pytest.mark.parametrize("shape,ksz", [
    ((2, 12, 18, 128), 3),
    ((1, 11, 20, 256), 5),
    ((3, 9, 14, 96), 3),      # C < 128: ragged single channel block
])
def test_interpret_matches_xla(shape, ksz):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(ksz, ksz, shape[-1]), jnp.float32)
    want = dw._xla_depthwise(x, k)
    got = dw.depthwise_valid_conv_interpret(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape,ksz,pads", [
    ((2, 12, 18, 128), 3, ((1, 1), (1, 1))),     # SAME 3x3
    ((1, 11, 20, 160), 5, ((2, 2), (2, 2))),     # SAME 5x5, ragged C
    ((1, 9, 14, 128), 3, ((0, 2), (1, 0))),      # asymmetric pads
])
def test_interpret_same_pad_matches_xla(shape, ksz, pads):
    """v2: zero padding applied inside the kernel on the VMEM tile."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(ksz, ksz, shape[-1]), jnp.float32)
    want = dw._xla_depthwise(x, k, pads)
    got = dw.depthwise_same_conv_interpret(x, k, pads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape,ksz", [
    ((2, 12, 18, 128), 3),
    ((1, 11, 20, 160), 5),    # ragged C
])
def test_interpret_circular_w_matches_xla(shape, ksz):
    """circular_w: wrap columns from cyclic rolls of the tile."""
    rng = np.random.RandomState(5)
    p = ksz // 2
    pads = ((p, p), (p, p))
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(ksz, ksz, shape[-1]), jnp.float32)
    want = dw._xla_depthwise_circular(x, k, pads)
    got = dw.depthwise_same_conv_interpret(x, k, pads, circular_w=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_circular_gradients_match_xla_composition():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 8, 12, 64), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 64), jnp.float32)
    pads = ((1, 1), (1, 1))
    gx, gk = jax.grad(
        lambda x, k: (dw.depthwise_same_conv(x, k, pads, True) ** 2).sum(),
        argnums=(0, 1))(x, k)
    rx, rk = jax.grad(
        lambda x, k: (dw._xla_depthwise_circular(x, k, pads) ** 2).sum(),
        argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               atol=1e-4, rtol=1e-4)


def test_dispatch_falls_back_off_tpu():
    # CPU backend in the test env: the public entry point must route to
    # the XLA lowering and still be exactly correct
    assert jax.default_backend() == "cpu"
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 16, 160), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 160), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dw.depthwise_valid_conv(x, k)),
        np.asarray(dw._xla_depthwise(x, k)), atol=1e-6, rtol=1e-6)
    pads = ((1, 1), (1, 1))
    np.testing.assert_allclose(
        np.asarray(dw.depthwise_same_conv(x, k, pads)),
        np.asarray(dw._xla_depthwise(x, k, pads)), atol=1e-6, rtol=1e-6)


def test_gradients_match_xla_composition():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 12, 64), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 64), jnp.float32)
    pads = ((1, 1), (1, 1))

    def loss_fast(x, k):
        return (dw.depthwise_same_conv(x, k, pads) ** 2).sum()

    def loss_ref(x, k):
        return (dw._xla_depthwise(x, k, pads) ** 2).sum()

    gx, gk = jax.grad(loss_fast, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               atol=1e-4, rtol=1e-4)


def test_sphere_conv_depthwise_path_unchanged():
    """The sphere_conv2d depthwise output is identical whichever backend
    branch runs (on CPU this pins the composition; the TPU Pallas branch
    is pinned by check_kernels_tpu.py at production shapes)."""
    from ladcast_tpu.ops.sphere import (
        sphere_conv2d,
        sphere_conv2d_reference_3slice,
    )

    rng = np.random.RandomState(3)
    C = 160
    x = jnp.asarray(rng.randn(2, 10, 16, C), jnp.float32)
    k = jnp.asarray(rng.randn(5, 5, 1, C), jnp.float32)
    b = jnp.asarray(rng.randn(C), jnp.float32)
    got = sphere_conv2d(x, k, b, groups=C)
    want = sphere_conv2d_reference_3slice(x, k, b, groups=C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
