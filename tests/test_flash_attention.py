"""Pallas flash attention vs XLA attention (interpreter mode on CPU)."""

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
