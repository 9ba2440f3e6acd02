"""Frozen-output regression tests: tiny DCAE and DiT forwards with fixed
seeds must reproduce the recorded fixtures bit-for-tolerance. Protects
against silent numerics drift during refactors (the golden-tensor role
SURVEY.md section 4 calls for)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.models.dcae import AutoencoderDC
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from tests.test_dcae import TINY as TINY_DCAE
from tests.test_dit import TINY as TINY_DIT

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "regression_tiny.npz")


def test_dcae_regression():
    fx = np.load(FIX)
    rng = np.random.RandomState(0)
    dcae = AutoencoderDC(TINY_DCAE)
    x = jnp.asarray(rng.randn(1, 16, 32, 8), jnp.float32)
    st = jnp.asarray(rng.randn(16, 32, 1), jnp.float32)
    p = dcae.init(jax.random.PRNGKey(0), x, st)
    z = dcae.apply(p, x, st, method=AutoencoderDC.encode)
    y = dcae.apply(p, z, method=AutoencoderDC.decode)
    np.testing.assert_allclose(np.asarray(z), fx["dcae_z"], rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), fx["dcae_y"], rtol=2e-4,
                               atol=2e-5)


def test_dit_regression():
    fx = np.load(FIX)
    rng = np.random.RandomState(0)
    rng.randn(1, 16, 32, 8)  # keep the RNG stream aligned with generation
    rng.randn(16, 32, 1)
    dit = LaDCastTransformer3D(TINY_DIT)
    lat = jnp.asarray(rng.randn(2, 3, 4, 6, 6), jnp.float32)
    cond = jnp.asarray(rng.randn(2, 1, 4, 6, 6), jnp.float32)
    cn = jnp.asarray(rng.randn(2), jnp.float32)
    yp = jnp.asarray(rng.rand(2), jnp.float32)
    p = dit.init(jax.random.PRNGKey(0), lat, cn, cond, yp)
    out = dit.apply(p, lat, cn, cond, yp)
    np.testing.assert_allclose(np.asarray(out), fx["dit_out"], rtol=3e-4,
                               atol=3e-5)
