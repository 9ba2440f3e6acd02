"""LaDCast DiT structure and smoke tests (tiny config for the 1-CPU
budget; the 375M config is validated via eval_shape)."""

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import LaDCastDiTConfig, ladcast_375m_config
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D

TINY = LaDCastDiTConfig(
    in_channels=6,
    out_channels=6,
    num_attention_heads=2,
    attention_head_dim=16,
    num_layers=1,
    num_single_layers=1,
    num_refiner_layers=1,
    mlp_ratio=2.0,
    rope_axes_dim=(4, 6, 6),
    conditioning_tensor_rope_axes_dim=(4, 6, 6),
    conditioning_tensor_in_channels=6,
    attention_impl="xla",
)


def _tiny_inputs(B=2, T=3, Tin=1, H=4, W=6, C=6):
    rng = np.random.RandomState(0)
    lat = jnp.asarray(rng.randn(B, T, H, W, C), jnp.float32)
    cond = jnp.asarray(rng.randn(B, Tin, H, W, C), jnp.float32)
    c_noise = jnp.asarray(rng.randn(B), jnp.float32)
    yp = jnp.asarray(rng.rand(B), jnp.float32)
    return lat, cond, c_noise, yp


def test_tiny_forward():
    model = LaDCastTransformer3D(TINY)
    lat, cond, c_noise, yp = _tiny_inputs()
    params = model.init(jax.random.PRNGKey(0), lat, c_noise, cond, yp)
    out = model.apply(params, lat, c_noise, cond, yp)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()

    # Year progress changes the output (FiLM path active).
    out2 = model.apply(params, lat, c_noise, cond, yp + 0.3)
    assert not np.allclose(np.asarray(out), np.asarray(out2))

    # Scalar c_noise broadcasting (sampler passes shape-(1,) c_noise).
    out3 = model.apply(params, lat, c_noise[:1] * 0 + c_noise[0], cond, yp)
    assert out3.shape == lat.shape


def test_375m_param_count():
    cfg = ladcast_375m_config()
    model = LaDCastTransformer3D(cfg)
    lat = jax.ShapeDtypeStruct((1, 4, 15, 30, 84), jnp.float32)
    cond = jax.ShapeDtypeStruct((1, 1, 15, 30, 84), jnp.float32)
    cn = jax.ShapeDtypeStruct((1,), jnp.float32)
    yp = jax.ShapeDtypeStruct((1,), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), lat, cn, cond, yp)
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(shapes))
    # "375M" model: expect 300M..450M parameters.
    assert 3.0e8 < n < 4.5e8, n


def test_1p6b_param_count():
    from ladcast_tpu.config import ladcast_1p6b_config
    cfg = ladcast_1p6b_config()
    model = LaDCastTransformer3D(cfg)
    lat = jax.ShapeDtypeStruct((1, 4, 15, 30, 84), jnp.float32)
    cond = jax.ShapeDtypeStruct((1, 1, 15, 30, 84), jnp.float32)
    cn = jax.ShapeDtypeStruct((1,), jnp.float32)
    yp = jax.ShapeDtypeStruct((1,), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), lat, cn, cond, yp)
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(shapes))
    assert 1.3e9 < n < 2.0e9, n
