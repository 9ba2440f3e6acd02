"""DCAE structure and smoke tests.

Numerics run on a tiny config (1-CPU test budget); the production config
is validated structurally through jax.eval_shape (zero FLOPs).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.models.dcae import AutoencoderDC

TINY = DCAEConfig(
    in_channels=9,
    out_channels=9,
    latent_channels=4,
    attention_head_dim=4,
    encoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock", "EfficientViTBlock"),
    decoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock", "EfficientViTBlock"),
    encoder_block_out_channels=(8, 16, 16, 32),
    decoder_block_out_channels=(8, 16, 16, 32),
    encoder_layers_per_block=(1, 1, 1, 1),
    decoder_layers_per_block=(1, 1, 1, 1),
    encoder_qkv_multiscales=((), (), (5,), (5,)),
    decoder_qkv_multiscales=((), (), (5,), (5,)),
    static_channels=1,
)


def test_tiny_roundtrip_shapes_and_finiteness():
    model = AutoencoderDC(TINY)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 32, 8), jnp.float32)
    static = jnp.ones((16, 32, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, static)

    z = model.apply(params, x, static, method=AutoencoderDC.encode)
    assert z.shape == (2, 2, 4, 4)  # 8x spatial compression, 4 latent ch
    y = model.apply(params, z, method=AutoencoderDC.decode)
    assert y.shape == (2, 16, 32, 8)  # static channel stripped
    y_full = model.apply(params, z, True, method=AutoencoderDC.decode)
    assert y_full.shape == (2, 16, 32, 9)
    assert np.isfinite(np.asarray(y)).all()


def test_production_config_structure():
    cfg = DCAEConfig()
    model = AutoencoderDC(cfg)
    x = jax.ShapeDtypeStruct((1, 120, 240, 84), jnp.float32)
    static = jax.ShapeDtypeStruct((120, 240, 5), jnp.float32)
    params_shape = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, static)

    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree.leaves(params_shape))
    # Encoder conv_in: 89 -> 252 3x3 (+bias)
    enc = params_shape["params"]["encoder"]
    assert enc["conv_in"]["kernel"].shape == (3, 3, 89, 252)
    assert enc["conv_out"]["kernel"].shape == (3, 3, 1008, 84)
    dec = params_shape["params"]["decoder"]
    assert dec["conv_in"]["kernel"].shape == (3, 3, 84, 1008)
    assert dec["conv_out"]["kernel"].shape == (3, 3, 252, 89)
    # Stage structure: 4 blocks + downsample in stages 0-2, 4 blocks in 3.
    assert "down_blocks_18" in enc and "down_blocks_19" not in enc
    assert "up_blocks_18" in dec and "up_blocks_19" not in dec
    assert 50e6 < n_params < 1e9, n_params

    z = jax.eval_shape(
        lambda p, a, s: model.apply(p, a, s, method=AutoencoderDC.encode),
        params_shape, x, static)
    assert z.shape == (1, 15, 30, 84)
