"""Full-model DCAE parity against the ACTUAL reference implementation
(/root/reference/ladcast/models/DCAE.py loaded via the diffusers shim).

Verifies encode (static concat, down stages, out-shortcut), decode
(in-shortcut, up stages, static strip) and the EfficientViT internals
(SANA multiscale linear attention incl. the channel-regroup quirk,
GLUMBConv) end-to-end, with weights imported through the production
``convert_dcae_state_dict`` converter.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ladcast_tpu.config import DCAEConfig  # noqa: E402
from ladcast_tpu.models.dcae import AutoencoderDC  # noqa: E402
from ladcast_tpu.models.weight_import import convert_dcae_state_dict  # noqa: E402
from tests.oracles.refload import load_reference, state_dict_numpy  # noqa: E402

B, H, W = 2, 16, 24  # deepest stage 4x6 (5x5 multiscale kernel needs >=3 rows)
DYN, STATIC = 6, 2


def _tiny_pair(seed=0):
    ref_mod = load_reference("ladcast.models.DCAE")
    torch.manual_seed(seed)
    common = dict(
        in_channels=DYN + STATIC,
        latent_channels=4,
        attention_head_dim=4,
        static_channels=STATIC,
    )
    ref = ref_mod.AutoencoderDC(
        out_channels=None,
        encoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock"),
        decoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock"),
        encoder_block_out_channels=(8, 16, 32),
        decoder_block_out_channels=(8, 16, 32),
        encoder_layers_per_block=(1, 1, 1),
        decoder_layers_per_block=(1, 1, 1),
        encoder_qkv_multiscales=((), (), (5,)),
        decoder_qkv_multiscales=((), (), (5,)),
        decoder_norm_types="rms_norm",
        decoder_act_fns="silu",
        **common)
    ref.eval()

    cfg = DCAEConfig(
        out_channels=DYN + STATIC,
        encoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock"),
        decoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock"),
        encoder_block_out_channels=(8, 16, 32),
        decoder_block_out_channels=(8, 16, 32),
        encoder_layers_per_block=(1, 1, 1),
        decoder_layers_per_block=(1, 1, 1),
        encoder_qkv_multiscales=((), (), (5,)),
        decoder_qkv_multiscales=((), (), (5,)),
        decoder_norm_types=("rms_norm",) * 3,
        decoder_act_fns=("silu",) * 3,
        **common)
    model = AutoencoderDC(cfg)
    return ref, model, cfg


def test_full_dcae_parity():
    ref, model, cfg = _tiny_pair()
    rng = np.random.RandomState(0)
    x = rng.randn(B, DYN, H, W).astype(np.float32)
    static = rng.randn(B, STATIC, H, W).astype(np.float32)

    with torch.no_grad():
        want_z = ref.encode(
            torch.from_numpy(x), return_dict=False,
            static_conditioning_tensor=torch.from_numpy(static))[0].numpy()
        want_y = ref.decode(torch.from_numpy(want_z),
                            return_dict=False)[0].numpy()
        want_full = ref(torch.from_numpy(x), return_dict=False,
                        static_conditioning_tensor=torch.from_numpy(static),
                        return_static=True)[0].numpy()

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    st_j = jnp.asarray(static.transpose(0, 2, 3, 1))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x_j, st_j))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = jax.tree.map(jnp.asarray,
                          convert_dcae_state_dict(state_dict_numpy(ref),
                                                  template))

    got_z = model.apply(params, x_j, st_j, method=AutoencoderDC.encode)
    np.testing.assert_allclose(np.asarray(got_z).transpose(0, 3, 1, 2),
                               want_z, atol=1e-4, rtol=1e-4)

    got_y = model.apply(params, got_z, method=AutoencoderDC.decode)
    np.testing.assert_allclose(np.asarray(got_y).transpose(0, 3, 1, 2),
                               want_y, atol=1e-4, rtol=1e-4)

    got_full = model.apply(params, x_j, st_j, return_static=True)
    np.testing.assert_allclose(np.asarray(got_full).transpose(0, 3, 1, 2),
                               want_full, atol=1e-4, rtol=1e-4)


def test_dcae_v2_options_parity():
    """The v2 (Ray trainer) variant's configurable shortcuts/activation
    (DCAE_new.py:798-800) against the actual DCAE_new module."""
    ref_mod = load_reference("ladcast.models.DCAE_new")
    torch.manual_seed(1)
    shape_kw = dict(
        encoder_block_types=("ResBlock", "EfficientViTBlock"),
        decoder_block_types=("ResBlock", "EfficientViTBlock"),
        encoder_block_out_channels=(8, 16),
        decoder_block_out_channels=(8, 16),
        encoder_layers_per_block=(1, 1),
        decoder_layers_per_block=(1, 1),
        encoder_qkv_multiscales=((), (5,)),
        decoder_qkv_multiscales=((), (5,)),
        attention_head_dim=4, latent_channels=4)
    ref = ref_mod.AutoencoderDC(
        in_channels=DYN + STATIC, out_channels=None,
        decoder_norm_types="rms_norm", decoder_act_fns="silu",
        static_channels=STATIC, encoder_out_shortcut=False,
        decoder_in_shortcut=False, decoder_conv_act_fn="silu", **shape_kw)
    ref.eval()
    cfg = DCAEConfig(
        in_channels=DYN + STATIC, out_channels=DYN + STATIC,
        decoder_norm_types=("rms_norm",) * 2, decoder_act_fns=("silu",) * 2,
        static_channels=STATIC, encoder_out_shortcut=False,
        decoder_in_shortcut=False, decoder_conv_act_fn="silu", **shape_kw)
    model = AutoencoderDC(cfg)

    rng = np.random.RandomState(1)
    x = rng.randn(B, DYN, H, W).astype(np.float32)
    static = rng.randn(B, STATIC, H, W).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), return_dict=False,
                   static_conditioning_tensor=torch.from_numpy(static))[0].numpy()

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    st_j = jnp.asarray(static.transpose(0, 2, 3, 1))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x_j, st_j))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = jax.tree.map(jnp.asarray,
                          convert_dcae_state_dict(state_dict_numpy(ref),
                                                  template))
    got = model.apply(params, x_j, st_j)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4, rtol=1e-4)


def test_decode_latent_ens_parity():
    """Run the ACTUAL reference decode_latent_ens (pipelines/utils.py:
    51-80) as the oracle for the decode tail: physical-scale latents in,
    PHYSICAL fields out (decoded normalized fields inverse-transformed
    with the field stats, target_std 1). Pins the unit contract of
    ForecastPipeline.decode_latents / evaluate_ens.make_score_fn.
    """
    ref, model, cfg = _tiny_pair(seed=3)
    putils = load_reference("ladcast.pipelines.utils")

    rng = np.random.RandomState(3)
    E, T, h, w = 2, 3, H // 4, W // 4
    z = rng.randn(E, 4, T, h, w).astype(np.float32)  # (B, C, T, H, W)
    # decode strips the static channels (DCAE.py:1050-1052), so the
    # field stats are DYN-sized
    fm = rng.randn(DYN).astype(np.float32)
    fs = (rng.rand(DYN) + 0.5).astype(np.float32)

    with torch.no_grad():
        want = putils.decode_latent_ens(
            ref, torch.from_numpy(z),
            mean_tensor=torch.from_numpy(fm),
            std_tensor=torch.from_numpy(fs)).numpy()  # (B, C, T, H, W)

    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, DYN)),
                           jnp.zeros((1, H, W, STATIC))))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = jax.tree.map(jnp.asarray,
                          convert_dcae_state_dict(state_dict_numpy(ref),
                                                  template))

    # repo path: flat (B*T) frame batch through decode, then field
    # unnormalize -- the composition used by ForecastPipeline and the
    # scorer (channels-last)
    z_hwc = jnp.asarray(np.moveaxis(z, 1, -1).reshape(E * T, h, w, 4))
    dec = model.apply(params, z_hwc, method=AutoencoderDC.decode)
    dec = np.asarray(dec) * fs + fm
    got = np.moveaxis(dec.reshape(E, T, H, W, DYN), -1, 1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_dcae_temb_parity():
    """Timestep-conditioned DCAE (temb_channels: Timesteps(256) +
    TimestepEmbedding, DCAE.py:845-854 / 983-985; ResBlock scale-shift
    between the convs, DCAE.py:351-352, 362-368; EViT AdaLayerNormZero
    pre-norm + output gate, DCAE.py:36-64, 146-153, 189-197, 256-257)
    against the ACTUAL reference module, weights through the production
    converter. The unconditioned tests above pin that temb_channels=None
    keeps the legacy tree/outputs."""
    ref_mod = load_reference("ladcast.models.DCAE")
    torch.manual_seed(2)
    common = dict(
        in_channels=DYN + STATIC,
        latent_channels=4,
        attention_head_dim=4,
        static_channels=STATIC,
        temb_channels=12,
    )
    shape_kw = dict(
        encoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock"),
        decoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock"),
        encoder_block_out_channels=(8, 16, 32),
        decoder_block_out_channels=(8, 16, 32),
        encoder_layers_per_block=(1, 1, 1),
        decoder_layers_per_block=(1, 1, 1),
        encoder_qkv_multiscales=((), (), (5,)),
        decoder_qkv_multiscales=((), (), (5,)))
    ref = ref_mod.AutoencoderDC(
        out_channels=None, decoder_norm_types="rms_norm",
        decoder_act_fns="silu", **shape_kw, **common)
    ref.eval()
    cfg = DCAEConfig(
        out_channels=DYN + STATIC, decoder_norm_types=("rms_norm",) * 3,
        decoder_act_fns=("silu",) * 3, **shape_kw, **common)
    model = AutoencoderDC(cfg)

    rng = np.random.RandomState(2)
    x = rng.randn(B, DYN, H, W).astype(np.float32)
    static = rng.randn(B, STATIC, H, W).astype(np.float32)
    t = np.asarray([0.5, 3.0], np.float32)

    with torch.no_grad():
        want_z = ref.encode(
            torch.from_numpy(x), return_dict=False,
            temb=torch.from_numpy(t),
            static_conditioning_tensor=torch.from_numpy(static))[0].numpy()
        want_y = ref.decode(torch.from_numpy(want_z), return_dict=False,
                            temb=torch.from_numpy(t))[0].numpy()
        want_full = ref(torch.from_numpy(x), return_dict=False,
                        time_elapsed=torch.from_numpy(t),
                        static_conditioning_tensor=torch.from_numpy(static),
                        return_static=True)[0].numpy()

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    st_j = jnp.asarray(static.transpose(0, 2, 3, 1))
    t_j = jnp.asarray(t)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x_j, st_j,
                           time_elapsed=t_j))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = jax.tree.map(jnp.asarray,
                          convert_dcae_state_dict(state_dict_numpy(ref),
                                                  template))

    got_z = model.apply(params, x_j, st_j, time_elapsed=t_j,
                        method=AutoencoderDC.encode)
    np.testing.assert_allclose(np.asarray(got_z).transpose(0, 3, 1, 2),
                               want_z, atol=1e-4, rtol=1e-4)
    got_y = model.apply(params, got_z, time_elapsed=t_j,
                        method=AutoencoderDC.decode)
    np.testing.assert_allclose(np.asarray(got_y).transpose(0, 3, 1, 2),
                               want_y, atol=1e-4, rtol=1e-4)
    got_full = model.apply(params, x_j, st_j, return_static=True,
                           time_elapsed=t_j)
    np.testing.assert_allclose(np.asarray(got_full).transpose(0, 3, 1, 2),
                               want_full, atol=1e-4, rtol=1e-4)
