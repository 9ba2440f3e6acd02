"""Weight-import mapping coverage: every parameter of our models maps to
exactly one reference tensor name, every synthesized reference tensor is
consumed, shapes convert correctly, and values land where expected."""

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.models import weight_import as wi
from ladcast_tpu.models.dcae import AutoencoderDC
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from tests.test_dcae import TINY as TINY_DCAE
from tests.test_dit import TINY as TINY_DIT


def _shapes(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def test_dcae_roundtrip_mapping():
    model = AutoencoderDC(TINY_DCAE)
    x = jax.ShapeDtypeStruct((1, 16, 32, 8), jnp.float32)
    st = jax.ShapeDtypeStruct((16, 32, 1), jnp.float32)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, st)

    sd = wi.synthesize_reference_state_dict(template, "dcae")
    # key set sanity: diffusers-style names present
    assert "encoder.conv_in.weight" in sd
    assert any(k.startswith("decoder.up_blocks.0.") for k in sd)
    assert any(".attn.to_qkv_multiscale.0.proj_in.weight" in k for k in sd)

    params = wi.convert_dcae_state_dict(sd, template)
    assert _shapes(params) == _shapes(template)

    # Spot value checks: linear transpose and conv transpose.
    w = sd["encoder.conv_in.weight"]  # (O, I, 3, 3)
    got = params["params"]["encoder"]["conv_in"]["kernel"]
    np.testing.assert_array_equal(got, np.transpose(w, (2, 3, 1, 0)))


def test_dit_roundtrip_mapping():
    model = LaDCastTransformer3D(TINY_DIT)
    lat = jax.ShapeDtypeStruct((1, 3, 4, 6, 6), jnp.float32)
    cond = jax.ShapeDtypeStruct((1, 1, 4, 6, 6), jnp.float32)
    cn = jax.ShapeDtypeStruct((1,), jnp.float32)
    yp = jax.ShapeDtypeStruct((1,), jnp.float32)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), lat, cn,
                              cond, yp)

    sd = wi.synthesize_reference_state_dict(template, "dit")
    expected_names = [
        "x_embedder.proj.weight",
        "context_embedder.proj.bias",
        "context_refiner.time_text_embed.timestep_embedder.linear_1.weight",
        "context_refiner.time_text_embed.text_embedder.linear_1.weight",
        "context_refiner.token_refiner.refiner_blocks.0.attn.to_q.weight",
        "context_refiner.token_refiner.refiner_blocks.0.norm_out.linear.weight",
        "context_refiner.token_refiner.refiner_blocks.0.ff.net.0.proj.weight",
        "transformer_blocks.0.attn.add_q_proj.weight",
        "transformer_blocks.0.attn.norm_added_k.weight",
        "transformer_blocks.0.attn.to_out.0.weight",
        "transformer_blocks.0.ff_context.net.2.bias",
        "transformer_blocks.0.norm1.linear.weight",
        "single_transformer_blocks.0.norm.linear.weight",
        "single_transformer_blocks.0.proj_mlp.weight",
        "time_elapsed_embed.linear_1.weight",
        "norm_out.linear.weight",
        "proj_out.bias",
    ]
    for name in expected_names:
        assert name in sd, name

    params = wi.convert_dit_state_dict(sd, template)
    assert _shapes(params) == _shapes(template)

    # Patch embed: Conv3d (O, I, 1, 1, 1) -> Dense (I, O).
    w = sd["x_embedder.proj.weight"]
    got = params["params"]["x_embedder"]["kernel"]
    np.testing.assert_array_equal(got, w[:, :, 0, 0, 0].T)


def test_safetensors_file_roundtrip_through_cli_loader():
    """The production safetensors path end-to-end: the ACTUAL reference
    model's state dict serialized to a .safetensors FILE, loaded through
    cli.pred_rollout._load_any_params (load_safetensors + converter +
    grid-size template), must reproduce the reference forward. This is
    the exact code path published tonyzyl/ladcast weights will take."""
    import pytest
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    import jax.numpy as jnp
    from ladcast_tpu.cli.pred_rollout import _load_any_params
    from ladcast_tpu.models.dcae import AutoencoderDC
    from tests.test_oracle_dcae import _tiny_pair

    ref, model, cfg = _tiny_pair(seed=3)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "dcae.safetensors")
        save_file({k: v.contiguous() for k, v in ref.state_dict().items()},
                  path)
        params, cfg = _load_any_params(path, "dcae", cfg)

    rng = np.random.RandomState(5)
    x = rng.randn(2, 6, 16, 24).astype(np.float32)
    static = rng.randn(2, 2, 16, 24).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), return_dict=False,
                   static_conditioning_tensor=torch.from_numpy(static),
                   return_static=True)[0].numpy()
    got = model.apply(jax.tree.map(jnp.asarray, params),
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(static.transpose(0, 2, 3, 1)),
                      return_static=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4, rtol=1e-4)


def test_dit_safetensors_file_roundtrip_through_cli_loader():
    """DiT branch of the CLI weight loader: reference state dict ->
    .safetensors file -> _load_any_params -> our forward matches the
    reference forward (the published-AR-weights path)."""
    import pytest
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    from ladcast_tpu.cli.pred_rollout import _load_any_params
    from ladcast_tpu.config import LaDCastDiTConfig
    from ladcast_tpu.data.time_utils import timestamps_to_year_progress
    from tests.oracles.refload import load_reference
    from tests.test_oracle_dit import _tiny_kwargs

    kwargs = _tiny_kwargs()
    ref_mod = load_reference("ladcast.models.LaDCast_3D_model")
    torch.manual_seed(11)
    ref = ref_mod.LaDCastTransformer3DModel(**kwargs)
    ref.eval()

    cfg = LaDCastDiTConfig(
        **{k: kwargs[k] for k in (
            "in_channels", "out_channels", "num_attention_heads",
            "attention_head_dim", "num_layers", "num_single_layers",
            "num_refiner_layers", "mlp_ratio", "qk_norm", "rope_theta",
            "rope_axes_dim", "rope_spatial_grid_start_pos",
            "rope_spatial_grid_end_pos", "spatial_deg2rad",
            "conditioning_tensor_in_channels",
            "conditioning_tensor_rope_axes_dim", "incl_time_elapsed",
            "nope", "scale_attn_by_lat")},
        attention_impl="xla")

    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "dit.safetensors")
        save_file({k: v.contiguous() for k, v in ref.state_dict().items()},
                  path)
        params, cfg = _load_any_params(path, "dit", cfg)

    b, t, t_in, h, w = 2, 2, 1, 4, 6
    c = kwargs["in_channels"]
    rng = np.random.RandomState(7)
    x = rng.randn(b, c, t, h, w).astype(np.float32)
    cond = rng.randn(b, c, t_in, h, w).astype(np.float32)
    c_noise = (rng.randn(b) * 0.5).astype(np.float32)
    ts_ints = np.array([2018010106, 2018063018], np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(c_noise),
                   torch.from_numpy(cond),
                   time_elapsed=torch.from_numpy(ts_ints),
                   return_dict=False)[0].numpy()

    model = LaDCastTransformer3D(cfg)
    yp = jnp.asarray(timestamps_to_year_progress(ts_ints))
    got = model.apply(jax.tree.map(jnp.asarray, params),
                      jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                      jnp.asarray(c_noise),
                      jnp.asarray(cond.transpose(0, 2, 3, 4, 1)), yp)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), want,
        atol=2e-4, rtol=2e-4)
