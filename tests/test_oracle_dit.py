"""Full-model DiT parity against the ACTUAL reference implementation.

The reference ``LaDCastTransformer3DModel`` (loaded unmodified from
/root/reference/ladcast/models/LaDCast_3D_model.py via the diffusers shim
in tests/oracles) is run on tiny configs; its state dict is imported
through ``convert_dit_state_dict`` (the production weight converter) and
the flax model must reproduce the forward output at fp32.

This de-circularizes the round-1 weight-import test (which synthesized
the "reference" state dict from our own mapping rules) and verifies the
wiring of every block kind end-to-end: dual-stream joint attention with
latent-only RoPE, single-stream concat attention, refiner, AdaLN chunk
orders, temb fp32 island, year-progress FiLM, unpatchify.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ladcast_tpu.config import LaDCastDiTConfig  # noqa: E402
from ladcast_tpu.data.time_utils import timestamps_to_year_progress  # noqa: E402
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D  # noqa: E402
from ladcast_tpu.models.weight_import import convert_dit_state_dict  # noqa: E402
from tests.oracles.refload import load_reference, state_dict_numpy  # noqa: E402

B, T, T_IN, H, W, C = 2, 3, 2, 4, 6, 5


def _tiny_kwargs(**overrides):
    kw = dict(
        in_channels=C, out_channels=C,
        num_attention_heads=2, attention_head_dim=16,
        num_layers=2, num_single_layers=2, num_refiner_layers=2,
        mlp_ratio=2.0, patch_size=1, patch_size_t=1, qk_norm="rms_norm",
        rope_theta=256.0, rope_axes_dim=(4, 6, 6),
        rope_spatial_grid_start_pos=(-499.5, 5.25),
        rope_spatial_grid_end_pos=(508.5, 353.25),
        spatial_deg2rad=True,
        conditioning_tensor_in_channels=C,
        conditioning_tensor_rope_axes_dim=(4, 6, 6),
        incl_time_elapsed=True, nope=False, scale_attn_by_lat=False)
    kw.update(overrides)
    return kw


def _cfg_from_kwargs(kwargs) -> LaDCastDiTConfig:
    return LaDCastDiTConfig(
        in_channels=kwargs["in_channels"], out_channels=kwargs["out_channels"],
        num_attention_heads=kwargs["num_attention_heads"],
        attention_head_dim=kwargs["attention_head_dim"],
        num_layers=kwargs["num_layers"],
        num_single_layers=kwargs["num_single_layers"],
        num_refiner_layers=kwargs["num_refiner_layers"],
        mlp_ratio=kwargs["mlp_ratio"], qk_norm=kwargs["qk_norm"],
        rope_theta=kwargs["rope_theta"],
        rope_axes_dim=kwargs["rope_axes_dim"],
        rope_spatial_grid_start_pos=kwargs["rope_spatial_grid_start_pos"],
        rope_spatial_grid_end_pos=kwargs["rope_spatial_grid_end_pos"],
        spatial_deg2rad=kwargs["spatial_deg2rad"],
        conditioning_tensor_in_channels=kwargs["conditioning_tensor_in_channels"],
        conditioning_tensor_rope_axes_dim=kwargs["conditioning_tensor_rope_axes_dim"],
        incl_time_elapsed=kwargs["incl_time_elapsed"],
        nope=kwargs["nope"], scale_attn_by_lat=kwargs["scale_attn_by_lat"],
        attention_impl="xla")


def _run_pair(kwargs, b=B, t=T, t_in=T_IN, h=H, w=W, seed=0,
              with_time_elapsed=True):
    ref_mod = load_reference("ladcast.models.LaDCast_3D_model")
    torch.manual_seed(seed)
    ref = ref_mod.LaDCastTransformer3DModel(**kwargs)
    ref.eval()

    rng = np.random.RandomState(seed)
    c = kwargs["in_channels"]
    x = rng.randn(b, c, t, h, w).astype(np.float32)
    cond = rng.randn(b, c, t_in, h, w).astype(np.float32)
    c_noise = (rng.randn(b) * 0.5).astype(np.float32)
    ts_ints = np.array([2018010106, 2018063018][:b], np.int64)

    with torch.no_grad():
        te = torch.from_numpy(ts_ints) if with_time_elapsed else None
        want = ref(torch.from_numpy(x), torch.from_numpy(c_noise),
                   torch.from_numpy(cond), time_elapsed=te,
                   return_dict=False)[0].numpy()

    model = LaDCastTransformer3D(_cfg_from_kwargs(kwargs))

    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))       # (B,T,H,W,C)
    cond_j = jnp.asarray(cond.transpose(0, 2, 3, 4, 1))
    import jax
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(c_noise),
                           cond_j, jnp.zeros((b,), jnp.float32)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = convert_dit_state_dict(state_dict_numpy(ref), template)
    params = jax.tree.map(jnp.asarray, params)

    yp = (jnp.asarray(timestamps_to_year_progress(ts_ints).astype(np.float32))
          if with_time_elapsed else None)
    got = model.apply(params, x_j, jnp.asarray(c_noise), cond_j, yp)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)      # -> (B,C,T,H,W)
    return got, want


def test_full_model_parity_default():
    got, want = _run_pair(_tiny_kwargs())
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_full_model_parity_no_time_elapsed():
    got, want = _run_pair(_tiny_kwargs(incl_time_elapsed=False),
                          with_time_elapsed=False, seed=1)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_full_model_parity_nope():
    got, want = _run_pair(_tiny_kwargs(nope=True), seed=2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_full_model_parity_realistic_dims():
    # Real head_dim/rope axes (128 / 16,56,56) on the real 15x30 latent
    # grid with T=4 pred + 1 cond frames (2250 joint tokens), 1 block of
    # each kind -- catches grid/axis bugs the tiny dims can't.
    got, want = _run_pair(
        _tiny_kwargs(attention_head_dim=128, rope_axes_dim=(16, 56, 56),
                     conditioning_tensor_rope_axes_dim=(16, 56, 56),
                     num_layers=1, num_single_layers=1, num_refiner_layers=1),
        b=1, t=4, t_in=1, h=15, w=30, seed=4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_full_model_parity_bf16_autocast():
    """Pin the MIXED-PRECISION contract (VERDICT r2 weak #6): the
    reference under a real bf16 autocast context vs the repo under the
    trainer's bf16 compute policy (params+activations cast to bf16,
    trainer_ar.py::apply_model).

    Dtype semantics, verified empirically on this torch build: under an
    outer ``torch.autocast("cpu", bfloat16)`` the reference's inner
    ``autocast(float32)`` islands (LaDCast_3D_model.py:953, temb) DISABLE
    autocast, so island ops run at their native fp32 -- the same
    numerics the CUDA fp32 islands produce. The repo mirrors this with
    an explicit fp32 temb island (models/ladcast_dit.py:505-521; its
    dtype is asserted structurally in test_temb_island_stays_fp32).
    Tolerance is bf16-scale (1 ulp of bf16 is ~0.8% at 1.0): both sides
    round activations to bf16 at different op boundaries, so agreement
    beyond ~2e-2 relative is not expected -- exact-math parity is pinned
    by the fp32 tests above."""
    kwargs = _tiny_kwargs()
    ref_mod = load_reference("ladcast.models.LaDCast_3D_model")
    torch.manual_seed(6)
    ref = ref_mod.LaDCastTransformer3DModel(**kwargs)
    ref.eval()

    rng = np.random.RandomState(6)
    x = rng.randn(B, C, T, H, W).astype(np.float32)
    cond = rng.randn(B, C, T_IN, H, W).astype(np.float32)
    c_noise = (rng.randn(B) * 0.5).astype(np.float32)
    ts_ints = np.array([2018010106, 2018063018][:B], np.int64)

    with torch.no_grad(), torch.autocast("cpu", torch.bfloat16):
        want = ref(torch.from_numpy(x), torch.from_numpy(c_noise),
                   torch.from_numpy(cond),
                   time_elapsed=torch.from_numpy(ts_ints),
                   return_dict=False)[0].float().numpy()

    import jax

    model = LaDCastTransformer3D(_cfg_from_kwargs(kwargs))
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    cond_j = jnp.asarray(cond.transpose(0, 2, 3, 4, 1))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(c_noise),
                           cond_j, jnp.zeros((B,), jnp.float32)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = convert_dit_state_dict(state_dict_numpy(ref), template)
    # the trainer's compute policy: bf16 param copy + bf16 activations
    params_bf16 = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if a.dtype == np.float32 else jnp.asarray(a), params)
    yp = jnp.asarray(
        timestamps_to_year_progress(ts_ints).astype(np.float32))
    got = model.apply(params_bf16, x_j.astype(jnp.bfloat16),
                      jnp.asarray(c_noise), cond_j.astype(jnp.bfloat16),
                      yp).astype(jnp.float32)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    # relative-to-field tolerance: bf16 rounding at differing op
    # boundaries accumulates over 2+2 transformer blocks
    scale = np.abs(want).mean()
    assert np.abs(got - want).mean() < 4e-2 * scale, (
        np.abs(got - want).mean(), scale)
    np.testing.assert_allclose(got, want, atol=0.25 * scale, rtol=0.25)


def test_temb_island_stays_fp32():
    """Structural assert for the repo's temb fp32 island
    (models/ladcast_dit.py:505-521): with bf16 params and activations,
    the time_text_embed projection still computes in float32 -- the flax
    mirror of the reference's autocast(float32) island."""
    import jax

    model = LaDCastTransformer3D(_cfg_from_kwargs(
        _tiny_kwargs(num_layers=1, num_single_layers=1,
                     num_refiner_layers=1)))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, T, H, W, C), jnp.float32)
    cond = jnp.asarray(rng.randn(1, T_IN, H, W, C), jnp.float32)
    cn = jnp.zeros((1,), jnp.float32)
    yp = jnp.zeros((1,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, cn, cond, yp)
    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    _, inter = model.apply(
        params_bf16, x.astype(jnp.bfloat16), cn,
        cond.astype(jnp.bfloat16), yp,
        capture_intermediates=lambda mdl, _:
            mdl.name == "time_text_embed")
    # the ISLAND: the top-level temb projection stays fp32
    # (LaDCast_3D_model.py:953-956 autocast(float32))
    island = jax.tree.leaves(inter["intermediates"]["time_text_embed"])
    assert island and all(l.dtype == jnp.float32 for l in island), (
        [l.dtype for l in island])
    # the BOUNDARY: the refiner's own temb runs BEFORE the island
    # (ref :946-951, under the outer autocast) and so is bf16 here --
    # pinning that the island does not leak wider than the reference's
    refiner = jax.tree.leaves(
        inter["intermediates"]["context_refiner"]["time_text_embed"])
    assert refiner and all(l.dtype == jnp.bfloat16 for l in refiner), (
        [l.dtype for l in refiner])


def test_full_model_parity_scale_attn_by_lat():
    # The reference hardcodes the lat-weight mask to the 15x30 latent grid
    # (LaDCast_3D_model.py:684-693), so this variant must run at 15x30.
    got, want = _run_pair(
        _tiny_kwargs(scale_attn_by_lat=True, num_layers=1,
                     num_single_layers=1, num_refiner_layers=1),
        b=1, t=1, t_in=1, h=15, w=30, seed=3)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
