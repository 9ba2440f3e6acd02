"""Formula-level parity tests for the diffusers-derived pieces the DiT
depends on (SURVEY.md 'hard parts'): RoPE table layout + rotation pairing,
sinusoidal timestep embedding, year-progress embedding.

Expected values are independent reimplementations of the diffusers
v0.32 formulas (get_1d_rotary_pos_embed with use_real=True /
repeat_interleave_real=True; apply_rotary_emb with use_real_unbind_dim=-1;
get_timestep_embedding flip_sin_to_cos / downscale_freq_shift=0) written
in torch/numpy inside this test.
"""

import numpy as np
import pytest

from ladcast_tpu.ops import rope as rope_ops
from ladcast_tpu.ops.embeddings import timestep_embedding, year_sincos_embedding


def _torch_rotary_tables(dim, pos, theta):
    import torch
    pos = torch.tensor(pos, dtype=torch.float32)
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    f = torch.outer(pos, freqs)
    cos = f.cos().repeat_interleave(2, dim=1)
    sin = f.sin().repeat_interleave(2, dim=1)
    return cos.numpy(), sin.numpy()


def _torch_apply_rotary(x, cos, sin):
    import torch
    x = torch.tensor(x)
    cos_t = torch.tensor(cos)[None, None]
    sin_t = torch.tensor(sin)[None, None]
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return (x.float() * cos_t + x_rot.float() * sin_t).numpy()


def test_rotary_tables_match_diffusers_layout():
    torch = pytest.importorskip("torch")
    pos = np.array([-1.0, 0.0, 1.0, 2.5], np.float32)
    for dim, theta in [(16, 256.0), (56, 256.0), (8, 10000.0)]:
        cos, sin = rope_ops.rotary_tables_1d(dim, pos, theta)
        want_c, want_s = _torch_rotary_tables(dim, pos, theta)
        np.testing.assert_allclose(cos, want_c, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sin, want_s, rtol=1e-5, atol=1e-6)


def test_apply_rotary_matches_diffusers():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    B, H, S, D = 2, 3, 5, 16
    x = rng.randn(B, H, S, D).astype(np.float32)  # torch layout (B,H,S,D)
    cos, sin = rope_ops.rotary_tables_1d(D, np.arange(S), 256.0)
    want = _torch_apply_rotary(x, cos, sin)

    # ours operates BSHD: transpose in, compare out
    x_bshd = jnp.asarray(x.transpose(0, 2, 1, 3))
    got = rope_ops.apply_rotary_emb(
        x_bshd, jnp.asarray(cos)[None, :, None, :],
        jnp.asarray(sin)[None, :, None, :])
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1, 3), want,
                               rtol=1e-5, atol=1e-5)


def test_multi_axis_token_order():
    """Token order must be t-major then lat then lon (meshgrid 'ij' +
    reshape(-1)), with per-axis tables concatenated on features."""
    t = np.array([1.0, 2.0])
    lat = np.array([0.1, 0.2, 0.3])
    lon = np.array([0.5])
    cos, sin = rope_ops.multi_axis_rotary_tables((4, 4, 4), [t, lat, lon],
                                                 256.0)
    assert cos.shape == (6, 12)
    # first 4 features = temporal axis: rows 0-2 share t=1, rows 3-5 t=2
    c1, _ = rope_ops.rotary_tables_1d(4, np.array([1.0]), 256.0)
    c2, _ = rope_ops.rotary_tables_1d(4, np.array([2.0]), 256.0)
    for r in range(3):
        np.testing.assert_allclose(cos[r, :4], c1[0], rtol=1e-6)
        np.testing.assert_allclose(cos[3 + r, :4], c2[0], rtol=1e-6)
    # middle 4 = latitude axis cycling every row
    cl, _ = rope_ops.rotary_tables_1d(4, lat, 256.0)
    np.testing.assert_allclose(cos[0, 4:8], cl[0], rtol=1e-6)
    np.testing.assert_allclose(cos[1, 4:8], cl[1], rtol=1e-6)
    np.testing.assert_allclose(cos[4, 4:8], cl[1], rtol=1e-6)


def test_timestep_embedding_formula():
    """diffusers get_timestep_embedding(flip_sin_to_cos=True,
    downscale_freq_shift=0): [cos | sin] halves with freqs
    exp(-ln(1e4) * i / half)."""
    t = np.array([0.25, -1.5], np.float32)
    D = 8
    half = D // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = t[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    import jax.numpy as jnp
    got = np.asarray(timestep_embedding(jnp.asarray(t), D))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_year_sincos_formula():
    """models/embeddings.py:467-520: sin/cos of 2*pi*progress*k for
    k=1..half, magnitudes exp(-ln(1e4)*i/half)."""
    import jax.numpy as jnp
    prog = np.array([0.25], np.float32)
    D = 8
    half = D // 2
    freqs = np.arange(1, half + 1)
    mag = np.exp(-np.log(10000.0) * np.arange(half) / half)
    phase = 2 * np.pi * 0.25
    want = np.concatenate([np.sin(phase * freqs) * mag,
                           np.cos(phase * freqs) * mag])[None]
    got = np.asarray(year_sincos_embedding(jnp.asarray(prog), D))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dit_rope_coords_match_reference_grids():
    """The 375M config spatial grid (deg->rad) and temporal coords:
    cond frames get <=0 coords, pred frames 1..T
    (LaDCast_3D_model.py:884-938)."""
    from ladcast_tpu.config import ladcast_375m_config

    cfg = ladcast_375m_config()
    lat0, lon0 = cfg.rope_spatial_grid_start_rad()
    lat1, lon1 = cfg.rope_spatial_grid_end_rad()
    np.testing.assert_allclose([lat0, lon0],
                               np.deg2rad([-499.5, 5.25]), rtol=1e-12)
    coords = rope_ops.ladcast_axis_coords(4, 15, 30, lat0, lat1, lon0, lon1,
                                          conditioning=False)
    np.testing.assert_array_equal(coords[0], [1, 2, 3, 4])
    ccoords = rope_ops.ladcast_axis_coords(2, 15, 30, lat0, lat1, lon0, lon1,
                                           conditioning=True)
    np.testing.assert_array_equal(ccoords[0], [-1, 0])
    assert coords[1][0] == np.float32(lat0)
    assert abs(coords[2][-1] - lon1) < 1e-6
