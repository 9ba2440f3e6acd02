"""Rotary position embeddings with grid-valued (physical-coordinate) axes.

Ports the reference RoPE stack to precomputed tables + a fused apply:

  - :func:`rotary_tables_1d`: diffusers ``get_1d_rotary_pos_embed`` with
    ``use_real=True, repeat_interleave_real=True`` -- cos/sin of shape
    (S, dim) where each frequency is repeated twice (interleaved pairs).
  - :func:`multi_axis_rotary_tables`: the reference
    ``LaDCastRotaryPosEmbed_from_grid`` (models/embeddings.py:252-327):
    per-axis 1D tables over a meshgrid of *grid-valued* coordinates
    (time indices / latitude radians / longitude radians), concatenated
    along the feature dim.
  - :func:`apply_rotary_emb`: diffusers ``apply_rotary_emb`` with
    ``use_real_unbind_dim=-1`` (interleaved pair rotation), the variant the
    reference attention processor calls (LaDCast_3D_model.py:110-169).

Tables are tiny ((<=2250, 128) fp32) and built once per rollout shape, so
they live as constants folded into the jitted step function.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def rotary_tables_1d(dim: int, pos: np.ndarray, theta: float) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables, (len(pos), dim), interleaved-pair layout."""
    assert dim % 2 == 0
    pos = np.asarray(pos, dtype=np.float32)
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))
    angles = np.outer(pos, freqs)  # (S, dim/2)
    cos = np.repeat(np.cos(angles), 2, axis=1).astype(np.float32)
    sin = np.repeat(np.sin(angles), 2, axis=1).astype(np.float32)
    return cos, sin


def multi_axis_rotary_tables(
    rope_dims: Sequence[int],
    axis_coords: Sequence[np.ndarray],
    theta: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenated per-axis tables over the meshgrid of ``axis_coords``.

    Token order is C-order over the meshgrid (t-major, then lat, then lon),
    matching ``torch.meshgrid(..., indexing='ij')`` + reshape(-1)
    (models/embeddings.py:310-325).
    Returns cos/sin of shape (prod(lengths), sum(rope_dims)).
    """
    assert len(rope_dims) == len(axis_coords)
    grids = np.meshgrid(*[np.asarray(c, dtype=np.float32) for c in axis_coords],
                        indexing="ij")
    cos_parts, sin_parts = [], []
    for dim, grid in zip(rope_dims, grids):
        c, s = rotary_tables_1d(dim, grid.reshape(-1), theta)
        cos_parts.append(c)
        sin_parts.append(s)
    return (np.concatenate(cos_parts, axis=1), np.concatenate(sin_parts, axis=1))


def apply_rotary_emb(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved feature pairs.

    x: (..., S, D); cos/sin: (S, D). Equivalent to diffusers
    apply_rotary_emb(use_real=True, use_real_unbind_dim=-1): pairs
    (x0, x1) -> (x0*cos - x1*sin, x1*cos + x0*sin). Computed in fp32 and
    cast back to x.dtype, matching the diffusers implementation.
    """
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    out = xf * cos + rot * sin
    return out.astype(x.dtype)


def ladcast_axis_coords(
    num_frames: int,
    height: int,
    width: int,
    lat_start: float,
    lat_end: float,
    lon_start: float,
    lon_end: float,
    *,
    conditioning: bool,
) -> List[np.ndarray]:
    """Axis coordinate vectors for the LaDCast DiT RoPE grids
    (LaDCast_3D_model.py:884-938).

    Prediction frames get temporal coords 1..T; conditioning frames get
    -T_in+1..0. Spatial coords are linspace over the configured (already
    radian-converted) start/end positions.
    """
    if conditioning:
        t = np.arange(-num_frames + 1, 1, dtype=np.float32)
    else:
        t = np.arange(1, num_frames + 1, dtype=np.float32)
    lat = np.linspace(lat_start, lat_end, height, dtype=np.float32)
    lon = np.linspace(lon_start, lon_end, width, dtype=np.float32)
    return [t, lat, lon]
