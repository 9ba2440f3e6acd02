"""Scalar-conditioning embeddings: EDM timestep sinusoids and the
year-progress embedding.

Formula-exact ports of:
  - diffusers ``get_timestep_embedding`` / ``Timesteps(num_channels=256,
    flip_sin_to_cos=True, downscale_freq_shift=0)`` (used by
    CombinedTimestepTextProjEmbeddings, LaDCast_3D_model.py:673).
  - ``get_year_sincos_embedding`` (models/embeddings.py:467-520) with the
    timestamp -> year-progress conversion moved host-side
    (:mod:`ladcast_tpu.data.time_utils`), so the on-device function takes a
    float progress in [0, 1) and stays jit-friendly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """(B,) -> (B, embedding_dim) sinusoidal embedding (diffusers layout)."""
    half = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = scale * timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


def year_sincos_embedding(
    year_progress: jnp.ndarray,
    embedding_dim: int = 256,
    max_period: float = 10000.0,
    freq_scale: float = 1.0,
) -> jnp.ndarray:
    """(B,) float year-progress in [0,1) -> (B, D) sin/cos superposition
    with exponentially decaying magnitudes (models/embeddings.py:467-520)."""
    half = embedding_dim // 2
    freqs = jnp.arange(1, half + 1, dtype=jnp.float32) * freq_scale
    mag = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    phase = 2.0 * math.pi * year_progress.astype(jnp.float32)[:, None]
    args = phase * freqs[None, :]
    return jnp.concatenate([jnp.sin(args) * mag, jnp.cos(args) * mag], axis=-1)
