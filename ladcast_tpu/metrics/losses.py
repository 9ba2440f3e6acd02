"""Training losses: relative Lp loss with optional latitude weighting and
per-variable breakdown (port of reference metric/loss.py:7-196)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ladcast_tpu import channels as ch


def lp_loss(
    y_pred: jnp.ndarray,
    y: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    *,
    d: int = 2,
    p: int = 2,
    reduce: str = "mean",
) -> jnp.ndarray:
    """Relative Lp loss: ||w*(pred - y)||_p / ||w*y||_p over the trailing
    ``d`` dims, then reduced over the rest (metric/loss.py:73-105 with the
    shipped config d=2, p=2, reduce_dims=(0,1), reductions='mean').

    Inputs are channel-last here: (B, H, W, C); ``weight`` broadcastable
    (e.g. (1, H, 1, 1) latitude weights). The reference flattens the
    trailing d dims of (B, C, H, W); trailing (H, W) there == our (H, W).
    """
    if weight is None:
        diff_in = y_pred - y
        norm_in = y
    else:
        diff_in = weight * (y_pred - y)
        norm_in = weight * y
    # Flatten spatial dims: (B, H, W, C) -> (B, C, H*W)
    def _flat(t):
        moved = jnp.moveaxis(t, -1, 1)
        return moved.reshape(*moved.shape[:2], -1)

    diff = jnp.linalg.norm(_flat(diff_in), ord=p, axis=-1)
    ynorm = jnp.linalg.norm(_flat(norm_in), ord=p, axis=-1)
    rel = diff / ynorm  # (B, C)
    if reduce == "mean":
        return rel.mean()
    if reduce == "sum":
        return rel.sum()
    if reduce == "none":
        return rel
    raise ValueError(reduce)


def lp_loss_per_var(
    y_pred: jnp.ndarray,
    y: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    num_atm_vars: int = ch.NUM_ATM_VARS,
    num_levels: int = ch.NUM_LEVELS,
) -> jnp.ndarray:
    """Per-variable relative L2 breakdown (metric/loss.py:108-157):
    atmospheric variables average their level-channels."""
    rel = lp_loss(y_pred, y, weight, reduce="none")  # (B, C)
    parts = []
    for i in range(num_atm_vars):
        parts.append(rel[:, i * num_levels:(i + 1) * num_levels].mean())
    for i in range(num_atm_vars * num_levels, rel.shape[1]):
        parts.append(rel[:, i].mean())
    return jnp.stack(parts)


def mse_loss(y_pred, y):
    return jnp.mean((y_pred.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
