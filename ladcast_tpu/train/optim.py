"""Optimizer + LR schedules.

Replicates the reference training recipe (configs/ladcast_375M.yaml:44-56,
models/utils.py:53-123): AdamW(lr 1e-4, betas (0.9, 0.999), eps 1e-8,
wd 1e-2), global-norm grad clip 1.0 (train_AR.py:1071), cosine schedule
with linear warmup and a minimum-LR floor.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def cosine_with_min_lr(base_lr: float, min_lr: float, num_warmup_steps: int,
                       num_training_steps: int):
    """models/utils.py:83-95: warmup then
    min_ratio + (1 - min_ratio) * 0.5*(1 + cos(pi * progress))."""
    # base_lr 0 is legal (freeze-everything debug runs): ratio 0 keeps
    # the whole schedule at 0 instead of dividing by zero
    min_ratio = min_lr / base_lr if base_lr > 0 else 0.0

    def schedule(step):
        import jax.numpy as jnp
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * progress))
        mult = jnp.where(step < num_warmup_steps, warm,
                         min_ratio + (1.0 - min_ratio) * cos)
        return base_lr * mult

    return schedule


def polynomial_with_min_lr(base_lr: float, min_lr: float,
                           num_warmup_steps: int, num_training_steps: int,
                           power: float = 1.0):
    """Polynomial decay to lr_end with linear warmup (the reference's
    'polynomial' branch, models/utils.py:72-81)."""

    def schedule(step):
        import jax.numpy as jnp
        warm = base_lr * step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        decayed = (base_lr - min_lr) * (1 - progress) ** power + min_lr
        return jnp.where(step < num_warmup_steps, warm, decayed)

    return schedule


def decoder_only_mask(params) -> dict:
    """optax mask for decoder-only finetuning (the reference's
    --ft_decoder, train_encdec.py:207-210): True = trainable."""
    import jax

    def trainable(path, _):
        return any(getattr(k, "key", str(k)) == "decoder" for k in path)

    return jax.tree_util.tree_map_with_path(trainable, params)


def make_optimizer(
    lr: float = 1e-4,
    *,
    min_lr: float = 0.0,
    weight_decay: float = 1e-2,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    grad_clip_norm: Optional[float] = 1.0,
    num_warmup_steps: int = 1000,
    num_training_steps: int = 100000,
    schedule: str = "cosine",
    trainable_mask=None,
) -> optax.GradientTransformation:
    """``trainable_mask``: optional bool pytree (True = trainable); frozen
    leaves receive zero updates (decoder-only finetuning etc.)."""
    if schedule == "cosine":
        lr_fn = cosine_with_min_lr(lr, min_lr, num_warmup_steps,
                                   num_training_steps)
    elif schedule == "polynomial":
        lr_fn = polynomial_with_min_lr(lr, min_lr, num_warmup_steps,
                                       num_training_steps)
    elif schedule == "constant":
        lr_fn = lr
    else:
        raise ValueError(schedule)
    parts = []
    frozen = None
    if trainable_mask is not None:
        import jax
        frozen = jax.tree.map(lambda m: not m, trainable_mask)
        parts.append(optax.masked(optax.set_to_zero(), frozen))
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    parts.append(optax.adamw(lr_fn, b1=betas[0], b2=betas[1], eps=eps,
                             weight_decay=weight_decay,
                             mask=trainable_mask))
    if frozen is not None:
        # weight decay is masked above; this guarantees exact zero updates
        # for frozen leaves regardless of optimizer internals.
        parts.append(optax.masked(optax.set_to_zero(), frozen))
    return optax.chain(*parts)
