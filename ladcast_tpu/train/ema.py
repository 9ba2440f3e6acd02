"""Exponential moving average of parameters.

Decay schedule replicates diffusers ``EMAModel`` (used at
train_AR.py:545-556 with inv_gamma=1.0, power=2/3, max decay 0.9999,
update_after_step=1000): decay_t = clip(1 - (1 + step/inv_gamma)^(-power),
0, max_decay), with the step counter offset by update_after_step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: dict
    step: jnp.ndarray  # int32 optimization step count


def ema_init(params) -> EMAState:
    return EMAState(params=jax.tree.map(jnp.asarray, params),
                    step=jnp.zeros((), jnp.int32))


def ema_decay(step, *, inv_gamma: float = 1.0, power: float = 2.0 / 3.0,
              max_decay: float = 0.9999, update_after_step: int = 1000):
    eff = jnp.maximum(step - update_after_step - 1, 0)
    decay = 1.0 - (1.0 + eff / inv_gamma) ** (-power)
    decay = jnp.where(eff <= 0, 0.0, decay)
    return jnp.clip(decay, 0.0, max_decay)


def ema_update(state: EMAState, new_params, **decay_kwargs) -> EMAState:
    step = state.step + 1
    d = ema_decay(step, **decay_kwargs)
    upd = jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p),
                       state.params, new_params)
    return EMAState(params=upd, step=step)
