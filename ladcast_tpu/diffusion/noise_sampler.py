"""Training-time noise-level (sigma index) sampler.

Pure-function port of ``Karras_sigmas_lognormal`` (reference
models/utils.py:9-50): draw log-normal sigmas with (P_mean, P_std)
linearly annealed over training steps, then snap each to the nearest
entry of the training sigma schedule (excluding the appended final zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ladcast_tpu.config import EDMSchedulerConfig, NoiseSamplerConfig
from ladcast_tpu.diffusion import edm


def indices_from_normals(
    rnd: jnp.ndarray,
    cur_step,
    ns_cfg: NoiseSamplerConfig,
    sched_cfg: EDMSchedulerConfig,
) -> jnp.ndarray:
    """Snap standard-normal draws ``rnd`` (B,) to training sigma indices.

    Split out of :func:`sample_sigma_indices` so the reference oracle can
    feed both implementations identical normal draws
    (tests/test_oracle_samplers.py vs models/utils.py:28-50).
    """
    step = jnp.minimum(cur_step, ns_cfg.num_max_steps - 1).astype(jnp.float32)
    frac = step / max(ns_cfg.num_max_steps - 1, 1)
    p_mean = ns_cfg.P_mean_start + frac * (ns_cfg.P_mean_end - ns_cfg.P_mean_start)
    p_std = ns_cfg.P_std_start + frac * (ns_cfg.P_std_end - ns_cfg.P_std_start)

    sigma = jnp.exp(rnd * p_std + p_mean)

    # Snap to nearest training sigma. The reference drops the scheduler's
    # trailing zero entry (models/utils.py:43 ``self.sigmas[:-1]`` where
    # sigmas = cat([karras(N), 0])); our train schedule carries no trailing
    # zero so all N entries participate in the argmin, exactly as there.
    sigmas = edm.train_sigmas(sched_cfg)
    diff = jnp.abs(sigmas[None, :] - sigma[:, None])
    return jnp.argmin(diff, axis=1).astype(jnp.int32)


def sample_sigma_indices(
    key: jax.Array,
    batch_size: int,
    cur_step,
    ns_cfg: NoiseSamplerConfig,
    sched_cfg: EDMSchedulerConfig,
) -> jnp.ndarray:
    """Return int32 indices into the training sigma schedule, shape (B,).

    ``cur_step`` may be a traced scalar so the trainer can keep the whole
    update step inside one jit.
    """
    rnd = jax.random.normal(key, (batch_size,), dtype=jnp.float32)
    return indices_from_normals(rnd, cur_step, ns_cfg, sched_cfg)
