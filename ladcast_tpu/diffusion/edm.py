"""EDM (Karras et al. 2022) preconditioning and sigma schedules as pure
JAX functions.

Self-contained reimplementation of the pieces of
``diffusers.EDMDPMSolverMultistepScheduler`` the reference depends on
(SURVEY.md section 2.3 item 9; used at train_AR.py:911-977,
pipelines/edm_sampler.py:56-110, pipelines/pipeline_AR.py:85-102):

  - Karras sigma schedule        sigma_i = (smax^(1/rho) + ramp*(smin^(1/rho)-smax^(1/rho)))^rho
  - precondition_inputs          c_in    = 1/sqrt(sigma^2 + sigma_data^2)
  - precondition_noise           c_noise = ln(sigma)/4
  - precondition_outputs         c_skip*x + c_out*F(x) with
                                 c_skip = sigma_data^2/(sigma^2+sigma_data^2),
                                 c_out  = sigma*sigma_data/sqrt(sigma^2+sigma_data^2)
  - add_noise                    x + n*sigma

All functions are shape-polymorphic and dtype-preserving; nothing here
owns mutable state, so everything composes with jit/vmap/scan.
"""

from __future__ import annotations

import jax.numpy as jnp

from ladcast_tpu.config import EDMSchedulerConfig


def karras_sigmas(cfg: EDMSchedulerConfig, num_steps: int, dtype=jnp.float32) -> jnp.ndarray:
    """Descending Karras sigma ramp of length ``num_steps`` (no trailing 0)."""
    ramp = jnp.linspace(0.0, 1.0, num_steps, dtype=dtype)
    min_inv_rho = cfg.sigma_min ** (1.0 / cfg.rho)
    max_inv_rho = cfg.sigma_max ** (1.0 / cfg.rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** cfg.rho


def train_sigmas(cfg: EDMSchedulerConfig, dtype=jnp.float32) -> jnp.ndarray:
    """The ``num_train_timesteps``-long training schedule (index->sigma)."""
    return karras_sigmas(cfg, cfg.num_train_timesteps, dtype=dtype)


def inference_sigmas(cfg: EDMSchedulerConfig, num_inference_steps: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    """set_timesteps equivalent: N Karras sigmas + trailing zero
    (``final_sigmas_type='zero'``)."""
    s = karras_sigmas(cfg, num_inference_steps, dtype=dtype)
    return jnp.concatenate([s, jnp.zeros((1,), dtype=dtype)])


def precondition_noise(sigma):
    return 0.25 * jnp.log(sigma)


def precondition_inputs(cfg: EDMSchedulerConfig, sample, sigma):
    c_in = 1.0 / jnp.sqrt(sigma**2 + cfg.sigma_data**2)
    return sample * c_in


def precondition_outputs(cfg: EDMSchedulerConfig, sample, model_output, sigma):
    sd2 = cfg.sigma_data**2
    denom = sigma**2 + sd2
    c_skip = sd2 / denom
    if cfg.prediction_type == "epsilon":
        c_out = sigma * cfg.sigma_data / jnp.sqrt(denom)
    elif cfg.prediction_type == "v_prediction":
        c_out = -sigma * cfg.sigma_data / jnp.sqrt(denom)
    else:
        raise ValueError(f"Unsupported prediction_type {cfg.prediction_type}")
    return c_skip * sample + c_out * model_output


def add_noise(sample, noise, sigma):
    return sample + noise * sigma


def edm_loss_weighting(cfg: EDMSchedulerConfig, sigma):
    """lambda(sigma) = (sigma^2 + sigma_data^2) / (sigma*sigma_data)^2
    (train_AR.py:975-977, Karras et al. eq. 8)."""
    return (sigma**2 + cfg.sigma_data**2) / (sigma * cfg.sigma_data) ** 2


def timesteps_from_sigmas(sigmas):
    """The scheduler's ``timesteps`` array is the preconditioned noise level
    of each sigma (c_noise); reference scheduler __init__/set_timesteps."""
    return precondition_noise(sigmas)
