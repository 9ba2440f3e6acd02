"""Denoising samplers compiled as ``lax.scan`` loops.

TPU-native re-designs of the reference's two samplers:

  - :func:`edm_heun_sample` -- deterministic (optionally churned) 2nd-order
    Heun EDM sampler (reference pipelines/edm_sampler.py:10-120). The
    reference runs trajectory math in float64 with the network at fp32; on
    TPU we run the trajectory in fp32 by default (documented deviation, see
    SURVEY.md section 2.3 item 6). 2N-1 network evaluations, expressed as a
    scan over N-1 Heun steps plus one trailing Euler step so no wasted
    network call is traced for the final iteration.

  - :func:`dpm_multistep_sample` -- the DPM-Solver++(2M) multistep update of
    diffusers.EDMDPMSolverMultistepScheduler.step (the reference's
    "pipeline" sampler, pipelines/pipeline_AR.py:85-102). N network
    evaluations.

Both take a ``denoised_fn(x, sigma) -> D(x; sigma)`` closure that applies
input/output preconditioning around the raw network, so samplers stay
agnostic of model wiring and conditioning.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ladcast_tpu.config import EDMSchedulerConfig
from ladcast_tpu.diffusion import edm

DenoisedFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_denoised_fn(cfg: EDMSchedulerConfig, net_fn: Callable) -> DenoisedFn:
    """Wrap a raw network ``net_fn(x_in, c_noise) -> F`` with EDM pre/post
    conditioning so it evaluates the true denoiser D(x; sigma)."""

    def denoised(x, sigma):
        x_in = edm.precondition_inputs(cfg, x, sigma)
        c_noise = edm.precondition_noise(sigma)
        f = net_fn(x_in, c_noise)
        return edm.precondition_outputs(cfg, x, f.astype(x.dtype), sigma)

    return denoised


def edm_heun_sample(
    cfg: EDMSchedulerConfig,
    denoised_fn: DenoisedFn,
    noise: jnp.ndarray,
    num_inference_steps: int,
    *,
    s_churn: float = 0.0,
    s_min: float = 0.0,
    s_max: float = float("inf"),
    s_noise: float = 0.0,
    churn_key: Optional[jax.Array] = None,
    churn_noise: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    correction_skip_period: int = 0,
    correction_skip_warmup: int = 2,
) -> jnp.ndarray:
    """Heun (2nd order) EDM sampling starting from unit Gaussian ``noise``.

    Matches pipelines/edm_sampler.py:10-120 step-for-step at the chosen
    trajectory dtype: x0 = noise * sigma[0]; per step an Euler move plus a
    2nd-order correction on every step except the last.

    ``correction_skip_period`` (default 0 = off, the exact reference
    path): opt-in inference acceleration in the spirit of
    training-free DiT caching (SmoothCache arXiv:2411.10510, Delta-DiT
    arXiv:2406.01125, predict-to-skip linear multistep feature
    forecasting -- see PAPERS.md). Within the window
    ``warmup <= i < N-2``, only every ``period``-th step evaluates the
    correction-point network call D(x_eul, t_next); skipped steps use
    the extrapolation ``E_i + (C_j - E_j)`` from the most recent
    fully-evaluated step j (the correction-minus-Euler delta varies
    slowly along the trajectory). period=2 drops ~8 of 39 network calls
    at 20 steps, period=4 drops ~12. APPROXIMATE: validate forecast
    skill before production use; default off.
    """
    sigmas = edm.inference_sigmas(cfg, num_inference_steps, dtype=dtype)
    x = noise.astype(dtype) * sigmas[0]

    stochastic = s_churn > 0.0
    inject = churn_noise is not None
    if stochastic:
        if inject:
            # Test/oracle hook: per-step churn noise supplied by the
            # caller (matches the reference's injectable ``randn_like``
            # parameter, pipelines/edm_sampler.py:16) so reference-parity
            # tests can drive both samplers with identical draws.
            assert churn_noise.shape == (num_inference_steps, *x.shape), \
                (churn_noise.shape, (num_inference_steps, *x.shape))
            step_keys = churn_noise.astype(dtype)
        elif churn_key is None:
            raise ValueError("churn_key required when s_churn > 0")
        else:
            step_keys = jax.random.split(churn_key, num_inference_steps)
        gamma_base = min(s_churn / num_inference_steps, 2.0**0.5 - 1.0)
    else:
        step_keys = jnp.zeros((num_inference_steps, 2), dtype=jnp.uint32)

    t_cur_arr = sigmas[:-1]
    t_next_arr = sigmas[1:]
    p = correction_skip_period
    n_scan = max(num_inference_steps - 1, 0)
    if p > 1:
        idxs = jnp.arange(n_scan)
        skip_arr = (idxs >= correction_skip_warmup) & \
            (((idxs - correction_skip_warmup) % p) != 0) & \
            (idxs < n_scan - 1)
    else:
        p = 0  # 0/1 both mean "exact"
        skip_arr = jnp.zeros((n_scan,), bool)

    def heun_step(carry, inp):
        x_cur, delta_prev = carry
        t_cur, t_next, key, skip = inp
        if stochastic:
            in_range = (t_cur >= s_min) & (t_cur <= s_max)
            gamma = jnp.where(in_range, gamma_base, 0.0)
            t_hat = t_cur + gamma * t_cur
            eps = key if inject else jax.random.normal(
                key, x_cur.shape, dtype=x_cur.dtype)
            x_hat = x_cur + jnp.sqrt(t_hat**2 - t_cur**2) * s_noise * eps
        else:
            t_hat = t_cur
            x_hat = x_cur
        e = denoised_fn(x_hat, t_hat)
        d1 = (x_hat - e) / t_hat
        x_eul = x_hat + (t_next - t_hat) * d1
        # 2nd-order correction (t_next > 0 on all scanned steps)
        if p > 0:
            c, delta = jax.lax.cond(
                skip,
                lambda: (e + delta_prev, delta_prev),
                lambda: ((lambda cc: (cc, cc - e))(
                    denoised_fn(x_eul, t_next))))
        else:
            c = denoised_fn(x_eul, t_next)
            delta = delta_prev
        d2 = (x_eul - c) / t_next
        x_next = x_hat + (t_next - t_hat) * (0.5 * d1 + 0.5 * d2)
        return (x_next, delta), None

    if num_inference_steps > 1:
        (x, _), _ = jax.lax.scan(
            heun_step, (x, jnp.zeros_like(x)),
            (t_cur_arr[:-1], t_next_arr[:-1], step_keys[:-1], skip_arr))

    # Final step: Euler only (reference skips the correction at i == N-1).
    t_cur, t_next = t_cur_arr[-1], t_next_arr[-1]
    if stochastic:
        # gamma at the final step (same churn rule)
        in_range = (t_cur >= s_min) & (t_cur <= s_max)
        gamma = jnp.where(in_range, gamma_base, 0.0)
        t_hat = t_cur + gamma * t_cur
        eps = step_keys[-1] if inject else jax.random.normal(
            step_keys[-1], x.shape, dtype=x.dtype)
        x = x + jnp.sqrt(t_hat**2 - t_cur**2) * s_noise * eps
        t_cur = t_hat
    d1 = (x - denoised_fn(x, t_cur)) / t_cur
    x = x + (t_next - t_cur) * d1
    return x.astype(jnp.float32)


def dpm_multistep_sample(
    cfg: EDMSchedulerConfig,
    denoised_fn: DenoisedFn,
    noise: jnp.ndarray,
    num_inference_steps: int,
    *,
    dtype=jnp.float32,
    init_scale: Optional[float] = None,
) -> jnp.ndarray:
    """DPM-Solver++ 2M sampling (diffusers EDMDPMSolverMultistepScheduler
    with solver_order=2, solver_type='midpoint', final_sigmas_type='zero').

    First step and final step use the 1st-order update (the scheduler's
    ``lower_order_nums`` warmup and ``lower_order_final`` rule); middle
    steps use the 2M midpoint update. The step math is oracle-verified
    against the actual reference pipeline (tests/test_oracle_samplers.py).

    ``init_scale``: multiplier applied to the unit Gaussian ``noise`` to
    form x0. Default (None) uses sigma_max -- the mathematically correct
    start for a flow whose first step assumes sigma = sigmas[0]. NOTE a
    documented deviation from the reference here: its "pipeline"/"ms"
    sampler starts from UNSCALED unit noise (pipeline_AR.py:77-85 never
    multiplies by scheduler.init_noise_sigma), which contracts the
    ensemble spread by ~sigma_max/sigma_data (the flow treats the std-1
    start as if it were std-80) -- likely why the reference defaults to
    the 'edm' sampler (pred_rollout.py:183). Pass ``init_scale=1.0`` to
    reproduce that reference behavior exactly.
    """
    assert cfg.solver_order == 2 and cfg.solver_type == "midpoint"
    sigmas = edm.inference_sigmas(cfg, num_inference_steps, dtype=dtype)
    x = noise.astype(dtype) * (sigmas[0] if init_scale is None
                               else jnp.asarray(init_scale, dtype))

    # lambda(sigma) = -log(sigma); guard the trailing zero sigma.
    log_sigmas = jnp.log(jnp.maximum(sigmas, jnp.finfo(dtype).tiny))
    n = num_inference_steps

    def body(carry, inp):
        x, m_prev = carry
        i, s_cur, s_next, s_prev = inp
        m0 = denoised_fn(x, s_cur)

        lam_t = -jnp.where(s_next > 0, jnp.log(s_next), -jnp.inf)
        lam_s0 = -jnp.log(s_cur)
        lam_s1 = -jnp.log(s_prev)
        h = lam_t - lam_s0
        h0 = lam_s0 - lam_s1
        ratio = jnp.where(s_next > 0, s_next / s_cur, 0.0)
        em1 = jnp.where(s_next > 0, jnp.exp(-h) - 1.0, -1.0)

        x_first = ratio * x - em1 * m0

        r0 = h0 / jnp.where(h == 0, 1.0, h)
        r0_safe = jnp.where(r0 == 0, 1.0, r0)
        d1 = (m0 - m_prev) / r0_safe
        x_second = ratio * x - em1 * m0 - 0.5 * em1 * d1

        use_first = (i == 0) | (i == n - 1)
        x_new = jnp.where(use_first, x_first, x_second)
        return (x_new, m0), None

    idx = jnp.arange(n)
    s_cur = sigmas[:-1]
    s_next = sigmas[1:]
    s_prev = jnp.concatenate([sigmas[:1], sigmas[:-2]])  # sigma_{i-1} (i>=1)
    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)),
                             (idx, s_cur, s_next, s_prev))
    del log_sigmas
    return x.astype(jnp.float32)
