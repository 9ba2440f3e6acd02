"""EDM scheduler numerics + sampler correctness.

Golden values are hand-derived from the Karras formulas (no diffusers in
this image); the sampler test uses a Gaussian toy distribution whose true
denoiser D(x; sigma) is analytic, so Heun/DPM must recover samples with
the data statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import EDMSchedulerConfig, NoiseSamplerConfig
from ladcast_tpu.diffusion import edm
from ladcast_tpu.diffusion.noise_sampler import sample_sigma_indices
from ladcast_tpu.diffusion.samplers import dpm_multistep_sample, edm_heun_sample

CFG = EDMSchedulerConfig()


def test_karras_sigma_endpoints_and_monotonicity():
    s = np.asarray(edm.karras_sigmas(CFG, 1000))
    assert abs(s[0] - 80.0) < 1e-3
    assert abs(s[-1] - 0.002) < 1e-6
    assert (np.diff(s) < 0).all()
    # Hand-computed middle value: ramp=0.5 ->
    # (80^(1/7) + 0.5*(0.002^(1/7) - 80^(1/7)))^7
    mid = (80 ** (1 / 7) + 0.5 * (0.002 ** (1 / 7) - 80 ** (1 / 7))) ** 7
    s11 = np.asarray(edm.karras_sigmas(CFG, 11))
    np.testing.assert_allclose(s11[5], mid, rtol=1e-5)


def test_preconditioning_identities():
    sigma = jnp.asarray(1.7)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 3).astype(np.float32))
    f = jnp.asarray(np.random.RandomState(1).randn(4, 3).astype(np.float32))
    sd = CFG.sigma_data
    np.testing.assert_allclose(
        np.asarray(edm.precondition_inputs(CFG, x, sigma)),
        np.asarray(x) / np.sqrt(1.7**2 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(edm.precondition_noise(sigma)), 0.25 * np.log(1.7), rtol=2e-4)
    want = (sd**2 / (1.7**2 + sd**2)) * np.asarray(x) + \
        (1.7 * sd / np.sqrt(1.7**2 + sd**2)) * np.asarray(f)
    np.testing.assert_allclose(
        np.asarray(edm.precondition_outputs(CFG, x, f, sigma)), want, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(edm.edm_loss_weighting(CFG, sigma)),
        (1.7**2 + sd**2) / (1.7 * sd) ** 2, rtol=1e-6)


def _gaussian_denoiser(mu, data_var):
    """For x ~ N(mu, data_var) + sigma*eps: D(x;sigma) = (data_var*x +
    sigma^2*mu) / (data_var + sigma^2) -- exact posterior mean."""

    def denoised(x, sigma):
        return (data_var * x + sigma**2 * mu) / (data_var + sigma**2)

    return denoised


def test_heun_sampler_recovers_gaussian():
    mu, var = 1.3, CFG.sigma_data**2
    den = _gaussian_denoiser(mu, var)
    noise = jax.random.normal(jax.random.PRNGKey(0), (4096,), jnp.float32)
    out = np.asarray(edm_heun_sample(CFG, den, noise, 20))
    # Exact ODE flow maps N(0, sigma_max^2) to N(mu, var).
    assert abs(out.mean() - mu) < 0.05
    assert abs(out.std() - np.sqrt(var)) < 0.05


def test_dpm_sampler_recovers_gaussian():
    mu, var = -0.7, CFG.sigma_data**2
    den = _gaussian_denoiser(mu, var)
    noise = jax.random.normal(jax.random.PRNGKey(1), (4096,), jnp.float32)
    out = np.asarray(dpm_multistep_sample(CFG, den, noise, 30))
    assert abs(out.mean() - mu) < 0.05
    assert abs(out.std() - np.sqrt(var)) < 0.08


def test_heun_deterministic_and_batch_consistent():
    den = _gaussian_denoiser(0.0, CFG.sigma_data**2)
    noise = jax.random.normal(jax.random.PRNGKey(2), (8, 3), jnp.float32)
    a = np.asarray(edm_heun_sample(CFG, den, noise, 10))
    b = np.asarray(edm_heun_sample(CFG, den, noise, 10))
    np.testing.assert_array_equal(a, b)
    # Per-row independence: first row alone == first row of the batch.
    c = np.asarray(edm_heun_sample(CFG, den, noise[:1], 10))
    np.testing.assert_allclose(c[0], a[0], rtol=1e-6)


def test_noise_sampler_index_stats():
    ns = NoiseSamplerConfig()
    idx = np.asarray(sample_sigma_indices(
        jax.random.PRNGKey(0), 4096, 0, ns, CFG))
    assert idx.dtype == np.int32
    assert idx.min() >= 0 and idx.max() < CFG.num_train_timesteps
    sig = np.asarray(edm.train_sigmas(CFG))[idx]
    # log sigma should be ~ N(-1.2, 1.2) (clipped by schedule range)
    assert abs(np.log(sig).mean() - (-1.2)) < 0.1
    assert abs(np.log(sig).std() - 1.2) < 0.12


def test_heun_correction_skip():
    """Opt-in correction-skip sampler: period<=1 is bit-identical to the
    exact path; skipping stays close to the full sampler on a smooth
    denoiser (the delta-extrapolation premise) and differs from it (the
    skip actually engages)."""
    from ladcast_tpu.diffusion.samplers import edm_heun_sample

    cfg = EDMSchedulerConfig()
    rng = np.random.RandomState(0)
    noise = jnp.asarray(rng.randn(2, 3, 8, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 8).astype(np.float32)) * 0.1

    def denoised(x, sigma):
        # smooth nonlinear pseudo-denoiser: contraction toward a fixed
        # linear transform of x (varies smoothly with sigma)
        a = 1.0 / (1.0 + sigma)
        return a * (x @ w + 0.5 * jnp.tanh(x))

    full = edm_heun_sample(cfg, denoised, noise, 20)
    same = edm_heun_sample(cfg, denoised, noise, 20,
                           correction_skip_period=1)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(same))

    skip2 = edm_heun_sample(cfg, denoised, noise, 20,
                            correction_skip_period=2)
    d = np.asarray(skip2) - np.asarray(full)
    scale = float(np.std(np.asarray(full)))
    assert np.isfinite(d).all()
    assert 0 < float(np.max(np.abs(d)))        # skip engaged
    # loose smoke bound: the synthetic pseudo-denoiser is harsher on the
    # extrapolation than a trained denoiser (whose correction deltas
    # shrink near the data manifold); real-skill validation needs real
    # weights (samplers.py docstring).
    assert float(np.max(np.abs(d))) < 0.25 * scale
