"""Autoregressive ensemble rollout engine -- the framework's flagship path.

Reference behavior being rebuilt (SURVEY.md section 3.2): the reference
loops ensemble members in host-side Python batches
(pipelines/utils.py:664-742), calls the Heun sampler 10x per init time with
frame feedback (pipelines/utils.py:533-563), and leaves the device for
every decode. Here the ENTIRE 240h forecast is one jitted function:

  * ensemble members ride the batch dimension (and shard over the mesh's
    'ens' axis -- every member's denoiser call is a single large batched
    matmul, MXU-friendly);
  * the AR feedback loop is an outer ``lax.scan`` carrying the conditioning
    frames;
  * each 4-frame chunk is denoised by the Heun/DPM sampler's inner
    ``lax.scan``;
  * nothing returns to the host until the full latent trajectory
    (E, total_steps, 15, 30, 84) is ready.

Reproducible ensembles: the reference seeds member i with CPU generator
seed i (pipelines/utils.py:703-705). We fold the member index into the base
PRNG key -- the same determinism contract (member i identical across runs
and across batch splits), with TPU-native randomness.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ladcast_tpu.config import EDMSchedulerConfig, RolloutConfig
from ladcast_tpu.diffusion import edm
from ladcast_tpu.diffusion.samplers import dpm_multistep_sample, edm_heun_sample

# net_fn(latents (E,T,H,W,C), c_noise (E,), cond (E,Tin,H,W,C), yp (E,)) -> F
NetFn = Callable[..., jnp.ndarray]


def member_noise(key: jax.Array, num_members: int, shape, dtype=jnp.float32):
    """Per-member Gaussian noise with member-index key folding: member i's
    stream depends only on (key, i), mirroring the reference's
    seed-by-member-index contract."""
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(num_members))
    return jax.vmap(lambda k: jax.random.normal(k, shape, dtype))(keys)


def ensemble_rollout(
    net_fn: NetFn,
    known_latents: jnp.ndarray,      # (E, T_in, H, W, C) normalized latents
    year_progress: jnp.ndarray,      # (num_repetitions,) float32
    key: jax.Array,
    sched_cfg: EDMSchedulerConfig,
    cfg: RolloutConfig,
    *,
    latent_std: Optional[jnp.ndarray] = None,  # (C,) physical latent std
    rep_noise: Optional[jnp.ndarray] = None,
    pert_noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run the full AR ensemble forecast.

    Returns (E, num_repetitions * return_seq_len, H, W, C) normalized
    latent frames (lead times step_size_hour .. total; the t=0 frame is the
    caller's input, as in pipelines/utils.py:486-505).

    ``rep_noise`` (n_reps, E, T_out, H, W, C) / ``pert_noise``
    (T_in, H, W, C): optional caller-supplied Gaussian draws replacing the
    internally generated sampler/perturbation noise -- the injection hook
    the reference-parity golden-rollout oracle uses to drive this engine
    and the actual reference ensemble_AR_sampler loop with identical
    randomness (tests/test_oracle_rollout.py).
    """
    E, T_in, H, W, C = known_latents.shape
    T_out = cfg.return_seq_len
    n_reps = cfg.num_repetitions
    assert year_progress.shape[0] == n_reps
    traj_dtype = jnp.dtype(cfg.trajectory_dtype)

    key, pert_key = jax.random.split(key)
    if cfg.noise_level > 0:
        # Initial-latent perturbation (pipelines/utils.py:514-528): ONE
        # noise draw scaled by noise_level * per-channel PHYSICAL latent
        # std, added in normalized space and SHARED by all ensemble
        # members -- the reference perturbs the (C,T,H,W) initial latent
        # BEFORE the member broadcast inside ensemble_AR_sampler
        # (utils.py:705-712). Oracle-pinned by test_oracle_rollout.
        assert latent_std is not None
        pert = (pert_noise.astype(known_latents.dtype)
                if pert_noise is not None else
                jax.random.normal(pert_key, (T_in, H, W, C),
                                  known_latents.dtype))
        known_latents = known_latents + pert * cfg.noise_level * latent_std

    rep_keys = jax.random.split(key, n_reps)
    if rep_noise is not None:
        assert rep_noise.shape == (n_reps, E, T_out, H, W, C), rep_noise.shape
        rep_xs = rep_noise.astype(traj_dtype)
    else:
        rep_xs = rep_keys

    def one_repetition(known, inputs):
        rep_key, yp = inputs
        noise = (rep_key if rep_noise is not None else
                 member_noise(rep_key, E, (T_out, H, W, C), traj_dtype))

        yp_b = jnp.broadcast_to(yp, (E,))

        def raw_net(x_in, c_noise):
            cn = jnp.broadcast_to(c_noise, (E,))
            return net_fn(x_in, cn, known, yp_b)

        def denoised_fn(x, sigma):
            x_in = edm.precondition_inputs(sched_cfg, x, sigma)
            c_noise = edm.precondition_noise(sigma)
            f = raw_net(x_in.astype(jnp.float32), c_noise.astype(jnp.float32))
            return edm.precondition_outputs(sched_cfg, x, f.astype(x.dtype),
                                            sigma)

        if cfg.sampler_type == "edm":
            samples = edm_heun_sample(
                sched_cfg, denoised_fn, noise, cfg.num_inference_steps,
                dtype=traj_dtype,
                correction_skip_period=cfg.correction_skip_period)
        elif cfg.sampler_type == "dpm":
            samples = dpm_multistep_sample(
                sched_cfg, denoised_fn, noise, cfg.num_inference_steps,
                dtype=traj_dtype, init_scale=cfg.dpm_init_scale)
        else:
            raise ValueError(cfg.sampler_type)

        samples = samples.astype(known.dtype)
        new_known = samples[:, -T_in:]  # frame feedback (utils.py:563)
        return new_known, samples

    _, traj = jax.lax.scan(one_repetition, known_latents,
                           (rep_xs, year_progress))
    # (n_reps, E, T_out, H, W, C) -> (E, n_reps*T_out, H, W, C)
    traj = jnp.moveaxis(traj, 0, 1).reshape(E, n_reps * T_out, H, W, C)
    return traj[:, : cfg.total_num_steps]


def make_rollout_fn(net_fn: NetFn, sched_cfg: EDMSchedulerConfig,
                    cfg: RolloutConfig):
    """Partial application returning a (known, year_progress, key) -> traj
    function ready for jit/pjit."""
    return partial(ensemble_rollout, net_fn,
                   sched_cfg=sched_cfg, cfg=cfg)


def make_repetition_fn(sched_cfg: EDMSchedulerConfig, cfg: RolloutConfig):
    """One AR repetition as a standalone jittable function:

      rep_fn(net_fn, params, known, year_progress_scalar, key)
        -> (new_known, samples)

    Used by the host-stepped rollout: instead of one monolithic
    240h program, the host dispatches ``num_repetitions`` medium-sized
    executions (same math, same PRNG streams as the scanned version when
    given the same per-repetition keys). Keeps individual device
    executions short -- friendlier to remote-attached TPUs and to
    progress reporting -- at ~zero dispatch overhead relative to the
    multi-second repetition compute.
    """

    def rep_fn(net_fn, params, known, yp, rep_key):
        E, T_in, H, W, C = known.shape
        T_out = cfg.return_seq_len
        traj_dtype = jnp.dtype(cfg.trajectory_dtype)
        noise = member_noise(rep_key, E, (T_out, H, W, C), traj_dtype)
        yp_b = jnp.broadcast_to(yp, (E,))

        def denoised_fn(x, sigma):
            x_in = edm.precondition_inputs(sched_cfg, x, sigma)
            c_noise = jnp.broadcast_to(edm.precondition_noise(sigma), (E,))
            f = net_fn(params, x_in.astype(jnp.float32),
                       c_noise.astype(jnp.float32), known, yp_b)
            return edm.precondition_outputs(sched_cfg, x,
                                            f.astype(x.dtype), sigma)

        if cfg.sampler_type == "edm":
            samples = edm_heun_sample(
                sched_cfg, denoised_fn, noise, cfg.num_inference_steps,
                dtype=traj_dtype,
                correction_skip_period=cfg.correction_skip_period)
        else:
            samples = dpm_multistep_sample(sched_cfg, denoised_fn, noise,
                                           cfg.num_inference_steps,
                                           dtype=traj_dtype,
                                           init_scale=cfg.dpm_init_scale)
        samples = samples.astype(known.dtype)
        return samples[:, -T_in:], samples

    return rep_fn


def ensemble_rollout_hostloop(
    rep_fn_jitted,
    net_params,
    known_latents: jnp.ndarray,
    year_progress,
    key: jax.Array,
    cfg: RolloutConfig,
    latent_std: Optional[jnp.ndarray] = None,
):
    """Host-stepped AR rollout driving a jitted repetition function.

    PRNG contract matches :func:`ensemble_rollout` exactly — the same
    perturbation split, the same member-independent initial-latent
    perturbation when ``cfg.noise_level > 0`` (requires ``latent_std``),
    and per-repetition keys from one split of ``key`` — so the scanned
    and host-stepped rollouts produce identical ensembles given
    identical inputs. This is the single implementation of that
    contract; ``ForecastPipeline`` (``--host_step``) delegates here
    (tests/test_pipeline_e2e.py asserts the equality end to end).
    """
    n_reps = cfg.num_repetitions
    key, pert_key = jax.random.split(key)
    if cfg.noise_level > 0:
        assert latent_std is not None
        pert = jax.random.normal(pert_key, known_latents.shape[1:],
                                 known_latents.dtype)
        known_latents = known_latents + pert * cfg.noise_level * latent_std
    rep_keys = jax.random.split(key, n_reps)
    outs = []
    known = known_latents
    for r in range(n_reps):
        known, samples = rep_fn_jitted(net_params, known,
                                       jnp.asarray(year_progress[r]),
                                       rep_keys[r])
        outs.append(samples)
    traj = jnp.concatenate(outs, axis=1)
    return traj[:, : cfg.total_num_steps]
