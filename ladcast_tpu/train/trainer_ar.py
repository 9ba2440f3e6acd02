"""AR diffusion trainer: EDM-objective training of the LaDCast DiT on
pre-encoded latents.

Rebuilds the reference hot loop (train_AR.py:866-1083, SURVEY.md
section 3.1) as one jitted, mesh-sharded step:

  * lognormal sigma-index sampling per example (models/utils.py:9-50)
  * add_noise + precondition_inputs
  * push-forward trick: target frames split into chunks; chunks >= 1 are
    conditioned on the (stop-gradient) EDM-preconditioned prediction of
    the previous chunk, with year-progress advanced 6h per chunk
    (train_AR.py:927-964)
  * precondition_outputs + EDM lambda(sigma) weighting, optional
    latitude-weighted loss on the 15-row latent grid (train_AR.py:1014-1032)
  * global-norm clip 1.0, AdamW, cosine-min-LR schedule, EMA

Data parallelism: the batch is sharded over the mesh's "data" axis and
parameters replicated -- XLA inserts the gradient all-reduce (the NCCL DDP
equivalent) when the jitted step produces replicated grads.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ladcast_tpu.config import (
    EDMSchedulerConfig,
    LaDCastDiTConfig,
    NoiseSamplerConfig,
)
from ladcast_tpu.diffusion import edm
from ladcast_tpu.diffusion.noise_sampler import sample_sigma_indices
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from ladcast_tpu.train import ema as ema_lib


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    ema: Optional[ema_lib.EMAState]
    step: jnp.ndarray


@dataclass(frozen=True)
class ARTrainConfig:
    num_push_forward_steps: int = 1
    lat_weighted_loss: bool = False
    snr_gamma: Optional[float] = None  # min-SNR-gamma (train_AR.py:1034-1064)
    use_ema: bool = True
    ema_max_decay: float = 0.9999
    ema_power: float = 2.0 / 3.0
    ema_inv_gamma: float = 1.0
    ema_update_after_step: int = 1000
    input_seq_len: int = 1
    compute_dtype: str = "bfloat16"  # activations; params stay fp32
    remat: bool = False              # jax.checkpoint over blocks (1.6B)


def make_ar_train_step(
    dit_cfg: LaDCastDiTConfig,
    sched_cfg: EDMSchedulerConfig,
    ns_cfg: NoiseSamplerConfig,
    tcfg: ARTrainConfig,
    optimizer: optax.GradientTransformation,
):
    """Returns (init_fn, train_step).

    train_step(state, batch, key) -> (state, metrics) where batch is
      initial_profile: (B, T_in, h, w, C) normalized conditioning latents
      clean:           (B, T_out, h, w, C) normalized target latents
      year_progress:   (B, num_push_forward_steps) float32 (host-computed
                       year progress of t0 + 6h*s for each chunk s)
    """
    if tcfg.remat and not dit_cfg.remat:
        # per-block gradient checkpointing (nn.remat on each dual-/single-
        # stream block, models/ladcast_dit.py) -- NOT a whole-model
        # jax.checkpoint, so block-boundary residuals stay saved and only
        # block internals are recomputed (the reference's
        # torch.utils.checkpoint granularity, LaDCast_3D_model.py:979-1010).
        import dataclasses as _dc
        dit_cfg = _dc.replace(dit_cfg, remat=True)
    model = LaDCastTransformer3D(dit_cfg)
    train_sig = edm.train_sigmas(sched_cfg)
    c_dtype = jnp.dtype(tcfg.compute_dtype)

    def _lat_w(height: int):
        # cos-lat weights over latent patch-center latitudes; equals the
        # reference's fixed 15-row table (train_AR.py:858-865) at H=15 and
        # generalizes to other latent grids.
        import numpy as _np
        from ladcast_tpu.metrics.weights import cos_lat_weights
        w = cos_lat_weights(_np.linspace(-83.25, 84.75, height))
        return jnp.asarray(w, jnp.float32).reshape(1, 1, -1, 1, 1)

    def apply_model(params, x_in, c_noise, cond, yp):
        fn = model.apply
        # Mixed precision (reference: accelerate bf16 autocast,
        # configs/ladcast_375M.yaml:74): master params stay fp32 in the
        # optimizer; compute sees a bf16 copy. Without this cast flax's
        # dtype promotion (fp32 kernels x bf16 activations -> fp32) runs
        # every matmul on the slow fp32 MXU path. The astype VJP casts
        # gradients back to fp32.
        params = jax.tree.map(
            lambda x: x.astype(c_dtype)
            if x.dtype == jnp.float32 else x, params)
        return fn(params, x_in.astype(c_dtype), c_noise,
                  cond.astype(c_dtype), yp).astype(jnp.float32)

    def loss_given_noise(params, batch, indices, noise):
        """Deterministic objective with INJECTED sigma indices and noise.

        This is the exact reference loss pipeline (train_AR.py:866-1032)
        minus the random draws; the executable-reference oracle test
        (tests/test_oracle_train_loss.py) drives it with the same
        indices/noise it feeds the reference loop, and loss_fn wraps it
        with the production sampling.
        """
        initial_profile, clean, year_progress = batch
        B, T_out = clean.shape[0], clean.shape[1]
        n_pf = tcfg.num_push_forward_steps
        assert T_out % n_pf == 0
        n_slice = T_out // n_pf
        t_in = tcfg.input_seq_len

        sigma = train_sig[indices].reshape(B, 1, 1, 1, 1)
        c_noise = edm.precondition_noise(sigma.reshape(B))
        noisy = edm.add_noise(clean, noise, sigma)
        x_in = edm.precondition_inputs(sched_cfg, noisy, sigma)

        preds = []
        cond = initial_profile
        for s in range(n_pf):
            sl = slice(s * n_slice, (s + 1) * n_slice)
            if s >= 1:
                prev = slice(s * n_slice - t_in, s * n_slice)
                cond = edm.precondition_outputs(
                    sched_cfg, noisy[:, prev],
                    jax.lax.stop_gradient(preds[-1][:, -t_in:]), sigma)
            preds.append(apply_model(params, x_in[:, sl], c_noise, cond,
                                     year_progress[:, s]))
        model_pred = jnp.concatenate(preds, axis=1)

        model_pred = edm.precondition_outputs(sched_cfg, noisy, model_pred,
                                              sigma)
        sq = (model_pred - clean.astype(jnp.float32)) ** 2
        if tcfg.snr_gamma is None:
            weighting = edm.edm_loss_weighting(sched_cfg, sigma)
            if tcfg.lat_weighted_loss:
                sq = _lat_w(clean.shape[2]) * sq
            loss = jnp.mean(weighting * sq)
        else:
            # min-SNR-gamma (train_AR.py:1034-1064; arXiv 2303.09556):
            # per-example weight min(SNR, gamma)/SNR on the unweighted MSE.
            snr = (sched_cfg.sigma_data / sigma.reshape(B)) ** 2
            w = jnp.minimum(snr, tcfg.snr_gamma) / snr
            per_ex = sq.reshape(B, -1).mean(axis=1)
            loss = jnp.mean(per_ex * w)
        aux = {"loss": loss, "mean_sigma_index": indices.mean()}
        return loss, aux

    def loss_fn(params, batch, key, step):
        clean = batch[1]
        B = clean.shape[0]
        k_idx, k_noise = jax.random.split(key)
        indices = sample_sigma_indices(k_idx, B, step, ns_cfg, sched_cfg)
        noise = jax.random.normal(k_noise, clean.shape, jnp.float32)
        return loss_given_noise(params, batch, indices, noise)

    def train_step(state: TrainState, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema_state = state.ema
        if ema_state is not None:
            ema_state = ema_lib.ema_update(
                ema_state, params,
                inv_gamma=tcfg.ema_inv_gamma, power=tcfg.ema_power,
                max_decay=tcfg.ema_max_decay,
                update_after_step=tcfg.ema_update_after_step)
        aux["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, ema_state, state.step + 1), aux

    def init_fn(key, example_batch):
        initial_profile, clean, year_progress = example_batch
        params = model.init(key, clean, jnp.zeros((clean.shape[0],)),
                            initial_profile, year_progress[:, 0])
        opt_state = optimizer.init(params)
        ema_state = ema_lib.ema_init(params) if tcfg.use_ema else None
        return TrainState(params, opt_state, ema_state,
                          jnp.zeros((), jnp.int32))

    # Deterministic hook for the executable-reference oracle test
    # (tests/test_oracle_train_loss.py): same objective, injected draws.
    train_step.loss_given_noise = loss_given_noise
    return init_fn, train_step
