"""End-to-end forecast pipeline: ERA5 fields -> DCAE encode -> latent
ensemble rollout -> DCAE decode -> fields, all on-device.

TPU-native replacement for the reference's host-orchestrated
``roll_out_serial`` + ``AutoRegressive2DPipeline`` + ``decode_latent_ens``
stack (pipelines/utils.py:250-742): here each stage is a jitted function
and the hot path (the AR ensemble rollout) is a single compiled program.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu import static_data
from ladcast_tpu.config import (
    DCAEConfig,
    EDMSchedulerConfig,
    LaDCastDiTConfig,
    RolloutConfig,
)
from ladcast_tpu.data import transforms
from ladcast_tpu.models.dcae import AutoencoderDC
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from ladcast_tpu.rollout.engine import ensemble_rollout


@dataclass
class ForecastPipeline:
    """Bundles model defs + params + normalization constants.

    All public methods take/return channels-last arrays. Latent
    normalization uses the bundled 84-vector stats with target_std = EDM
    sigma_data (train_AR.py:498-500, pred_rollout.py:222-225).
    """

    dit_cfg: LaDCastDiTConfig
    dcae_cfg: DCAEConfig
    sched_cfg: EDMSchedulerConfig
    rollout_cfg: RolloutConfig
    dit_params: dict
    dcae_params: dict

    def __post_init__(self):
        self.dit = LaDCastTransformer3D(self.dit_cfg)
        self.dcae = AutoencoderDC(self.dcae_cfg)
        lm, ls = static_data.latent_mean_std()
        self.latent_mean = jnp.asarray(lm)
        self.latent_std = jnp.asarray(ls)
        fm, fs = static_data.era5_mean_std()
        self.field_mean = jnp.asarray(fm)
        self.field_std = jnp.asarray(fs)
        self.static_cond = jnp.asarray(
            static_data.static_conditioning_tensor(layout="HWC"))

    # -- latent-space helpers ------------------------------------------------

    def normalize_latent(self, z):
        return transforms.normalize(z, self.latent_mean, self.latent_std,
                                    self.rollout_cfg.latent_target_std)

    def unnormalize_latent(self, z):
        return transforms.inverse_normalize(
            z, self.latent_mean, self.latent_std,
            self.rollout_cfg.latent_target_std)

    # -- stages ---------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def encode_fields(self, fields):
        """(B, H, W, 84) normalized fields -> (B, 15, 30, 84) physical
        latents (static channels concatenated inside, DCAE.py:988-989)."""
        return self.dcae.apply(self.dcae_params, fields, self.static_cond,
                               method=AutoencoderDC.encode)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def decode_latents(self, latents_norm, chunk: int = 40):
        """(E, T, 15, 30, 84) normalized latents -> (E, T, H, W, 84)
        normalized fields; frames batched through the decoder in chunks to
        bound decoder activation memory (the reference decodes member-by-
        member on host loop, pipelines/utils.py:209-229)."""
        E, T, h, w, C = latents_norm.shape
        z = self.unnormalize_latent(latents_norm).reshape(E * T, h, w, C)
        n = E * T
        pad = (-n) % chunk
        if pad:
            z = jnp.concatenate([z, jnp.zeros((pad, h, w, C), z.dtype)])
        z = z.reshape(-1, chunk, h, w, C)
        dec = jax.lax.map(
            lambda zc: self.dcae.apply(self.dcae_params, zc,
                                       method=AutoencoderDC.decode), z)
        dec = dec.reshape(-1, *dec.shape[2:])[:n]
        return dec.reshape(E, T, *dec.shape[1:])

    def _net_fn(self, latents, c_noise, cond, yp):
        return self.dit.apply(self.dit_params, latents, c_noise, cond, yp)

    @functools.partial(jax.jit, static_argnums=0)
    def forecast_latents(self, known_latents_norm, year_progress, key):
        """(E, T_in, 15, 30, 84) normalized conditioning latents ->
        (E, total_steps, 15, 30, 84) normalized forecast latents."""
        return ensemble_rollout(
            self._net_fn, known_latents_norm, year_progress, key,
            self.sched_cfg, self.rollout_cfg, latent_std=self.latent_std)

    # -- convenience ----------------------------------------------------------

    def forecast_from_fields(self, fields, init_ts_int: int, key,
                             decode: bool = True):
        """fields: (T_in, H, W, 84) normalized ERA5 input frames.

        Returns (traj_latents_norm, decoded_fields_or_None). The t=0 frame
        is not included (matches reference prediction_timedelta>0 slots).
        """
        from ladcast_tpu.data import time_utils

        cfg = self.rollout_cfg
        z = self.encode_fields(fields)  # (T_in, 15, 30, 84)
        z = self.normalize_latent(z)
        known = jnp.broadcast_to(z[None], (cfg.ensemble_size, *z.shape))
        yp = jnp.asarray(time_utils.rollout_year_progress(
            init_ts_int, cfg.num_repetitions,
            cfg.step_size_hour * cfg.return_seq_len))
        traj = self.forecast_latents(known, yp, key)
        decoded = self.decode_latents(traj) if decode else None
        return traj, decoded
