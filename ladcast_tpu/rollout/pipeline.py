"""End-to-end forecast pipeline: ERA5 fields -> DCAE encode -> latent
ensemble rollout -> DCAE decode -> fields, all on-device.

TPU-native replacement for the reference's host-orchestrated
``roll_out_serial`` + ``AutoRegressive2DPipeline`` + ``decode_latent_ens``
stack (pipelines/utils.py:250-742): here each stage is a jitted function
and the hot path (the AR ensemble rollout) is a single compiled program.

Model parameters are EXPLICIT arguments of every jitted stage: large
arrays captured as closure constants get serialized into the lowered
module and make (remote) compilation pathologically slow. Only small
normalization constants are closed over.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
from ladcast_tpu.rollout.engine import ensemble_rollout, make_repetition_fn


def cast_pytree(tree, dtype):
    """Jitted whole-tree dtype cast (one compile instead of one eager
    convert per leaf -- each eager convert costs a round trip on remote
    backends)."""
    return jax.jit(lambda t: jax.tree.map(
        lambda x: x.astype(dtype), t))(tree)


@dataclass
class ForecastPipeline:
    """Bundles model defs + params + normalization constants.

    All public methods take/return channels-last arrays. Latent
    normalization uses the bundled 84-vector stats with target_std = EDM
    sigma_data (train_AR.py:498-500, pred_rollout.py:222-225).

    ``compute_dtype``: activation/param dtype for the network forward
    passes (bfloat16 on TPU by default); the EDM trajectory math stays in
    ``rollout_cfg.trajectory_dtype`` (fp32).

    ``ens_mesh``: optional 1-D device mesh. When set, ensemble members
    (and decode frames) are sharded over its single axis and parameters
    are replicated — the SPMD deployment mode on a pod slice, where the
    member forwards are embarrassingly parallel over ICI (SURVEY §2.2).
    The member PRNG is folded per member index (not per device), so the
    random draws are mesh-independent; outputs match the unsharded run
    up to XLA fusion/reduction-order reassociation (~1e-4 relative).

    ``host_step``: drive the AR loop from the host — one jitted
    repetition program per AR step instead of one monolithic scanned
    rollout. Same math and PRNG streams (the per-repetition keys come
    from the identical split of ``key``), so the trajectories are equal;
    what changes is deployment shape: a ~N-times smaller program to
    compile and ~N-times shorter device executions, which remote-attached
    chips tolerate and which lets the host report per-repetition
    progress. The scanned engine stays the default for directly-attached
    pods (zero dispatch gaps).
    """

    dit_cfg: LaDCastDiTConfig
    dcae_cfg: DCAEConfig
    sched_cfg: EDMSchedulerConfig
    rollout_cfg: RolloutConfig
    dit_params: dict
    dcae_params: dict
    compute_dtype: str = "bfloat16"
    ens_mesh: Optional[Mesh] = None
    host_step: bool = False

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
        cdt = jnp.dtype(self.compute_dtype)
        if cdt != jnp.float32:
            self.dit_params = cast_pytree(self.dit_params, cdt)
            self.dcae_params = cast_pytree(self.dcae_params, cdt)
        self._cdt = cdt
        if self.ens_mesh is not None:
            # commit params replicated ONCE (a per-call implicit reshard
            # would re-broadcast them on every init time)
            repl = NamedSharding(self.ens_mesh, P())
            self.dit_params = jax.device_put(self.dit_params, repl)
            self.dcae_params = jax.device_put(self.dcae_params, repl)
        self._build_jits()

    def _build_jits(self):
        dit, dcae = self.dit, self.dcae
        sched_cfg, rcfg = self.sched_cfg, self.rollout_cfg
        static_cond = self.static_cond
        latent_std = self.latent_std
        cdt = self._cdt

        def encode(dcae_params, fields):
            z = dcae.apply(dcae_params, fields.astype(cdt),
                           static_cond.astype(cdt),
                           method=AutoencoderDC.encode)
            return z.astype(jnp.float32)

        mesh, ens_ax = self.ens_mesh, None
        if mesh is not None:
            (ens_ax,) = mesh.axis_names

        def decode_chunked(dcae_params, z_phys, chunk):
            n, h, w, C = z_phys.shape
            pad = (-n) % chunk
            if pad:
                z_phys = jnp.concatenate(
                    [z_phys, jnp.zeros((pad, h, w, C), z_phys.dtype)])
            zc = z_phys.reshape(-1, chunk, h, w, C)
            if mesh is not None:
                # lax.map steps sequentially over chunks; shard each
                # chunk's frames over the mesh so every step decodes in
                # parallel on all devices
                zc = jax.lax.with_sharding_constraint(
                    zc, NamedSharding(mesh, P(None, ens_ax)))
            dec = jax.lax.map(
                lambda z: dcae.apply(dcae_params, z.astype(cdt),
                                     method=AutoencoderDC.decode), zc)
            dec = dec.reshape(-1, *dec.shape[2:])[:n]
            return dec.astype(jnp.float32)

        fm, fs = self.field_mean, self.field_std

        def decode_latents(dcae_params, latents_norm, chunk):
            E, T = latents_norm.shape[:2]
            z = self.unnormalize_latent(latents_norm)
            dec = decode_chunked(dcae_params, z.reshape(E * T, *z.shape[2:]),
                                 chunk)
            # decoded fields leave the pipeline in PHYSICAL units, like the
            # reference decode_latent_ens (pipelines/utils.py:51-80 applies
            # inverse_normalize_transform_3D with the field stats)
            dec = transforms.inverse_normalize(dec, fm, fs, 1.0)
            return dec.reshape(E, T, *dec.shape[1:])

        def forecast(dit_params, known_latents_norm, year_progress, key):
            def net_fn(latents, c_noise, cond, yp):
                out = dit.apply(dit_params, latents.astype(cdt), c_noise,
                                cond.astype(cdt), yp)
                return out.astype(jnp.float32)

            return ensemble_rollout(
                net_fn, known_latents_norm, year_progress, key,
                sched_cfg, rcfg, latent_std=latent_std)

        def net_fn_rep(dit_params, latents, c_noise, cond, yp):
            out = dit.apply(dit_params, latents.astype(cdt), c_noise,
                            cond.astype(cdt), yp)
            return out.astype(jnp.float32)

        rep_fn = make_repetition_fn(sched_cfg, rcfg)

        def repetition(dit_params, known, yp, rep_key):
            return rep_fn(net_fn_rep, dit_params, known, yp, rep_key)

        self._ens_sharding = None
        self._n_ens_dev = 1
        if mesh is None:
            self._encode_jit = jax.jit(encode)
            self._decode_jit = jax.jit(decode_latents, static_argnums=2)
            self._forecast_jit = jax.jit(forecast)
            self._rep_jit = jax.jit(repetition)
        else:
            repl = NamedSharding(mesh, P())
            ens = NamedSharding(mesh, P(ens_ax))
            self._ens_sharding = ens
            self._n_ens_dev = mesh.devices.size
            # encode sees T_in (1-2) frames — replicated, not worth
            # splitting; forecast/decode shard members/frames on axis 0
            self._encode_jit = jax.jit(encode, in_shardings=(repl, repl),
                                       out_shardings=repl)
            self._decode_jit = jax.jit(decode_latents, static_argnums=2,
                                       in_shardings=(repl, ens),
                                       out_shardings=ens)
            self._forecast_jit = jax.jit(
                forecast, in_shardings=(repl, ens, repl, repl),
                out_shardings=ens)
            self._rep_jit = jax.jit(
                repetition, in_shardings=(repl, ens, repl, repl),
                out_shardings=(ens, ens))

    # -- latent-space helpers ------------------------------------------------

    def normalize_latent(self, z):
        return transforms.normalize(z, self.latent_mean, self.latent_std,
                                    self.rollout_cfg.latent_target_std)

    def unnormalize_latent(self, z):
        return transforms.inverse_normalize(
            z, self.latent_mean, self.latent_std,
            self.rollout_cfg.latent_target_std)

    # -- stages ----------------------------------------------------------------

    def encode_fields(self, fields):
        """(B, H, W, 84) normalized fields -> (B, 15, 30, 84) physical
        latents (static channels concatenated inside, DCAE.py:988-989)."""
        return self._encode_jit(self.dcae_params, fields)

    def _pad_members(self, x):
        """Pad axis 0 (members/frames) to a multiple of the mesh size —
        explicit in/out shardings require divisibility (XLA does not pad
        committed arrays). Padded rows repeat member 0 and are sliced
        off by the caller; each member's math depends only on its own
        index-folded key, so padding cannot perturb the real members.
        Returns (x_padded_and_committed, pad)."""
        pad = (-x.shape[0]) % self._n_ens_dev
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad, *x.shape[1:]))])
        # inputs committed elsewhere (e.g. the replicated encode output)
        # must be re-laid-out explicitly: jit with explicit in_shardings
        # refuses implicit resharding of committed args
        return jax.device_put(x, self._ens_sharding), pad

    def decode_latents(self, latents_norm, chunk: int = 40):
        """(E, T, 15, 30, 84) normalized latents -> (E, T, H, W, 84)
        PHYSICAL fields (field z-scoring undone, matching the reference
        decode_latent_ens, pipelines/utils.py:51-80); frames batched
        through the decoder in chunks to bound decoder activation memory
        (the reference decodes member-by-member in a host loop,
        pipelines/utils.py:209-229)."""
        if self._ens_sharding is not None:
            E = latents_norm.shape[0]
            latents_norm, pad = self._pad_members(latents_norm)
            dec = self._decode_jit(self.dcae_params, latents_norm, chunk)
            return dec[:E] if pad else dec
        return self._decode_jit(self.dcae_params, latents_norm, chunk)

    def forecast_latents(self, known_latents_norm, year_progress, key):
        """(E, T_in, 15, 30, 84) normalized conditioning latents ->
        (E, total_steps, 15, 30, 84) normalized forecast latents."""
        if self.host_step:
            return self._forecast_hostloop(known_latents_norm,
                                           year_progress, key)
        if self._ens_sharding is not None:
            E = known_latents_norm.shape[0]
            known_latents_norm, pad = self._pad_members(known_latents_norm)
            traj = self._forecast_jit(self.dit_params, known_latents_norm,
                                      year_progress, key)
            return traj[:E] if pad else traj
        return self._forecast_jit(self.dit_params, known_latents_norm,
                                  year_progress, key)

    def _forecast_hostloop(self, known_latents_norm, year_progress, key):
        """Host-stepped rollout via ``engine.ensemble_rollout_hostloop``
        (the single implementation of the scanned==host-stepped PRNG
        contract), plus the pipeline's member padding for ens-mesh runs.
        The initial-latent perturbation is member-independent, so it
        commutes with the member-row padding
        (tests/test_pipeline_e2e.py asserts equality vs the scanned
        engine, incl. noise_level > 0 and ens-mesh runs)."""
        from ladcast_tpu.rollout.engine import ensemble_rollout_hostloop

        cfg = self.rollout_cfg
        known = known_latents_norm
        E = known.shape[0]
        pad = 0
        if self._ens_sharding is not None:
            known, pad = self._pad_members(known)
        traj = ensemble_rollout_hostloop(
            self._rep_jit, self.dit_params, known, year_progress, key,
            cfg, latent_std=self.latent_std)
        return traj[:E] if pad else traj

    # -- convenience -------------------------------------------------------------

    def forecast_from_fields(self, fields, init_ts_int: int, key,
                             decode: bool = True):
        """fields: (T_in, H, W, 84) normalized ERA5 input frames.

        Returns (traj_latents_norm, decoded_fields_or_None, z_analysis)
        where z_analysis is the (T_in, 15, 30, 84) PHYSICAL-scale encoder
        output of the inputs (the reference stores its last frame at
        prediction_timedelta 0, pipelines/utils.py:495-504). The forecast
        trajectory does not include the t=0 frame (matches reference
        prediction_timedelta>0 slots).
        """
        from ladcast_tpu.data import time_utils

        cfg = self.rollout_cfg
        z_phys = self.encode_fields(fields)  # (T_in, 15, 30, 84) physical
        z = self.normalize_latent(z_phys)
        known = jnp.broadcast_to(z[None], (cfg.ensemble_size, *z.shape))
        yp = jnp.asarray(time_utils.rollout_year_progress(
            init_ts_int, cfg.num_repetitions,
            cfg.step_size_hour * cfg.return_seq_len))
        traj = self.forecast_latents(known, yp, key)
        decoded = self.decode_latents(traj) if decode else None
        return traj, decoded, z_phys
