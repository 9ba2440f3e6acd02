"""Training-time ensemble validation for the AR model.

Equivalent of the reference ``log_validation`` (train_AR.py:54-385): at
epoch boundaries run a real N-member ensemble rollout from held-out
latents and score lat-weighted ens-mean RMSE and CRPS per variable and
lead time. Two scoring modes:

* latent space (cheap, default): metrics on the normalized latents.
* decoded fields (reference parity): when a DCAE and field statistics
  are supplied, both the forecast ensemble AND the truth latents are
  decoded to physical fields (the reference likewise decodes the truth
  from stored latents, train_AR.py:178-199) and scored per (channel,
  lead time) with cos-lat weights -- ensemble-mean RMSE, per-member
  "single" RMSE, and CRPS, matching the reference's wandb tables
  (train_AR.py:284-341, 485-520).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import EDMSchedulerConfig, RolloutConfig
from ladcast_tpu.data import transforms
from ladcast_tpu.metrics import scores
from ladcast_tpu.metrics.weights import latent_lat_weights
from ladcast_tpu.rollout.engine import ensemble_rollout


def validate_ar_model(
    net_fn,                     # net_fn(params, latents, c_noise, cond, yp)
    params,
    val_inputs: jnp.ndarray,    # (N, T_in, h, w, C) normalized latents
    val_targets: jnp.ndarray,   # (N, total_steps, h, w, C) normalized
    year_progress: np.ndarray,  # (N, num_repetitions)
    key: jax.Array,
    sched_cfg: EDMSchedulerConfig,
    rcfg: RolloutConfig,
    *,
    decode_fn=None,             # decode_fn(dcae_params, z (B,h,w,Cl)) ->
                                #   (B, H, W, Cf) normalized fields
    dcae_params=None,
    latent_stats=None,          # (mean, std) physical latent stats, (Cl,)
    field_stats=None,           # (mean, std) full-field stats, (Cf,)
    grid_lat_weight=None,       # (H,) cos-lat weights on the field grid
    target_std: float = 0.5,
) -> Dict[str, np.ndarray]:
    """Run an ensemble rollout per validation init time and score it.

    Always returns latent-space ``latent_rmse`` / ``latent_crps`` of
    shape (num_init_times, total_steps). When ``decode_fn`` (+
    ``dcae_params``, ``latent_stats``, ``field_stats``,
    ``grid_lat_weight``) is supplied, additionally returns decoded
    physical-field tables of shape (num_init_times, C_field,
    total_steps): ``rmse_ens`` (ensemble-mean RMSE, ref
    edm_ens_mse), ``rmse_single`` (RMSE pooled over members, ref
    edm_single_mse), and ``crps`` (ref get_crps + lat weights).
    """
    lat_w = jnp.asarray(latent_lat_weights(), jnp.float32).reshape(-1, 1)
    decoded = decode_fn is not None
    if decoded:
        if dcae_params is None or latent_stats is None \
                or field_stats is None or grid_lat_weight is None:
            raise ValueError("decoded validation needs dcae_params, "
                             "latent_stats, field_stats, grid_lat_weight")
        lm = jnp.asarray(latent_stats[0], jnp.float32)
        ls = jnp.asarray(latent_stats[1], jnp.float32)
        fm = jnp.asarray(field_stats[0], jnp.float32)
        fs = jnp.asarray(field_stats[1], jnp.float32)
        glw = jnp.asarray(grid_lat_weight, jnp.float32).reshape(-1, 1)

    def _decode_traj(dp, z_norm):
        """(..., T, h, w, Cl) normalized latents -> (..., T, H, W, Cf)
        physical fields, chunked over lead time (lax.map keeps peak HBM
        at one lead-time batch, the same chunking the offline scorer
        uses, cli/evaluate_ens.py)."""
        z = transforms.inverse_normalize(z_norm, lm, ls, target_std)
        tax = z.ndim - 4  # lead-time axis (just before h, w, C)
        zt = jnp.moveaxis(z, tax, 0)      # (T, [E,] h, w, Cl)
        squeeze = zt.ndim == 4
        if squeeze:                       # no ensemble dim: batch of 1
            zt = zt[:, None]
        dec = jax.lax.map(lambda zz: decode_fn(dp, zz), zt)
        if squeeze:
            dec = dec[:, 0]
        dec = jnp.moveaxis(dec, 0, tax)
        return transforms.inverse_normalize(dec, fm, fs, 1.0)

    @jax.jit
    def one(p, dp, inp, tgt, yp, k):
        known = jnp.broadcast_to(inp[None],
                                 (rcfg.ensemble_size, *inp.shape))
        traj = ensemble_rollout(
            lambda lat, cn, cond, ypp: net_fn(p, lat, cn, cond, ypp),
            known, yp, k, sched_cfg, rcfg)
        # the last repetition may overshoot the horizon; score only the
        # requested lead times (ref train_AR.py:251 cur_step = min(...))
        traj = traj[:, : tgt.shape[0]]
        ens_mean = traj.mean(axis=0)
        rmse = jnp.sqrt(scores.lat_weighted_mse(
            jnp.moveaxis(ens_mean, -1, 1), jnp.moveaxis(tgt, -1, 1),
            lat_w)).mean(axis=1)  # (T,) averaged over channels
        crps_map = scores.crps(jnp.moveaxis(traj, -1, 2),
                               jnp.moveaxis(tgt, -1, 1), ensemble_axis=0)
        crps = jnp.mean(crps_map * lat_w, axis=(-2, -1)).mean(axis=1)
        out = {"latent_rmse": rmse, "latent_crps": crps}
        if decoded:
            fc = _decode_traj(dp, traj)        # (E, T, H, W, Cf)
            tr = _decode_traj(dp, tgt)         # (T, H, W, Cf)
            fcc = jnp.moveaxis(fc, -1, 0)      # (Cf, E, T, H, W)
            trc = jnp.moveaxis(tr, -1, 0)      # (Cf, T, H, W)
            # ens-mean MSE per (C, T) -- ref train_AR.py:287-295
            out["rmse_ens"] = jnp.sqrt(scores.lat_weighted_mse(
                fcc.mean(axis=1), trc, glw))
            # per-member MSE pooled over members -- ref :284-297
            out["rmse_single"] = jnp.sqrt(jnp.mean(
                ((fcc - trc[:, None]) ** 2 * glw), axis=(1, -2, -1)))
            # CRPS per (C, T) -- ref :308-316
            cm = scores.crps(fcc, trc[:, None], ensemble_axis=1)
            out["crps"] = jnp.mean(cm * glw, axis=(-2, -1))
        return out

    acc: Dict[str, list] = {}
    for i in range(val_inputs.shape[0]):
        key, sub = jax.random.split(key)
        m = one(params, dcae_params, val_inputs[i], val_targets[i],
                jnp.asarray(year_progress[i]), sub)
        for k2, v in m.items():
            acc.setdefault(k2, []).append(np.asarray(v))
    return {k2: np.stack(v) for k2, v in acc.items()}
