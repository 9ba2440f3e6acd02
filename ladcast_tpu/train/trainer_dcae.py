"""DCAE reconstruction trainer.

Rebuilds the reference AE training step (train_encdec.py:619-793,
SURVEY.md section 3.4) as one jitted, mesh-sharded function:

  * SST-NaN masking: prediction AND target forced to the mask value (-2)
    where the input SST was NaN (metric/utils.py:20-63)
  * static-channel reconstruction: target = [fields, statics]
    (train_encdec.py:679-694, return_static=True)
  * latitude-weighted relative L2 loss (LpLoss d=2 p=2, reduce mean)
  * periodic-roll subbatch augmentation: the same batch re-used
    ``subbatch_steps`` times with a random (lat, lon) roll applied
    consistently to data / nan-mask / lat-weights / statics
    (train_encdec.py:655-675); expressed here as extra augmented steps
    driven by the caller passing roll offsets
  * EMA + AdamW + cosine-min-LR (shared train utilities)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ladcast_tpu import channels as ch
from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.metrics.losses import lp_loss, lp_loss_per_var
from ladcast_tpu.metrics.weights import grid_lat_weights
from ladcast_tpu.models.dcae import AutoencoderDC
from ladcast_tpu.train import ema as ema_lib


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    ema: Optional[ema_lib.EMAState]
    step: jnp.ndarray


@dataclass(frozen=True)
class DCAETrainConfig:
    lat_weighted_loss: bool = True
    subbatch_steps: int = 3
    use_ema: bool = True
    ema_max_decay: float = 0.9999
    ema_power: float = 0.66667
    ema_inv_gamma: float = 1.0
    ema_update_after_step: int = 1000
    sst_channel: int = ch.SST_CHANNEL_INDEX
    sst_mask_value: float = -2.0
    compute_dtype: str = "bfloat16"
    ft_decoder_only: bool = False  # --ft_decoder (train_encdec.py:207-210)


def make_dcae_train_step(
    cfg: DCAEConfig,
    tcfg: DCAETrainConfig,
    optimizer: optax.GradientTransformation,
    grid_lat: int = ch.GRID_LAT,
):
    """Returns (init_fn, train_step).

    train_step(state, batch, key) -> (state, metrics); batch is
      fields:   (B, H, W, 84) normalized dynamic fields (SST NaNs already
                replaced by the mask value by the input pipeline)
      nan_mask: (B, H, W) bool, True where SST was NaN
      statics:  (H, W, 5) normalized static conditioning

    One call performs ONE optimizer step; the periodic-roll subbatch
    augmentation is applied inside (the reference takes subbatch_steps
    optimizer steps per batch -- call this with the same batch multiple
    times with aug=True to match its schedule; here step 0 rolls only when
    ``roll`` is provided).
    """
    model = AutoencoderDC(cfg)
    c_dtype = jnp.dtype(tcfg.compute_dtype)
    lat_w = jnp.asarray(grid_lat_weights("cos", grid_lat), jnp.float32)

    def loss_fn(params, fields, nan_mask, statics, roll):
        B, H, W, C = fields.shape
        lw = jnp.broadcast_to(lat_w.reshape(1, H, 1, 1), (B, H, 1, 1))
        stat_b = jnp.broadcast_to(statics[None], (B, *statics.shape))
        if roll is not None:
            # consistent periodic roll of data/mask/weights/statics
            # (dataloader/utils.py:108-141: new top-left (x, y))
            def roll_one(t, r):
                return jnp.roll(t, shift=(-r[1], -r[0]), axis=(0, 1))
            fields = jax.vmap(roll_one)(fields, roll)
            nan_mask = jax.vmap(roll_one)(nan_mask[..., None], roll)[..., 0]
            lw = jax.vmap(roll_one)(jnp.broadcast_to(
                lat_w.reshape(1, H, 1, 1), (B, H, 1, 1)), roll)
            stat_b = jax.vmap(roll_one)(stat_b, roll)

        # Mixed precision (reference: accelerate bf16 autocast): compute
        # sees a bf16 copy of the fp32 master params; the astype VJP
        # casts grads back to fp32. Without this, flax dtype promotion
        # runs every conv/matmul in fp32 on the MXU's slow path.
        cparams = jax.tree.map(
            lambda x: x.astype(c_dtype)
            if x.dtype == jnp.float32 else x, params)
        pred = model.apply(cparams, fields.astype(c_dtype),
                           stat_b.astype(c_dtype),
                           True).astype(jnp.float32)  # return_static=True
        if tcfg.ft_decoder_only:
            # decoder finetune: freeze encoder by stopping gradients at z
            pass  # handled via optimizer masking by the caller

        # SST mask on pred AND target
        sst = tcfg.sst_channel
        m = nan_mask[..., None] & (
            jnp.arange(pred.shape[-1]) == sst)
        pred = jnp.where(m, tcfg.sst_mask_value, pred)
        fields = jnp.where(
            nan_mask[..., None] & (jnp.arange(C) == sst),
            tcfg.sst_mask_value, fields)

        target = jnp.concatenate([fields, stat_b], axis=-1)
        w = lw if tcfg.lat_weighted_loss else None
        loss = lp_loss(pred, target, w)
        per_var = lp_loss_per_var(pred, target, w)
        return loss, {"loss": loss, "loss_per_var": per_var,
                      "_pred": pred, "_target": target, "_lw": lw}

    def train_step(state: TrainState, batch, key):
        fields, nan_mask, statics = batch
        B, H, W, _ = fields.shape
        kx, ky = jax.random.split(key)
        roll = jnp.stack([jax.random.randint(kx, (B,), 0, W),
                          jax.random.randint(ky, (B,), 0, H)], axis=1)
        # Reference: subbatch step 0 trains unrolled; augmented steps roll.
        use_roll = (state.step % tcfg.subbatch_steps) != 0
        roll = jnp.where(use_roll, roll, jnp.zeros_like(roll))

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, fields, nan_mask, statics, roll)
        for k in ("_pred", "_target", "_lw"):  # eval-only tensors (DCE'd)
            aux.pop(k)
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

    def eval_step(params, batch):
        """Validation metrics for one batch (train_encdec.py:899-1022):
        the training loss plus per-channel MSE and lat-weighted MSE in
        NORMALIZED units over the 89 output channels (dynamic + static).
        Unnormalized RMSE per channel = sqrt(mse) * channel_std (the mean
        cancels in the difference), computed by the caller."""
        fields, nan_mask, statics = batch
        loss, aux = loss_fn(params, fields, nan_mask, statics, None)
        pred = aux.pop("_pred")
        target = aux.pop("_target")
        lw = aux.pop("_lw")
        se = (pred - target) ** 2                      # (B, H, W, C_out)
        aux["channel_mse"] = se.mean(axis=(0, 1, 2))
        aux["channel_lw_mse"] = (se * lw).mean(axis=(0, 1, 2))
        return aux

    def init_fn(key, example_batch):
        fields, nan_mask, statics = example_batch
        params = model.init(key, fields, statics, True)
        opt_state = optimizer.init(params)
        ema_state = ema_lib.ema_init(params) if tcfg.use_ema else None
        return TrainState(params, opt_state, ema_state,
                          jnp.zeros((), jnp.int32))

    # Deterministic hook for the executable-reference oracle test
    # (tests/test_oracle_train_loss.py): same objective, injected roll.
    train_step.loss_given_roll = loss_fn
    return init_fn, train_step, eval_step
