"""Training-objective parity against the ACTUAL reference loss pipeline.

The reference AR training loss lives inline in train_AR.py:866-1032; its
math is all executable pieces -- the (shimmed-diffusers) EDM scheduler's
``add_noise`` / ``precondition_inputs`` / ``precondition_outputs``,
``pipelines/utils.py:38`` ``get_sigmas``, ``evaluate/utils.py``
``get_normalized_lat_weights_based_on_cos``, and the unmodified
``LaDCastTransformer3DModel``. These tests wire those reference pieces
together with train_AR's control flow (the push-forward chunk loop with
its +6h timestamp advance, train_AR.py:927-964, and the EDM
lambda(sigma) / lat-weighted reductions, :1014-1032) and demand the repo
trainer's ``loss_given_noise`` reproduce the loss scalar at fp32 from
identical injected sigma indices and noise.

Not covered: the reference's min-SNR-gamma branch (train_AR.py:1034-1064)
calls ``diffusers.training_utils.compute_snr``, which reads
``scheduler.alphas_cumprod`` -- an attribute the EDM scheduler does not
have, so under EDM-style training that branch crashes upstream and is
dead code; the repo's snr_gamma path is its (documented) EDM-native
re-derivation, kept tested by tests/test_trainers.py.
"""

import datetime

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from ladcast_tpu.config import (  # noqa: E402
    EDMSchedulerConfig,
    LaDCastDiTConfig,
    NoiseSamplerConfig,
)
from ladcast_tpu.data.time_utils import timestamps_to_year_progress  # noqa: E402
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D  # noqa: E402
from ladcast_tpu.models.weight_import import convert_dit_state_dict  # noqa: E402
from ladcast_tpu.train.trainer_ar import (  # noqa: E402
    ARTrainConfig,
    make_ar_train_step,
)
from tests.oracles.refload import load_reference, state_dict_numpy  # noqa: E402

SCHED = EDMSchedulerConfig()


def _tiny_kwargs(c, rope=(2, 4, 2)):
    return dict(
        in_channels=c, out_channels=c,
        num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1,
        mlp_ratio=2.0, patch_size=1, patch_size_t=1, qk_norm="rms_norm",
        rope_theta=256.0, rope_axes_dim=rope,
        rope_spatial_grid_start_pos=(-499.5, 5.25),
        rope_spatial_grid_end_pos=(508.5, 353.25),
        spatial_deg2rad=True,
        conditioning_tensor_in_channels=c,
        conditioning_tensor_rope_axes_dim=rope,
        incl_time_elapsed=True, nope=False, scale_attn_by_lat=False)


def _repo_cfg(kw) -> LaDCastDiTConfig:
    return LaDCastDiTConfig(
        in_channels=kw["in_channels"], out_channels=kw["out_channels"],
        num_attention_heads=kw["num_attention_heads"],
        attention_head_dim=kw["attention_head_dim"],
        num_layers=kw["num_layers"],
        num_single_layers=kw["num_single_layers"],
        num_refiner_layers=kw["num_refiner_layers"],
        mlp_ratio=kw["mlp_ratio"], qk_norm=kw["qk_norm"],
        rope_theta=kw["rope_theta"], rope_axes_dim=kw["rope_axes_dim"],
        rope_spatial_grid_start_pos=kw["rope_spatial_grid_start_pos"],
        rope_spatial_grid_end_pos=kw["rope_spatial_grid_end_pos"],
        spatial_deg2rad=kw["spatial_deg2rad"],
        conditioning_tensor_in_channels=kw["conditioning_tensor_in_channels"],
        conditioning_tensor_rope_axes_dim=kw[
            "conditioning_tensor_rope_axes_dim"],
        incl_time_elapsed=True, nope=False, scale_attn_by_lat=False,
        attention_impl="xla")


def _ref_scheduler():
    from tests.oracles import diffusers_shim
    diffusers_shim.install()
    import diffusers
    return diffusers.EDMDPMSolverMultistepScheduler(sigma_data=0.5,
                                                    num_train_timesteps=1000)


def _advance_6h(ts_int: int) -> int:
    """train_AR.py:934-940 advances the integer timestamp by 6 h through
    convert_int_to_datetime/pd.Timedelta/convert_datetime_to_int; the
    round-trip is plain YYYYMMDDHH arithmetic."""
    emb = load_reference("ladcast.models.embeddings")
    dt = emb.convert_int_to_datetime(int(ts_int)) + datetime.timedelta(hours=6)
    return int(dt.strftime("%Y%m%d%H"))


def _reference_loss(ref_model, indices, noise, clean, initial_profile,
                    ts_ints, n_pf, t_in, lat_weighted):
    """train_AR.py:866-1032 for one batch, EDM style, executed out of the
    reference's own building blocks (scheduler shim + pipelines.utils +
    evaluate.utils + the oracle model)."""
    putils = load_reference("ladcast.pipelines.utils")
    sch = _ref_scheduler()

    clean_images = torch.from_numpy(clean)            # (B, C, T, H, W)
    noise_t = torch.from_numpy(noise)
    initial_profile = torch.from_numpy(initial_profile)
    timestamps = torch.from_numpy(ts_ints.copy())
    bs, _, T_out = clean_images.shape[:3]
    n_slice = T_out // n_pf

    timesteps = sch.timesteps[torch.from_numpy(indices)]
    noisy_images = sch.add_noise(clean_images, noise_t, timesteps)
    sigmas = putils.get_sigmas(sch, timesteps, len(noisy_images.shape),
                               noisy_images.dtype, device="cpu")
    x_in = sch.precondition_inputs(noisy_images, sigmas)

    model_pred = torch.fill(torch.empty_like(clean_images), float("nan"))
    with torch.no_grad():
        for push_forward_step in range(n_pf):
            start_idx = push_forward_step * n_slice
            end_idx = (push_forward_step + 1) * n_slice
            tmp_x_in = x_in[:, :, start_idx:end_idx]
            if push_forward_step >= 1:
                for i in range(bs):
                    timestamps[i] = _advance_6h(timestamps[i].item())
                initial_profile = sch.precondition_outputs(
                    noisy_images[:, :, start_idx - t_in:start_idx],
                    model_pred[:, :, start_idx - t_in:start_idx].detach(),
                    sigmas)
            model_pred[:, :, start_idx:end_idx] = ref_model(
                tmp_x_in, timesteps, initial_profile,
                time_elapsed=timestamps, return_dict=False)[0]

    model_pred = sch.precondition_outputs(noisy_images, model_pred, sigmas)
    weighting = (sigmas ** 2 + 0.5 ** 2) / (sigmas * 0.5) ** 2
    target = clean_images
    if lat_weighted:
        eutils = load_reference("ladcast.evaluate.utils")
        lw = eutils.get_normalized_lat_weights_based_on_cos(
            np.linspace(-83.25, 84.75, 15))
        lw = torch.from_numpy(lw).view(1, 1, 1, -1, 1)
        loss = torch.mean(lw.float() * weighting.float()
                          * (model_pred.float() - target.float()) ** 2)
    else:
        loss = torch.mean(weighting.float()
                          * (model_pred.float() - target.float()) ** 2)
    return float(loss)


def _repo_loss(kw, ref_model, indices, noise, clean, initial_profile,
               ts_ints, n_pf, t_in, lat_weighted):
    model = LaDCastTransformer3D(_repo_cfg(kw))
    tcfg = ARTrainConfig(num_push_forward_steps=n_pf, input_seq_len=t_in,
                         lat_weighted_loss=lat_weighted, use_ema=False,
                         compute_dtype="float32")
    _, train_step = make_ar_train_step(
        _repo_cfg(kw), SCHED, NoiseSamplerConfig(), tcfg,
        optax.sgd(0.0))

    clean_j = jnp.asarray(clean.transpose(0, 2, 3, 4, 1))
    cond_j = jnp.asarray(initial_profile.transpose(0, 2, 3, 4, 1))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), clean_j,
                           jnp.zeros((clean.shape[0],), jnp.float32),
                           cond_j, jnp.zeros((clean.shape[0],), jnp.float32)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = convert_dit_state_dict(state_dict_numpy(ref_model), template)
    params = jax.tree.map(jnp.asarray, params)

    # year progress of t0 + 6h*s per push-forward chunk (the repo
    # precomputes on the host what the reference derives from the
    # mutated integer timestamps)
    ts = ts_ints.copy()
    yp_cols = []
    for s in range(n_pf):
        yp_cols.append(timestamps_to_year_progress(ts).astype(np.float32))
        ts = np.asarray([_advance_6h(t) for t in ts], np.int64)
    year_progress = jnp.asarray(np.stack(yp_cols, axis=1))

    batch = (cond_j, clean_j, year_progress)
    loss, aux = train_step.loss_given_noise(
        params, batch, jnp.asarray(indices),
        jnp.asarray(noise.transpose(0, 2, 3, 4, 1)))
    return float(loss)


def _run_case(b, t_out, t_in, h, w, c, n_pf, lat_weighted, seed,
              rope=(2, 4, 2)):
    kw = _tiny_kwargs(c, rope)
    ref_mod = load_reference("ladcast.models.LaDCast_3D_model")
    torch.manual_seed(seed)
    ref = ref_mod.LaDCastTransformer3DModel(**kw)
    ref.eval()

    rng = np.random.RandomState(seed)
    clean = rng.randn(b, c, t_out, h, w).astype(np.float32)
    cond = rng.randn(b, c, t_in, h, w).astype(np.float32)
    noise = rng.randn(b, c, t_out, h, w).astype(np.float32)
    # spread sigma indices across the schedule incl. both endpoints
    indices = np.linspace(0, 999, b).astype(np.int64)
    ts_ints = np.array([2018010106, 2018063018, 2020123118][:b], np.int64)

    want = _reference_loss(ref, indices, noise, clean, cond, ts_ints,
                           n_pf, t_in, lat_weighted)
    got = _repo_loss(kw, ref, indices, noise, clean, cond, ts_ints,
                     n_pf, t_in, lat_weighted)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=0)


def test_train_loss_parity_edm_weighting():
    _run_case(b=2, t_out=2, t_in=1, h=4, w=6, c=3, n_pf=1,
              lat_weighted=False, seed=0)


def test_train_loss_parity_push_forward():
    """Two push-forward chunks: chunk 1 is conditioned on the detached
    EDM-preconditioned prediction of chunk 0 and a +6h clock
    (train_AR.py:927-964)."""
    _run_case(b=2, t_out=2, t_in=1, h=4, w=6, c=3, n_pf=2,
              lat_weighted=False, seed=1)


def test_train_loss_parity_lat_weighted_15rows():
    """The reference lat weight is hardcoded to the 15-row latent grid
    (train_AR.py:858-865), so this case runs at h=15."""
    _run_case(b=1, t_out=1, t_in=1, h=15, w=30, c=3, n_pf=1,
              lat_weighted=True, seed=2)


# ---------------------------------------------------------------------------
# DCAE reconstruction objective (train_encdec.py:619-731)
# ---------------------------------------------------------------------------

DCAE_B, DCAE_H, DCAE_W = 2, 16, 24
DCAE_DYN, DCAE_STATIC = 6, 2
DCAE_SST = 3


def _dcae_pair(seed):
    from ladcast_tpu.config import DCAEConfig
    from ladcast_tpu.models.dcae import AutoencoderDC

    ref_mod = load_reference("ladcast.models.DCAE")
    torch.manual_seed(seed)
    blocks = dict(
        encoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock"),
        decoder_block_types=("ResBlock", "ResBlock", "EfficientViTBlock"),
        encoder_block_out_channels=(8, 16, 32),
        decoder_block_out_channels=(8, 16, 32),
        encoder_layers_per_block=(1, 1, 1),
        decoder_layers_per_block=(1, 1, 1),
        encoder_qkv_multiscales=((), (), (5,)),
        decoder_qkv_multiscales=((), (), (5,)),
    )
    common = dict(in_channels=DCAE_DYN + DCAE_STATIC, latent_channels=4,
                  attention_head_dim=4, static_channels=DCAE_STATIC)
    ref = ref_mod.AutoencoderDC(
        out_channels=None, decoder_norm_types="rms_norm",
        decoder_act_fns="silu", **blocks, **common)
    ref.eval()
    cfg = DCAEConfig(out_channels=DCAE_DYN + DCAE_STATIC,
                     decoder_norm_types=("rms_norm",) * 3,
                     decoder_act_fns=("silu",) * 3, **blocks, **common)
    return ref, AutoencoderDC(cfg), cfg


def _reference_dcae_loss(ref, fields, nan_mask, statics, coords,
                         lat_weighted):
    dutils = load_reference("ladcast.dataloader.utils")
    mloss = load_reference("ladcast.metric.loss")
    mutils = load_reference("ladcast.metric.utils")
    eutils = load_reference("ladcast.evaluate.utils")

    batch = torch.from_numpy(fields.copy())            # (B, C, H, W)
    nm = torch.from_numpy(nan_mask.copy())             # (B, H, W) bool
    B = batch.shape[0]
    out_ch = DCAE_DYN + DCAE_STATIC
    lw = eutils.get_normalized_lat_weights_based_on_cos(
        np.linspace(-88.5, 90.0, DCAE_H))
    lat_weight = torch.from_numpy(lw).unsqueeze(1)     # (lat, 1)
    lat_weight_expanded = lat_weight.expand(B, out_ch, -1, -1).clone()
    static_expanded = torch.from_numpy(statics.copy()).unsqueeze(0) \
        .expand(B, -1, -1, -1).clone()

    if coords is not None:
        ct = torch.from_numpy(coords)
        batch = dutils.periodic_rearrange_batch(batch, coords=ct)
        nm = dutils.periodic_rearrange_batch(
            nm.unsqueeze(1), coords=ct).squeeze(1)
        lat_weight_expanded = dutils.periodic_rearrange_batch(
            lat_weight_expanded, coords=ct)
        static_expanded = dutils.periodic_rearrange_batch(
            static_expanded, coords=ct)

    input_tensor = batch.clone()
    with torch.no_grad():
        pred = ref(input_tensor, return_dict=False, return_static=True,
                   static_conditioning_tensor=static_expanded)[0]
    pred, input_tensor = mutils.process_tensor_for_loss(
        pred, input_tensor, nm, sst_chanel_idx=DCAE_SST)
    input_tensor = torch.cat((input_tensor, static_expanded), dim=1)
    loss_fn = mloss.LpLoss(d=2, p=2, reduce_dims=[0, 1], reductions="mean")
    if lat_weighted:
        return float(loss_fn(pred.float(), input_tensor.float(),
                             weight=lat_weight_expanded.float()))
    return float(loss_fn(pred.float(), input_tensor.float()))


def _repo_dcae_loss(ref, model, cfg, fields, nan_mask, statics, coords,
                    lat_weighted):
    from ladcast_tpu.models.weight_import import convert_dcae_state_dict
    from ladcast_tpu.train.trainer_dcae import (
        DCAETrainConfig,
        make_dcae_train_step,
    )

    tcfg = DCAETrainConfig(lat_weighted_loss=lat_weighted, use_ema=False,
                           sst_channel=DCAE_SST, compute_dtype="float32")
    _, train_step, _ = make_dcae_train_step(cfg, tcfg, optax.sgd(0.0),
                                            grid_lat=DCAE_H)

    f_j = jnp.asarray(fields.transpose(0, 2, 3, 1))
    st_j = jnp.asarray(statics.transpose(1, 2, 0))
    template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                                 f_j, st_j, True))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = jax.tree.map(jnp.asarray, convert_dcae_state_dict(
        state_dict_numpy(ref), template))
    roll = None if coords is None else jnp.asarray(coords)
    loss, _ = train_step.loss_given_roll(
        params, f_j, jnp.asarray(nan_mask), st_j, roll)
    return float(loss)


@pytest.mark.parametrize("lat_weighted,rolled,seed", [
    (True, False, 0),
    (False, False, 1),
    (True, True, 2),   # the periodic-roll augmentation step
])
def test_dcae_train_loss_parity(lat_weighted, rolled, seed):
    ref, model, cfg = _dcae_pair(seed)
    rng = np.random.RandomState(seed)
    # preprocessed batch: SST NaNs already replaced by the mask value
    fields = rng.randn(DCAE_B, DCAE_DYN, DCAE_H, DCAE_W).astype(np.float32)
    nan_mask = rng.rand(DCAE_B, DCAE_H, DCAE_W) < 0.1
    fields[:, DCAE_SST][nan_mask] = -2.0
    statics = rng.randn(DCAE_STATIC, DCAE_H, DCAE_W).astype(np.float32)
    coords = None
    if rolled:
        coords = np.stack([rng.randint(0, DCAE_W, DCAE_B),
                           rng.randint(0, DCAE_H, DCAE_B)],
                          axis=1).astype(np.int64)

    want = _reference_dcae_loss(ref, fields, nan_mask, statics, coords,
                                lat_weighted)
    got = _repo_dcae_loss(ref, model, cfg, fields, nan_mask, statics,
                          coords, lat_weighted)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=0)
