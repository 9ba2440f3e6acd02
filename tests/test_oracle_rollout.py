"""Golden-rollout oracle: the ACTUAL reference ensemble sampler feedback
loop vs the repo rollout engine, full multi-repetition trajectories.

The reference side executes the real code: ``ensemble_AR_sampler``
(pipelines/utils.py:664-742, per-member CPU generators seeded by member
index) driving ``edm_AR_sampler``/``AutoRegressive2DPipeline`` through
the shimmed ``EDMDPMSolverMultistepScheduler``. The thin glue around it
-- per-repetition timestamp advance, last-``input_seq_len`` frame
feedback, initial-latent noise perturbation -- is transcribed line-for-
line from ``roll_out_serial`` (pipelines/utils.py:514-563) because that
function itself cannot execute in this image (it requires xarray + the
DCAE for its xr.Dataset input; xarray is not installed). Every
transcribed line carries its reference citation.

Randomness is reproduced exactly: the reference's member-i noise is
``torch.randn((1,C,T,H,W), generator=Generator(seed=i))`` drawn FRESH at
every repetition from the SAME seed (ensemble_AR_sampler re-creates the
generators per call with count starting at 0 -- so each AR step reuses
identical initial sampler noise per member; member diversity across
repetitions comes from the evolving conditioning). We capture those
draws and inject them into the engine via ``rep_noise``.

Pinned here, against executable reference code:
  * the t=0 frame convention (engine output excludes it; reference
    samples likewise only cover lead times > 0)
  * last-``input_seq_len`` frame feedback in NORMALIZED latent space
    (utils.py:563 -- before the inverse transform)
  * the member-seed contract and member-batch chunking invariance
  * noise_level>0: ONE perturbation draw scaled by
    noise_level * physical latent std, shared by all members
    (utils.py:514-528)
  * timestamp advance by step*step_size*return_seq_len hours
    (utils.py:538-544) feeding the model's year-progress embedding
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ladcast_tpu.config import (  # noqa: E402
    EDMSchedulerConfig,
    LaDCastDiTConfig,
    RolloutConfig,
)
from ladcast_tpu.data import time_utils  # noqa: E402
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D  # noqa: E402
from ladcast_tpu.models.weight_import import convert_dit_state_dict  # noqa: E402
from ladcast_tpu.rollout.engine import ensemble_rollout  # noqa: E402
from tests.oracles.refload import load_reference, state_dict_numpy  # noqa: E402

E, T_OUT, T_IN, H, W, C = 3, 2, 1, 4, 6, 3
N_REPS = 3
N_STEPS = 4
SCHED = EDMSchedulerConfig()
INIT_TS = 2018011500  # YYYYMMDDHH


def _tiny_kwargs():
    return dict(
        in_channels=C, out_channels=C,
        num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1,
        mlp_ratio=2.0, patch_size=1, patch_size_t=1, qk_norm="rms_norm",
        rope_theta=256.0, rope_axes_dim=(2, 4, 2),
        rope_spatial_grid_start_pos=(-499.5, 5.25),
        rope_spatial_grid_end_pos=(508.5, 353.25),
        spatial_deg2rad=True,
        conditioning_tensor_in_channels=C,
        conditioning_tensor_rope_axes_dim=(2, 4, 2),
        incl_time_elapsed=True, nope=False, scale_attn_by_lat=False)


@pytest.fixture(scope="module")
def model_pair():
    kwargs = _tiny_kwargs()
    ref_mod = load_reference("ladcast.models.LaDCast_3D_model")
    torch.manual_seed(0)
    ref = ref_mod.LaDCastTransformer3DModel(**kwargs)
    ref.eval()

    cfg = LaDCastDiTConfig(
        in_channels=C, out_channels=C,
        num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1,
        mlp_ratio=2.0, qk_norm="rms_norm", rope_theta=256.0,
        rope_axes_dim=(2, 4, 2),
        rope_spatial_grid_start_pos=(-499.5, 5.25),
        rope_spatial_grid_end_pos=(508.5, 353.25),
        spatial_deg2rad=True,
        conditioning_tensor_in_channels=C,
        conditioning_tensor_rope_axes_dim=(2, 4, 2),
        incl_time_elapsed=True, nope=False, scale_attn_by_lat=False,
        attention_impl="xla")
    model = LaDCastTransformer3D(cfg)

    x_j = jnp.zeros((E, T_OUT, H, W, C), jnp.float32)
    cond_j = jnp.zeros((E, T_IN, H, W, C), jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x_j,
                           jnp.zeros((E,), jnp.float32), cond_j,
                           jnp.zeros((E,), jnp.float32)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = convert_dit_state_dict(state_dict_numpy(ref), template)
    params = jax.tree.map(jnp.asarray, params)
    return ref, model, params


def _ref_scheduler():
    from tests.oracles import diffusers_shim
    diffusers_shim.install()
    import diffusers
    return diffusers.EDMDPMSolverMultistepScheduler(sigma_data=0.5,
                                                    num_train_timesteps=1000)


def _member_draws():
    """The exact per-member initial noise randn_tensor produces inside
    the sampler (list-of-generators branch: one (1,C,T,H,W) draw per
    member from Generator(seed=i), ensemble_AR_sampler utils.py:703-705).
    Identical at every repetition (seeds restart from 0 per call)."""
    draws = []
    for i in range(E):
        g = torch.Generator("cpu").manual_seed(i)
        draws.append(torch.randn((1, C, T_OUT, H, W), generator=g))
    return torch.cat(draws, 0)  # (E, C, T, H, W)


def _reference_rollout(ref_model, known_norm_cthw: torch.Tensor,
                       sampler_type: str, noise_level: float = 0.0,
                       pert: torch.Tensor = None,
                       latent_std: np.ndarray = None,
                       batch_size: int = 64, n_reps: int = N_REPS):
    """ensemble_AR_sampler feedback loop; glue transcribed from
    roll_out_serial with citations, sampler stack = actual reference."""
    putils = load_reference("ladcast.pipelines.utils")
    pipe_mod = load_reference("ladcast.pipelines.pipeline_AR")
    ar_dl = load_reference("ladcast.dataloader.ar_dataloder")
    import pandas as pd

    sch = _ref_scheduler()
    pipeline = pipe_mod.AutoRegressive2DPipeline(ar_model=ref_model,
                                                 scheduler=sch)

    known = known_norm_cthw.clone()  # (C, T_in, H, W), normalized space
    if noise_level > 0:
        # utils.py:518-528: noise = randn_like(known) * noise_level * std
        std_t = torch.tensor(latent_std, dtype=torch.float32)[:, None, None,
                                                              None]
        known = known + pert * noise_level * std_t
    known = known.unsqueeze(0)  # utils.py:530 rearrange "C T H W->1 C T H W"

    current_time = pd.Timestamp(
        time_utils.int_to_datetime(INIT_TS))
    outs = []
    with torch.no_grad():
        for step in range(n_reps):
            # utils.py:538-544: timestamp advance per repetition
            ts = current_time + pd.Timedelta(
                hours=step * 6 * T_OUT)
            ts_int = ar_dl.convert_datetime_to_int(ts)
            samples = putils.ensemble_AR_sampler(
                pipeline,
                sample_size=E,
                return_seq_len=T_OUT,
                num_inference_steps=N_STEPS,
                known_latents=known,
                timestamps=torch.tensor([ts_int]),
                batch_size=batch_size,
                sampler_type=sampler_type,
                device="cpu",
            )
            # utils.py:563: feedback of the last input_seq_len frames in
            # NORMALIZED latent space (before any inverse transform)
            known = samples[:, :, -T_IN:].clone()
            outs.append(samples)
    return torch.cat(outs, dim=2).numpy()  # (E, C, N_REPS*T_OUT, H, W)


def _engine_rollout(model, params, known_norm_cthw: np.ndarray,
                    sampler_type: str, noise_level: float = 0.0,
                    pert: np.ndarray = None, latent_std: np.ndarray = None,
                    dpm_init_scale=None, n_reps: int = N_REPS):
    cfg = RolloutConfig(
        ensemble_size=E, num_inference_steps=N_STEPS,
        return_seq_len=T_OUT, input_seq_len=T_IN,
        total_lead_time_hour=n_reps * T_OUT * 6, step_size_hour=6,
        noise_level=noise_level, sampler_type=sampler_type,
        dpm_init_scale=dpm_init_scale)

    def net_fn(lat, cn, cond, yp):
        return model.apply(params, lat, cn, cond, yp)

    known = jnp.asarray(known_norm_cthw.transpose(1, 2, 3, 0))[None]
    known = jnp.broadcast_to(known, (E, T_IN, H, W, C))
    yp = jnp.asarray(time_utils.rollout_year_progress(
        INIT_TS, cfg.num_repetitions, 6 * T_OUT))
    member = _member_draws().numpy().transpose(0, 2, 3, 4, 1)  # (E,T,H,W,C)
    rep_noise = jnp.asarray(
        np.broadcast_to(member, (n_reps, E, T_OUT, H, W, C)))
    pert_j = (jnp.asarray(pert.transpose(1, 2, 3, 0))
              if pert is not None else None)
    traj = ensemble_rollout(
        net_fn, known, yp, jax.random.PRNGKey(0), SCHED, cfg,
        latent_std=(jnp.asarray(latent_std) if latent_std is not None
                    else None),
        rep_noise=rep_noise, pert_noise=pert_j)
    # (E, steps, H, W, C) -> (E, C, steps, H, W)
    return np.asarray(traj).transpose(0, 4, 1, 2, 3)


def test_golden_rollout_heun(model_pair):
    ref, model, params = model_pair
    rng = np.random.RandomState(0)
    known = rng.randn(C, T_IN, H, W).astype(np.float32) * 0.5
    want = _reference_rollout(ref, torch.from_numpy(known), "edm")
    got = _engine_rollout(model, params, known, "edm")
    assert want.shape == got.shape == (E, C, N_REPS * T_OUT, H, W)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_golden_rollout_heun_noise_level(model_pair):
    """noise_level>0: perturbation semantics of utils.py:514-528 (one
    draw, scaled by physical latent std, shared across members)."""
    ref, model, params = model_pair
    rng = np.random.RandomState(1)
    known = rng.randn(C, T_IN, H, W).astype(np.float32) * 0.5
    latent_std = (rng.rand(C).astype(np.float32) + 0.5)
    pert = rng.randn(C, T_IN, H, W).astype(np.float32)
    want = _reference_rollout(
        ref, torch.from_numpy(known), "edm", noise_level=0.3,
        pert=torch.from_numpy(pert), latent_std=latent_std)
    got = _engine_rollout(model, params, known, "edm", noise_level=0.3,
                          pert=pert, latent_std=latent_std)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_golden_rollout_heun_member_chunking_invariance(model_pair):
    """batch_size=2 forces two member chunks on the reference side
    (utils.py:683-685); member results must be chunking-invariant and
    still match the engine (which has no chunking at all).

    Single repetition only: running this oracle at N_REPS>1 exposed a
    LATENT REFERENCE BUG -- after the first repetition the fed-back
    known_latents has batch E, but ensemble_AR_sampler passes the FULL
    E-row conditioning to each num_sample<E member chunk
    (utils.py:705-712 only handles the shape[0]==1 broadcast case), so
    any rollout with ensemble_size > batch_size (64) crashes on
    repetition 2 with a batch mismatch. Never hit by the published
    protocol (ens 20 < 64); the engine has no chunking and no such
    limit."""
    ref, model, params = model_pair
    rng = np.random.RandomState(2)
    known = rng.randn(C, T_IN, H, W).astype(np.float32) * 0.5
    want = _reference_rollout(ref, torch.from_numpy(known), "edm",
                              batch_size=2, n_reps=1)
    got = _engine_rollout(model, params, known, "edm", n_reps=1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_golden_rollout_dpm_pipeline(model_pair):
    """sampler_type='pipeline' (DPM-Solver++ 2M through the actual
    reference AutoRegressive2DPipeline) vs the engine's 'dpm' path with
    the reference's unit-noise start (dpm_init_scale=1.0)."""
    ref, model, params = model_pair
    rng = np.random.RandomState(3)
    known = rng.randn(C, T_IN, H, W).astype(np.float32) * 0.5
    want = _reference_rollout(ref, torch.from_numpy(known), "pipeline")
    got = _engine_rollout(model, params, known, "dpm", dpm_init_scale=1.0)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
