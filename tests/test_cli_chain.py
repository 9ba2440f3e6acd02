"""End-to-end CLI chain on CPU: hub-layout tiny models through
``cli.pred_rollout`` -> ``cli.evaluate_ens``.

Pins the forecast-artifact contracts the reference ecosystem relies on:
  * latent_*.npy layout (ens, C, T+1, h, w), channels-first, PHYSICAL
    latent scale with t=0 == the raw encoder output (roll_out_serial,
    pipelines/utils.py:495-504, 565-573);
  * scorer metrics in PHYSICAL units (decoded fields unnormalized with
    the field stats before RMSE/CRPS/ACC, evaluate_ens_gpu.py:300-304).

Uses real 84-channel static assets / normalization stats with tiny
model widths, so the whole production argument path runs unmodified.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ladcast_tpu import static_data  # noqa: E402
from ladcast_tpu.config import DCAEConfig, LaDCastDiTConfig  # noqa: E402
from ladcast_tpu.data import transforms  # noqa: E402
from ladcast_tpu.models import hub  # noqa: E402
from ladcast_tpu.models.dcae import AutoencoderDC  # noqa: E402
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D  # noqa: E402

TINY_DIT_84 = LaDCastDiTConfig(
    in_channels=84, out_channels=84, num_attention_heads=2,
    attention_head_dim=16, num_layers=1, num_single_layers=1,
    num_refiner_layers=1, mlp_ratio=2.0, rope_axes_dim=(4, 6, 6),
    conditioning_tensor_rope_axes_dim=(4, 6, 6),
    conditioning_tensor_in_channels=84, attention_impl="xla")

# widths must be multiples of 4 (pixel-unshuffle conv) with shortcut
# group sizes integral down to the 84-channel latent
TINY_DCAE_84 = DCAEConfig(
    in_channels=89, out_channels=89, latent_channels=84,
    attention_head_dim=4,
    encoder_block_types=("ResBlock",) * 2 + ("EfficientViTBlock",) * 2,
    decoder_block_types=("ResBlock",) * 2 + ("EfficientViTBlock",) * 2,
    encoder_block_out_channels=(84, 84, 84, 168),
    decoder_block_out_channels=(84, 84, 84, 168),
    encoder_layers_per_block=(1, 1, 1, 1),
    decoder_layers_per_block=(1, 1, 1, 1),
    encoder_qkv_multiscales=((), (), (5,), (5,)),
    decoder_qkv_multiscales=((), (), (5,), (5,)),
    static_channels=5)


@pytest.mark.slow
def test_pred_rollout_to_evaluate_ens(tmp_path):
    from ladcast_tpu.cli import evaluate_ens, pred_rollout

    dit = LaDCastTransformer3D(TINY_DIT_84)
    dp = dit.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 15, 30, 84)),
                  jnp.zeros((1,)), jnp.zeros((1, 1, 15, 30, 84)),
                  jnp.zeros((1,)))
    dcae = AutoencoderDC(TINY_DCAE_84)
    cp = dcae.init(jax.random.PRNGKey(0), jnp.zeros((1, 120, 240, 84)),
                   jnp.zeros((120, 240, 5)))
    dit_dir, dcae_dir = str(tmp_path / "dit"), str(tmp_path / "dcae")
    hub.save_pretrained(dit_dir, "dit", TINY_DIT_84, dp)
    hub.save_pretrained(dcae_dir, "dcae", TINY_DCAE_84, cp)

    fm, fs = static_data.era5_mean_std()
    rng = np.random.RandomState(0)
    ts = np.asarray([2018010100, 2018010106, 2018010112], np.int64)
    fields = (rng.randn(3, 120, 240, 84) * fs + fm).astype(np.float32)
    fields[:, :40, :40, 82] = np.nan  # SST land NaNs
    era5 = str(tmp_path / "era5.npz")
    np.savez(era5, fields=fields, timestamps=ts)

    out = str(tmp_path / "out")
    pred_rollout.main([
        "--data", era5, "--dit_params", dit_dir, "--dcae_params", dcae_dir,
        "--output_dir", out, "--year", "2018",
        "--num_samples_per_month", "1", "--ensemble_size", "2",
        "--num_inference_steps", "2", "--return_seq_len", "2",
        "--total_lead_time_hour", "12"])

    arr = np.load(os.path.join(out, "latent_2018010100.npy"))
    assert arr.shape == (2, 84, 3, 15, 30)  # (E, C, T+1, h, w)

    # t=0 must be the RAW encoder output (physical latent scale) --
    # the reference npy convention
    hm = hub.load_pretrained(dcae_dir)
    from ladcast_tpu.config import EDMSchedulerConfig, RolloutConfig
    from ladcast_tpu.rollout.pipeline import ForecastPipeline

    hd = hub.load_pretrained(dit_dir)
    pipe = ForecastPipeline(
        hd.config, hm.config, EDMSchedulerConfig(),
        RolloutConfig(ensemble_size=2, num_inference_steps=2,
                      return_seq_len=2, input_seq_len=1,
                      total_lead_time_hour=12, step_size_hour=6),
        hd.params, hm.params)
    x = transforms.normalize(fields[0:1], fm, fs)
    x = np.where(np.isnan(x), -2.0, x).astype(np.float32)
    z = np.asarray(pipe.encode_fields(jnp.asarray(x)))
    np.testing.assert_array_equal(np.moveaxis(arr[0, :, 0], 0, -1), z[-1])

    scores_dir = str(tmp_path / "scores")
    evaluate_ens.main([
        "--latent_dir", out, "--truth", era5, "--dcae_params", dcae_dir,
        "--output_dir", scores_dir, "--allow_truth_mean_climatology",
        "--diagnostics"])

    with open(os.path.join(scores_dir, "summary.json")) as f:
        summary = json.load(f)
    mse = np.load(os.path.join(scores_dir, "ens_mean_mse.npy"))
    assert mse.shape[1:] == (84, 2)  # (N, C, T)
    # physical units: a z500 RMSE of a garbage forecast is O(1000) m^2/s^2;
    # the round-3 units bug (normalized-field scoring) produced O(1)
    z500 = summary["geopotential@500"]["final"]["rmse"]
    assert z500 > 100.0, f"z500 rmse {z500} looks normalized, not physical"

    # --diagnostics artifacts (beyond reference): spread/ssr in the
    # summary, rank-histogram bins sum to 1, spectra have W/2+1 bins
    assert summary["geopotential@500"]["final"]["ssr"] > 0
    rh = np.load(os.path.join(scores_dir, "rank_hist.npy"))
    assert rh.shape[-1] == 2 + 1  # ens 2 -> 3 bins
    np.testing.assert_allclose(rh.sum(-1), 1.0, rtol=1e-4)
    spec = np.load(os.path.join(scores_dir, "spectrum_fc.npy"))
    assert spec.shape[-1] == 240 // 2 + 1
    assert np.isfinite(spec).all()


@pytest.mark.slow
def test_pred_rollout_shard_ensemble_flag(tmp_path):
    """--shard_ensemble drives the ens-mesh ForecastPipeline through the
    production CLI: 2 members over the 8-device virtual mesh (uneven ->
    exercises the member-axis padding) must reproduce the unsharded
    artifacts up to bf16/reassociation drift."""
    from ladcast_tpu.cli import pred_rollout

    dit = LaDCastTransformer3D(TINY_DIT_84)
    dp = dit.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 15, 30, 84)),
                  jnp.zeros((1,)), jnp.zeros((1, 1, 15, 30, 84)),
                  jnp.zeros((1,)))
    dcae = AutoencoderDC(TINY_DCAE_84)
    cp = dcae.init(jax.random.PRNGKey(0), jnp.zeros((1, 120, 240, 84)),
                   jnp.zeros((120, 240, 5)))
    dit_dir, dcae_dir = str(tmp_path / "dit"), str(tmp_path / "dcae")
    hub.save_pretrained(dit_dir, "dit", TINY_DIT_84, dp)
    hub.save_pretrained(dcae_dir, "dcae", TINY_DCAE_84, cp)

    fm, fs = static_data.era5_mean_std()
    rng = np.random.RandomState(0)
    ts = np.asarray([2018010100], np.int64)
    fields = (rng.randn(1, 120, 240, 84) * fs + fm).astype(np.float32)
    era5 = str(tmp_path / "era5.npz")
    np.savez(era5, fields=fields, timestamps=ts)

    common = [
        "--data", era5, "--dit_params", dit_dir, "--dcae_params", dcae_dir,
        "--year", "2018", "--num_samples_per_month", "1",
        "--ensemble_size", "2", "--num_inference_steps", "2",
        "--return_seq_len", "2", "--total_lead_time_hour", "12"]
    out_ref = str(tmp_path / "out_ref")
    pred_rollout.main(common + ["--output_dir", out_ref])
    out_sh = str(tmp_path / "out_sh")
    pred_rollout.main(common + ["--output_dir", out_sh, "--shard_ensemble"])

    a = np.load(os.path.join(out_ref, "latent_2018010100.npy"))
    b = np.load(os.path.join(out_sh, "latent_2018010100.npy"))
    assert b.shape == a.shape == (2, 84, 3, 15, 30)
    assert np.isfinite(b).all()
    # t=0 is the encoder analysis, replicated in both runs: exact
    np.testing.assert_array_equal(a[:, :, 0], b[:, :, 0])
    # forecast frames run the net in bf16; partitioned compilation
    # reassociates, and the RANDOM (untrained, expansive) tiny net
    # amplifies that over the 2-step AR chain to <=9 % of channel std
    # (measured; forcing fp32 compute collapses it to 1e-4 of std, so
    # the plumbing/noise is identical). A wrong-noise bug would show
    # O(1.4 std) decorrelation, far above this bound.
    std_c = a.std(axis=(0, 2, 3, 4)) + 1e-6
    rel = np.abs(a - b).max(axis=(0, 2, 3, 4)) / std_c
    assert rel.max() < 0.25, f"sharded CLI diverged: per-chan rel {rel.max()}"


@pytest.mark.slow
def test_pred_rollout_dpm_int8_host_step_compose(tmp_path):
    """The production fast path composes through the CLI: ``--sampler
    dpm`` (the reference's own pipeline_AR sampler) + ``--int8_matmuls``
    + ``--host_step`` together must produce a valid artifact whose t=0
    analysis frame is bit-identical to the exact run (neither lever may
    touch the encoder) and whose forecast frames stay close to the
    bf16 dpm-only trajectory (int8 deviation bound as measured in
    PERFORMANCE.md, amplified here by the random expansive tiny net)."""
    from ladcast_tpu.cli import pred_rollout

    dit = LaDCastTransformer3D(TINY_DIT_84)
    dp = dit.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 15, 30, 84)),
                  jnp.zeros((1,)), jnp.zeros((1, 1, 15, 30, 84)),
                  jnp.zeros((1,)))
    dcae = AutoencoderDC(TINY_DCAE_84)
    cp = dcae.init(jax.random.PRNGKey(0), jnp.zeros((1, 120, 240, 84)),
                   jnp.zeros((120, 240, 5)))
    dit_dir, dcae_dir = str(tmp_path / "dit"), str(tmp_path / "dcae")
    hub.save_pretrained(dit_dir, "dit", TINY_DIT_84, dp)
    hub.save_pretrained(dcae_dir, "dcae", TINY_DCAE_84, cp)

    fm, fs = static_data.era5_mean_std()
    rng = np.random.RandomState(0)
    ts = np.asarray([2018010100], np.int64)
    fields = (rng.randn(1, 120, 240, 84) * fs + fm).astype(np.float32)
    era5 = str(tmp_path / "era5.npz")
    np.savez(era5, fields=fields, timestamps=ts)

    common = [
        "--data", era5, "--dit_params", dit_dir, "--dcae_params", dcae_dir,
        "--year", "2018", "--num_samples_per_month", "1",
        "--ensemble_size", "2", "--num_inference_steps", "4",
        "--return_seq_len", "2", "--total_lead_time_hour", "12",
        "--sampler", "dpm"]
    out_dpm = str(tmp_path / "out_dpm")
    pred_rollout.main(common + ["--output_dir", out_dpm])
    out_fast = str(tmp_path / "out_fast")
    pred_rollout.main(common + ["--output_dir", out_fast,
                                "--int8_matmuls", "--host_step"])

    a = np.load(os.path.join(out_dpm, "latent_2018010100.npy"))
    b = np.load(os.path.join(out_fast, "latent_2018010100.npy"))
    assert b.shape == a.shape == (2, 84, 3, 15, 30)
    assert np.isfinite(b).all()
    np.testing.assert_array_equal(a[:, :, 0], b[:, :, 0])
    std_c = a.std(axis=(0, 2, 3, 4)) + 1e-6
    rel = np.abs(a - b).max(axis=(0, 2, 3, 4)) / std_c
    assert rel.max() < 0.5, f"int8+host_step diverged: rel {rel.max()}"
