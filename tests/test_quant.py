"""Opt-in int8 (w8a8) matmul path (ops/quant.py).

No reference equivalent (the reference runs fp32/bf16); these tests pin
the TPU-specific acceleration's contracts:
  * the quantized primitive is exact on values representable on the int8
    scale grid and ~0.5%-accurate on Gaussian data;
  * ``QuantizableDense(quant=False)`` is bit-identical to ``nn.Dense``
    with the same params (so default-path parity oracles are untouched);
  * the param tree of the int8 DiT is byte-identical in structure to the
    default DiT (checkpoint import/export is quantization-agnostic);
  * the int8 full-model forward tracks the fp forward within a few
    percent of the output std on random weights.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladcast_tpu.config import LaDCastDiTConfig
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from ladcast_tpu.ops.quant import QuantizableDense, int8_matmul, quantize_rows


def _tiny_cfg(**kw):
    return LaDCastDiTConfig(
        in_channels=6, out_channels=6, num_attention_heads=2,
        attention_head_dim=16, num_layers=1, num_single_layers=1,
        num_refiner_layers=1, rope_axes_dim=(4, 6, 6),
        conditioning_tensor_rope_axes_dim=(4, 6, 6),
        conditioning_tensor_in_channels=6, attention_impl="xla", **kw)


def test_quantize_rows_roundtrip_grid():
    # Values that sit exactly on the int8 grid (scale = 1.0 per row when
    # amax == 127) must round-trip exactly.
    x = jnp.asarray(np.random.default_rng(0).integers(-127, 128, (5, 64)),
                    jnp.float32)
    x = x.at[:, 0].set(127.0)  # pin amax so scale == 1
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(s), x)


def test_quantize_rows_zero_row():
    q, s = quantize_rows(jnp.zeros((3, 8)))
    assert np.all(np.asarray(q) == 0)
    np.testing.assert_allclose(np.asarray(s), 1.0)


def test_int8_matmul_accuracy_gaussian():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 300, 256)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(256, 512)) / 16.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(512,)), jnp.float32)
    ref = x @ k + b
    out = int8_matmul(x, k, b)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_quantizable_dense_off_matches_nn_dense():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 17, 24)),
                    jnp.float32)
    ref_mod = nn.Dense(40)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    q_mod = QuantizableDense(40, quant=False)
    # Same param structure -> reuse the nn.Dense params directly.
    out_ref = ref_mod.apply(params, x)
    out_q = q_mod.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_q))
    # And in bf16 promotion mode too.
    xb = x.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(ref_mod.apply(params, xb), np.float32),
        np.asarray(q_mod.apply(params, xb), np.float32))


@pytest.fixture(scope="module")
def tiny_io():
    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.normal(size=(2, 2, 4, 8, 6)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(2, 1, 4, 8, 6)), jnp.float32)
    cn = jnp.asarray([0.3, -0.1], jnp.float32)
    yp = jnp.asarray([0.25, 0.75], jnp.float32)
    return lat, cond, cn, yp


def test_int8_param_tree_identical(tiny_io):
    lat, cond, cn, yp = tiny_io
    m_fp = LaDCastTransformer3D(_tiny_cfg())
    m_q = LaDCastTransformer3D(_tiny_cfg(int8_matmuls=True))
    p_fp = m_fp.init(jax.random.PRNGKey(0), lat, cn, cond, yp)
    p_q = m_q.init(jax.random.PRNGKey(0), lat, cn, cond, yp)
    fp_flat = jax.tree_util.tree_map_with_path(
        lambda path, v: (jax.tree_util.keystr(path), v.shape, str(v.dtype)),
        p_fp)
    q_flat = jax.tree_util.tree_map_with_path(
        lambda path, v: (jax.tree_util.keystr(path), v.shape, str(v.dtype)),
        p_q)
    assert jax.tree_util.tree_structure(p_fp) == jax.tree_util.tree_structure(p_q)
    assert jax.tree_util.tree_leaves(fp_flat) == jax.tree_util.tree_leaves(q_flat)


def test_int8_forward_tracks_fp(tiny_io):
    lat, cond, cn, yp = tiny_io
    m_fp = LaDCastTransformer3D(_tiny_cfg())
    m_q = LaDCastTransformer3D(_tiny_cfg(int8_matmuls=True))
    params = m_fp.init(jax.random.PRNGKey(0), lat, cn, cond, yp)
    out_fp = m_fp.apply(params, lat, cn, cond, yp)
    out_q = jax.jit(m_q.apply)(params, lat, cn, cond, yp)
    assert out_q.shape == out_fp.shape
    assert np.all(np.isfinite(np.asarray(out_q)))
    dev = float(jnp.linalg.norm(out_q - out_fp) / jnp.linalg.norm(out_fp))
    # Random weights, 2 blocks deep: a few percent of output norm.
    assert dev < 0.05, dev
    # And the default config must remain exactly the unquantized path.
    out_fp2 = LaDCastTransformer3D(_tiny_cfg()).apply(params, lat, cn, cond, yp)
    np.testing.assert_array_equal(np.asarray(out_fp), np.asarray(out_fp2))


def test_int8_rollout_sharded_over_mesh():
    """int8 dot_general + per-row amax must partition cleanly under GSPMD
    when members shard over the ens mesh axis (same contract as the fp
    test in test_rollout.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ladcast_tpu.config import EDMSchedulerConfig, RolloutConfig
    from ladcast_tpu.parallel.mesh import make_mesh
    from ladcast_tpu.rollout.engine import ensemble_rollout

    H, W, C = 4, 8, 6
    sched = EDMSchedulerConfig()
    rcfg = RolloutConfig(ensemble_size=8, num_inference_steps=2,
                         return_seq_len=2, input_seq_len=1,
                         total_lead_time_hour=12, step_size_hour=6)
    model = LaDCastTransformer3D(_tiny_cfg(int8_matmuls=True))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, H, W, C)), jnp.zeros((1,)),
                        jnp.zeros((1, 1, H, W, C)), jnp.zeros((1,)))

    def net_fn(latents, c_noise, cond, yp):
        return model.apply(params, latents, c_noise, cond, yp)

    known = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, 1, H, W, C)),
        (8, 1, H, W, C))
    yp = jnp.asarray([0.4])
    mesh = make_mesh("ens")
    ens_sh = NamedSharding(mesh, P("ens"))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(lambda k, y, kk: ensemble_rollout(net_fn, k, y, kk,
                                                   sched, rcfg),
                 in_shardings=(ens_sh, repl, repl),
                 out_shardings=ens_sh)
    traj = fn(jax.device_put(known, ens_sh), yp,
              jax.device_put(jax.random.PRNGKey(7), repl))
    assert traj.sharding.spec == P("ens")
    assert np.isfinite(np.asarray(traj)).all()
    ref = ensemble_rollout(net_fn, jax.device_put(known, repl), yp,
                           jax.random.PRNGKey(7), sched, rcfg)
    # Not elementwise-equal: GSPMD changes fp32 fusion/rounding before the
    # int8 round(), so values at tie boundaries flip by one quantum. The
    # contract is agreement in norm.
    dev = float(np.linalg.norm(np.asarray(traj) - np.asarray(ref))
                / np.linalg.norm(np.asarray(ref)))
    assert dev < 5e-3, dev


@pytest.mark.slow
def test_pred_rollout_int8_flag(tmp_path):
    """--int8_matmuls drives the production CLI path end-to-end and
    produces a finite artifact of the reference npy layout."""
    import os

    from ladcast_tpu import static_data
    from ladcast_tpu.cli import pred_rollout
    from ladcast_tpu.models import hub
    from ladcast_tpu.models.dcae import AutoencoderDC
    from tests.test_cli_chain import TINY_DCAE_84, TINY_DIT_84

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
    fields = (rng.randn(2, 120, 240, 84) * fs + fm).astype(np.float32)
    era5 = str(tmp_path / "era5.npz")
    np.savez(era5, fields=fields,
             timestamps=np.asarray([2018010100, 2018010106], np.int64))

    out = str(tmp_path / "out")
    pred_rollout.main([
        "--data", era5, "--dit_params", dit_dir, "--dcae_params", dcae_dir,
        "--output_dir", out, "--year", "2018",
        "--num_samples_per_month", "1", "--ensemble_size", "2",
        "--num_inference_steps", "2", "--return_seq_len", "2",
        "--total_lead_time_hour", "6", "--int8_matmuls"])
    arr = np.load(os.path.join(out, "latent_2018010100.npy"))
    assert arr.shape == (2, 84, 2, 15, 30)
    assert np.all(np.isfinite(arr))
