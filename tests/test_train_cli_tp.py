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
