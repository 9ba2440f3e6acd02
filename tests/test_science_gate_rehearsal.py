"""Science-gate rehearsal harness (scripts/science_gate_rehearsal.py):
the make_data -> production train CLI -> variant-A/B eval chain runs
end-to-end and the synthetic dynamics have the promised properties."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "science_gate_rehearsal.py")

TINY_AR_CFG = {
    "ar_model": {
        "num_attention_heads": 2,
        "attention_head_dim": 128,  # sum(rope_axes_dim) default
        "num_layers": 1,
        "num_single_layers": 1,
        "num_refiner_layers": 1,
    },
    "general": {"checkpointing_steps": 4},
    "train_dataloader": {"batch_size": 2, "input_seq_len": 1,
                         "return_seq_len": 4},
    "lr_scheduler": {"num_warmup_steps": 0},
}


def _run(args, timeout=900):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable] + args, env=env, timeout=timeout,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    return r.stdout


def test_synth_dynamics_properties():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from science_gate_rehearsal import synth_trajectory

    zn = synth_trajectory(50, seed=0)
    assert zn.shape == (50, 15, 30, 84)
    # norm-preserving dynamics: global std stays put over the trajectory
    np.testing.assert_allclose(zn[0].std(), zn[-1].std(), rtol=1e-3)
    # deterministic: same seed reproduces
    np.testing.assert_array_equal(zn, synth_trajectory(50, seed=0))
    # actually dynamic (not a fixed point)
    assert np.abs(zn[1] - zn[0]).mean() > 0.1


@pytest.mark.slow
def test_rehearsal_chain_tiny(tmp_path):
    """make_data -> cli.train_ar (hub export) -> --eval exact,int8 at a
    1-repetition lead; deltas must be finite and int8's small."""
    tr = os.fspath(tmp_path / "train.npz")
    ev = os.fspath(tmp_path / "eval.npz")
    _run([SCRIPT, "--make_data", "--frames", "70", "--train_frames", "50",
          "--train_out", tr, "--eval_out", ev])

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY_AR_CFG))
    out = os.fspath(tmp_path / "run")
    _run(["-m", "ladcast_tpu.cli.train_ar", "--config", os.fspath(cfg_path),
          "--latents", tr, "--output_dir", out, "--num_steps", "4",
          "--hub_export"])

    stdout = _run([SCRIPT, "--eval", "--ckpt", os.path.join(out, "hub"),
                   "--eval_data", ev, "--ensemble_size", "2",
                   "--init_idxs", "0", "--total_lead_time_hour", "24",
                   "--variants", "exact,int8"])
    summary = json.loads(stdout.strip().splitlines()[-1])
    assert np.isfinite(summary["exact"]["rmse_mean"])
    assert np.isfinite(summary["int8"]["rmse_mean"])
    assert len(summary["exact"]["rmse_lead"]) == 4
    # int8 perturbs an untrained-scale forecast by far less than its
    # own error level (plumbing check, not a science claim)
    assert abs(summary["int8"]["rmse_rel_delta_vs_exact"]) < 0.05
    assert summary["exact_ens_spread_mean"] > 0
