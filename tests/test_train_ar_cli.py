"""train_ar CLI: checkpoint + --resume latest continuation (the
reference's `--resume_from_checkpoint latest`, train_AR.py:796-837)."""

import json
import os

import numpy as np
import yaml

TINY_AR_CFG = {
    "ar_model": {
        "num_attention_heads": 2,
        "attention_head_dim": 128,
        "num_layers": 1,
        "num_single_layers": 1,
        "num_refiner_layers": 1,
    },
    "general": {"checkpointing_steps": 2},
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
    cfg_path = tmp_path / "tiny_ar.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY_AR_CFG))
    return os.fspath(cfg_path), lat_path


def test_train_ar_checkpoint_resume(tmp_path):
    from ladcast_tpu.cli import train_ar

    cfg, lat = _fixtures(tmp_path)
    out = os.fspath(tmp_path / "run")

    # phase 1: 2 steps -> checkpoint at step 2, then "preemption"
    train_ar.main(["--config", cfg, "--latents", lat, "--output_dir", out,
                   "--num_steps", "2", "--seed", "7"])
    ckpts = os.listdir(os.path.join(out, "ckpts"))
    assert any("2" in c for c in ckpts), ckpts

    # phase 2: resume latest, continue to step 4
    train_ar.main(["--config", cfg, "--latents", lat, "--output_dir", out,
                   "--num_steps", "4", "--resume", "latest", "--seed", "7"])
    recs = [json.loads(l) for l in
            open(os.path.join(out, "metrics.jsonl"))]
    steps = [r["step"] for r in recs]
    # first launch logs step 1; the resumed launch logs step 3 (start+1),
    # proving continuation from the restored step rather than step 0
    assert 1 in steps and 3 in steps, steps
    assert all(np.isfinite(r["loss"]) for r in recs)
    ckpts = os.listdir(os.path.join(out, "ckpts"))
    assert any(c.endswith("4") or c == "4" for c in ckpts), ckpts
