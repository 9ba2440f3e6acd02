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


def test_train_ar_decoded_validation(tmp_path):
    """--val_dcae_params decodes the validation ensemble and logs
    per-variable PHYSICAL RMSE/CRPS tables keyed by lead time, the
    reference log_validation contract (train_AR.py:54-385)."""
    import jax
    import yaml as _yaml

    from ladcast_tpu.cli import train_ar
    from ladcast_tpu.config import DCAEConfig, config_from_dict
    from ladcast_tpu.models.dcae import AutoencoderDC
    from ladcast_tpu.train import checkpoint as ckpt

    tiny_dcae = {
        "in_channels": 4, "out_channels": 4, "latent_channels": 84,
        "attention_head_dim": 4,
        "encoder_block_types": ["ResBlock", "ResBlock"],
        "decoder_block_types": ["ResBlock", "ResBlock"],
        "encoder_block_out_channels": [8, 16],
        "decoder_block_out_channels": [8, 16],
        "encoder_layers_per_block": [1, 1],
        "decoder_layers_per_block": [1, 1],
        "encoder_qkv_multiscales": [[], []],
        "decoder_qkv_multiscales": [[], []],
        "static_channels": 0,
        # channel-group shortcuts need widths[-1] >= latent_channels;
        # this tiny config (16 < 84) must run without them
        "encoder_out_shortcut": False,
        "decoder_in_shortcut": False,
    }
    cfg_dict = dict(TINY_AR_CFG, encdec=tiny_dcae)
    cfg, lat = _fixtures(tmp_path)
    (tmp_path / "tiny_ar.yaml").write_text(_yaml.safe_dump(cfg_dict))

    dcae_cfg = config_from_dict(DCAEConfig, tiny_dcae)
    dcae = AutoencoderDC(dcae_cfg)
    params = dcae.init(jax.random.PRNGKey(0),
                       np.zeros((1, 30, 60, 4), np.float32))
    dcae_dir = os.fspath(tmp_path / "dcae_params")
    ckpt.save_params(dcae_dir, params)

    out = os.fspath(tmp_path / "run_dec")
    train_ar.main(["--config", cfg, "--latents", lat, "--output_dir", out,
                   "--num_steps", "1", "--seed", "3",
                   "--val_latents", lat, "--val_every", "1",
                   "--val_ensemble_size", "2", "--val_num_init_times", "1",
                   "--val_total_lead_time_hour", "24",
                   "--val_num_inference_steps", "3",
                   "--val_dcae_params", dcae_dir])

    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    val = [r for r in recs if "val_rmse_ens" in r]
    assert val, recs
    tab = val[0]["val_rmse_ens"]
    assert tab["lead_hours"] == [6, 12, 18, 24]
    for name in ("ch0", "ch1", "ch2", "ch3"):
        assert len(tab[name]) == 4 and all(np.isfinite(tab[name])), tab
    crps = val[0]["val_crps"]
    assert all(np.isfinite(crps["ch0"])) and all(
        c >= 0 for c in crps["ch0"])
    single = val[0]["val_rmse_single"]
    # per-member RMSE >= ens-mean RMSE pointwise (Jensen): a structural
    # check that the two tables are not the same quantity
    assert all(s >= e - 1e-6 for s, e in zip(single["ch0"], tab["ch0"]))
    assert "val_latent_rmse" in val[0]


def test_train_ar_hub_export(tmp_path):
    """--hub_export writes diffusers-layout ar_model/ar_model_ema dirs at
    checkpoints (the reference's training hooks, train_AR.py:559-613)
    that load back through the hub ingestion path with zero flags."""
    from ladcast_tpu.cli import train_ar
    from ladcast_tpu.models import hub

    cfg, lat = _fixtures(tmp_path)
    out = os.fspath(tmp_path / "run_hub")
    train_ar.main(["--config", cfg, "--latents", lat, "--output_dir", out,
                   "--num_steps", "2", "--seed", "11", "--hub_export"])

    for sub in ("ar_model", "ar_model_ema"):
        loaded = hub.load_pretrained(os.path.join(out, "hub", sub))
        assert loaded.kind == "dit"
        assert loaded.config.num_attention_heads == 2
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in __import__("jax").tree.leaves(loaded.params))
    raw = json.load(open(os.path.join(out, "hub", "ar_model_ema",
                                      "config.json")))
    assert raw["optimization_step"] == 2
    # the parent dir resolves like a reference training checkpoint:
    # EMA subfolder preferred
    import jax

    ema = hub.load_pretrained(os.path.join(out, "hub"))
    ema_direct = hub.load_pretrained(os.path.join(out, "hub",
                                                  "ar_model_ema"))
    for a, b in zip(jax.tree.leaves(ema.params),
                    jax.tree.leaves(ema_direct.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_ar_skip_state_ckpt(tmp_path):
    """--skip_state_ckpt writes the hub export but no orbax TrainState
    dirs (measurement runs whose only artifact is the final weights;
    avoids the bulk off-device state copy that can wedge a remote
    device link)."""
    from ladcast_tpu.cli import train_ar
    from ladcast_tpu.models import hub

    cfg, lat = _fixtures(tmp_path)
    out = os.fspath(tmp_path / "run_skip")
    train_ar.main(["--config", cfg, "--latents", lat, "--output_dir", out,
                   "--num_steps", "2", "--seed", "11", "--hub_export",
                   "--skip_state_ckpt"])
    assert hub.load_pretrained(os.path.join(out, "hub")).kind == "dit"
    ckpts = os.path.join(out, "ckpts")
    assert not os.path.isdir(ckpts) or os.listdir(ckpts) == []


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


def test_train_ar_init_weights(tmp_path):
    """--init_weights: weights-only warm start (the reference
    --resume_from_checkpoint + --load_weights_only) from a diffusers hub
    dir; params AND the EMA mirror take the loaded values, step is 0."""
    import jax
    import jax.numpy as jnp

    from ladcast_tpu.cli import train_ar
    from ladcast_tpu.config import LaDCastDiTConfig, config_from_dict
    from ladcast_tpu.models import hub
    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D

    import yaml as _yaml

    _, lat = _fixtures(tmp_path)
    # lr=0: after one real step params must equal the loaded weights
    # EXACTLY (adamw update and decoupled weight decay both scale by lr),
    # which pins that the warm start actually took effect
    cfg = {**TINY_AR_CFG, "optimizer": {"lr": 0.0}}
    cfg_path = os.fspath(tmp_path / "warm.yaml")
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(cfg, f)
    model_cfg = config_from_dict(LaDCastDiTConfig, TINY_AR_CFG["ar_model"])
    dit = LaDCastTransformer3D(model_cfg)
    pretrained = dit.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 4, 15, 30, 84)),
        jnp.zeros((1,)), jnp.zeros((1, 1, 15, 30, 84)), jnp.zeros((1,)))
    wdir = os.fspath(tmp_path / "weights")
    hub.save_pretrained(wdir, "dit", model_cfg, pretrained)

    out = os.fspath(tmp_path / "warm")
    state = train_ar.main([
        "--config", cfg_path, "--latents", lat, "--output_dir", out,
        "--num_steps", "1", "--init_weights", wdir])
    assert int(state.step) == 1
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(pretrained)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0, err_msg=str(pa))
