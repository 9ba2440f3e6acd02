"""train_dcae CLI: validation pass + best-val checkpoint rotation
(reference train_encdec.py:862-1121)."""

import json
import os

import numpy as np
import yaml

TINY_CFG = {
    "encdec": {
        "in_channels": 89, "out_channels": 89, "latent_channels": 8,
        "attention_head_dim": 4,
        "encoder_block_types": ["ResBlock", "ResBlock"],
        "decoder_block_types": ["ResBlock", "ResBlock"],
        "encoder_block_out_channels": [8, 16],
        "decoder_block_out_channels": [8, 16],
        "encoder_layers_per_block": [1, 1],
        "decoder_layers_per_block": [1, 1],
        "encoder_qkv_multiscales": [[], []],
        "decoder_qkv_multiscales": [[], []],
        "static_channels": 5,
    },
    "optimizer": {"lr": 1e-3},
    "lr_scheduler": {"num_warmup_steps": 0},
    "train": {"batch_size": 1, "subbatch_steps": 2,
              "lat_weighted_loss": True},
    "general": {"checkpointing_steps": 1000, "val_every_steps": 2},
    "ema": {"use_ema": True, "ema_update_after_step": 0},
}


def _write_npz(path, n=10, seed=0):
    rng = np.random.RandomState(seed)
    fields = rng.randn(n, 120, 240, 84).astype(np.float32)
    # NaN blob in the SST channel (masked by the pipeline)
    fields[:, 10:20, 30:50, 82] = np.nan
    ts = np.asarray([2018010100 + i * 6 for i in range(n)], np.int64)
    np.savez(path, fields=fields, timestamps=ts)


def test_train_dcae_validation_and_best_ckpt(tmp_path):
    from ladcast_tpu.cli.train_dcae import main

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY_CFG))
    train_npz = tmp_path / "train.npz"
    val_npz = tmp_path / "val.npz"
    _write_npz(train_npz, n=16, seed=0)
    _write_npz(val_npz, n=8, seed=1)
    out = tmp_path / "run"

    main(["--config", os.fspath(cfg_path), "--data", os.fspath(train_npz),
          "--val_data", os.fspath(val_npz), "--val_every", "2",
          "--output_dir", os.fspath(out), "--num_steps", "4"])

    # validation metrics logged with per-channel unnormalized RMSE
    lines = [json.loads(ln) for ln in
             (out / "metrics.jsonl").read_text().splitlines()]
    val_logs = [d for d in lines if "val_loss" in d]
    assert len(val_logs) >= 2          # steps 2 and 4
    keys = val_logs[-1]
    assert "val_rmse_sea_surface_temperature" in keys
    assert "val_lw_rmse_land_sea_mask" in keys
    assert np.isfinite(keys["val_loss"])

    # best-val params rotation: step-* dirs, at most 3 kept
    best = out / "best"
    dirs = sorted(d for d in os.listdir(best) if d.startswith("step-"))
    assert 1 <= len(dirs) <= 3
    # saved params are loadable
    from ladcast_tpu.train.checkpoint import load_params
    params = load_params(os.fspath(best / dirs[-1]))
    assert "params" in params


def test_train_dcae_ft_decoder_init_weights(tmp_path):
    """The reference decoder-finetune flow (--ft_decoder +
    --load_weights_only): --init_weights loads a pretrained autoencoder,
    ft_decoder_only freezes the encoder -- after 2 real steps the encoder
    leaves still equal the pretrained values and decoder leaves moved."""
    import jax
    import jax.numpy as jnp

    from ladcast_tpu.cli.train_dcae import main
    from ladcast_tpu.config import DCAEConfig, config_from_dict
    from ladcast_tpu.models import hub
    from ladcast_tpu.models.dcae import AutoencoderDC

    dcae_cfg = config_from_dict(DCAEConfig, TINY_CFG["encdec"])
    dcae = AutoencoderDC(dcae_cfg)
    pretrained = dcae.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 120, 240, 84)),
                           jnp.zeros((120, 240, 5)))
    wdir = os.fspath(tmp_path / "weights")
    hub.save_pretrained(wdir, "dcae", dcae_cfg, pretrained)

    data = os.fspath(tmp_path / "era5.npz")
    _write_npz(data)
    cfg = {**TINY_CFG, "train": {**TINY_CFG["train"],
                                 "ft_decoder_only": True},
           "general": {"checkpointing_steps": 1000, "val_every_steps": 2}}
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = os.fspath(tmp_path / "ft")
    state = main(["--config", os.fspath(cfg_path), "--data", data,
                  "--output_dir", out, "--num_steps", "2",
                  "--init_weights", wdir])

    trained = jax.device_get(state.params)
    enc_a = trained["params"]["encoder"]
    enc_b = pretrained["params"]["encoder"]
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(enc_a)[0],
            jax.tree_util.tree_flatten_with_path(enc_b)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
    dk_a = trained["params"]["decoder"]
    dk_b = pretrained["params"]["decoder"]
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(dk_a),
                        jax.tree_util.tree_leaves(dk_b)))
    assert moved, "decoder did not train"
