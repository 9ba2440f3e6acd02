"""Hub-layout checkpoint ingestion (round-2 verdict missing #3).

The published tonyzyl/ladcast artifacts are diffusers ``save_pretrained``
directories (config.json via register_to_config + safetensors, reference
DCAE.py:781, LaDCast_3D_model.py:623), and training checkpoints nest the
model under ``ar_model/`` with an EMA mirror under ``ar_model_ema/``
(train_AR.py:559-613). These tests write such directories with the ACTUAL
reference models through the shim's register_to_config/save_pretrained and
verify ``ladcast_tpu.models.hub`` loads them with zero manual config flags
through the production CLI loader.
"""

import json
import os
import shutil

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ladcast_tpu.config import DCAEConfig, LaDCastDiTConfig  # noqa: E402
from ladcast_tpu.models import hub  # noqa: E402


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_dcae_hub_dir_forward_parity(tmp_path):
    """save_pretrained dir -> CLI loader (wrong fallback config on
    purpose) -> config parsed from config.json, forward matches the
    reference model."""
    from ladcast_tpu.cli.pred_rollout import _load_any_params
    from ladcast_tpu.models.dcae import AutoencoderDC
    from tests.test_oracle_dcae import _tiny_pair

    ref, _, want_cfg = _tiny_pair(seed=4)
    d = tmp_path / "dcae_hub"
    ref.save_pretrained(str(d))
    assert (d / "config.json").is_file()
    assert (d / "diffusion_pytorch_model.safetensors").is_file()

    params, cfg = _load_any_params(str(d), "dcae", DCAEConfig())
    assert cfg == want_cfg  # incl. str->per-stage-tuple normalization

    rng = np.random.RandomState(6)
    x = rng.randn(2, 6, 16, 24).astype(np.float32)
    static = rng.randn(2, 2, 16, 24).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), return_dict=False,
                   static_conditioning_tensor=torch.from_numpy(static),
                   return_static=True)[0].numpy()
    model = AutoencoderDC(cfg)
    got = model.apply(jax.tree.map(jnp.asarray, params),
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(static.transpose(0, 2, 3, 1)),
                      return_static=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4, rtol=1e-4)


def _save_training_checkpoint(tmp_path, seed=12):
    """Emulate the reference save_model_hook layout: ckpt/ar_model +
    ckpt/ar_model_ema with DIFFERENT weights, the EMA config.json carrying
    EMAModel.state_dict() metadata keys (train_AR.py:561-570)."""
    from tests.oracles.refload import load_reference
    from tests.test_oracle_dit import _tiny_kwargs

    ref_mod = load_reference("ladcast.models.LaDCast_3D_model")
    torch.manual_seed(seed)
    raw = ref_mod.LaDCastTransformer3DModel(**_tiny_kwargs())
    torch.manual_seed(seed + 1)
    ema = ref_mod.LaDCastTransformer3DModel(**_tiny_kwargs())
    raw.eval(), ema.eval()

    ckpt = tmp_path / "checkpoint-500"
    raw.save_pretrained(str(ckpt / "ar_model"))
    ema.save_pretrained(str(ckpt / "ar_model_ema"))
    cfg_path = ckpt / "ar_model_ema" / "config.json"
    cfg = json.loads(cfg_path.read_text())
    cfg.update({"decay": 0.9999, "min_decay": 0.0, "optimization_step": 500,
                "update_after_step": 0, "use_ema_warmup": True,
                "inv_gamma": 1.0, "power": 2 / 3})
    cfg_path.write_text(json.dumps(cfg))
    return ckpt, raw, ema


def test_dit_training_checkpoint_prefers_ema_and_matches_forward(tmp_path):
    from ladcast_tpu.cli.pred_rollout import _load_any_params
    from ladcast_tpu.data.time_utils import timestamps_to_year_progress
    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D

    ckpt, raw, ema = _save_training_checkpoint(tmp_path)

    # default resolution: ar_model_ema wins; EMA metadata keys ignored
    params, cfg = _load_any_params(str(ckpt), "dit", None)
    assert isinstance(cfg, LaDCastDiTConfig)
    assert cfg.num_layers == 2 and cfg.incl_time_elapsed

    # explicit subfolder: the raw model
    params_raw, _ = _load_any_params(str(ckpt), "dit", None,
                                     subfolder="ar_model")
    w_ema = _flat(params)[("params", "proj_out", "kernel")]
    w_raw = _flat(params_raw)[("params", "proj_out", "kernel")]
    assert not np.allclose(w_ema, w_raw)
    np.testing.assert_array_equal(
        w_ema, ema.state_dict()["proj_out.weight"].numpy().T)

    # forward parity through the hub-loaded config + params (EMA model)
    b, t, t_in, h, w = 2, 2, 1, 4, 6
    c = cfg.in_channels
    rng = np.random.RandomState(9)
    x = rng.randn(b, c, t, h, w).astype(np.float32)
    cond = rng.randn(b, c, t_in, h, w).astype(np.float32)
    c_noise = (rng.randn(b) * 0.5).astype(np.float32)
    ts_ints = np.array([2018010106, 2018063018], np.int64)
    with torch.no_grad():
        want = ema(torch.from_numpy(x), torch.from_numpy(c_noise),
                   torch.from_numpy(cond),
                   time_elapsed=torch.from_numpy(ts_ints),
                   return_dict=False)[0].numpy()
    model = LaDCastTransformer3D(cfg)
    yp = jnp.asarray(
        timestamps_to_year_progress(ts_ints).astype(np.float32))
    got = model.apply(jax.tree.map(jnp.asarray, params),
                      jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                      jnp.asarray(c_noise),
                      jnp.asarray(cond.transpose(0, 2, 3, 4, 1)), yp)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3),
                               want, atol=2e-4, rtol=2e-4)


def test_sharded_safetensors_index(tmp_path):
    """Index-sharded layout loads identically to the single-file layout."""
    from safetensors.numpy import load_file, save_file

    from tests.test_oracle_dcae import _tiny_pair

    ref, _, _ = _tiny_pair(seed=7)
    d = tmp_path / "dcae_hub"
    ref.save_pretrained(str(d))
    single = hub.load_pretrained(str(d))

    sd = load_file(str(d / hub.SAFETENSORS_NAME))
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {
        "diffusion_pytorch_model-00001-of-00002.safetensors": keys[:half],
        "diffusion_pytorch_model-00002-of-00002.safetensors": keys[half:],
    }
    sharded_dir = tmp_path / "dcae_sharded"
    sharded_dir.mkdir()
    shutil.copy(d / "config.json", sharded_dir / "config.json")
    weight_map = {}
    for fname, ks in shards.items():
        save_file({k: sd[k] for k in ks}, str(sharded_dir / fname))
        weight_map.update({k: fname for k in ks})
    (sharded_dir / hub.INDEX_NAME).write_text(
        json.dumps({"metadata": {}, "weight_map": weight_map}))

    sharded = hub.load_pretrained(str(sharded_dir))
    assert sharded.kind == "dcae" and sharded.config == single.config
    fs, fo = _flat(sharded.params), _flat(single.params)
    assert set(fs) == set(fo)
    for k in fs:
        np.testing.assert_array_equal(fs[k], fo[k])


def test_parse_config_rejects_unknown_model_keys():
    with pytest.raises(ValueError, match="not supported"):
        hub.parse_config_dict({"_class_name": "AutoencoderDC",
                               "latent_channels": 4,
                               "brand_new_flag": True})
    with pytest.raises(ValueError, match="_class_name"):
        hub.parse_config_dict({"_class_name": "SomethingElse"})


def test_resolve_and_kind_guards(tmp_path):
    from tests.test_oracle_dcae import _tiny_pair

    ref, _, _ = _tiny_pair(seed=8)
    d = tmp_path / "nested" / "DCAE"
    ref.save_pretrained(str(d))

    # unique-subfolder resolution
    loaded = hub.load_pretrained(str(tmp_path / "nested"))
    assert loaded.kind == "dcae"

    with pytest.raises(ValueError, match="expected dit"):
        hub.load_pretrained(str(d), expect_kind="dit")
    with pytest.raises(FileNotFoundError):
        hub.resolve_model_dir(str(tmp_path))  # no config.json anywhere
    assert not hub.is_hub_dir(str(tmp_path / "missing"))
    assert hub.is_hub_dir(str(tmp_path / "nested"))
    os.remove(str(d / hub.SAFETENSORS_NAME))
    with pytest.raises(FileNotFoundError, match="safetensors"):
        hub.load_pretrained(str(d))
