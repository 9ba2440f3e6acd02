"""Hub-layout EXPORT: checkpoints trained here must ship back to
diffusers/reference users.

``hub.save_pretrained`` writes a diffusers model directory (config.json
+ reference-layout safetensors). Two contracts are oracle-tested:

  * round-trip: save -> ``hub.load_pretrained`` reproduces the exact
    flax tree and config (incl. the index-sharded layout);
  * reference-loadable: the exported state dict loads into the ACTUAL
    reference torch modules (strict=True) and their forward matches the
    flax model that was exported -- the full both-directions weight
    conversion closed under executable reference code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ladcast_tpu.models import hub  # noqa: E402
from ladcast_tpu.models.dcae import AutoencoderDC  # noqa: E402
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D  # noqa: E402
from tests.oracles.refload import load_reference  # noqa: E402


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_flatten_with_path(a)[0]
    lb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (p, x), (_, y) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=str(p))


def test_dit_export_roundtrip(tmp_path):
    from tests.test_oracle_dit import _cfg_from_kwargs, _tiny_kwargs

    cfg = _cfg_from_kwargs(_tiny_kwargs())
    model = LaDCastTransformer3D(cfg)
    x = jnp.zeros((1, 2, 4, 6, cfg.in_channels))
    cond = jnp.zeros((1, 1, 4, 6, cfg.in_channels))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), cond,
                        jnp.zeros((1,)))
    d = tmp_path / "dit_export"
    hub.save_pretrained(str(d), "dit", cfg, params)
    loaded = hub.load_pretrained(str(d))
    assert loaded.kind == "dit" and loaded.config == cfg
    _assert_trees_equal(loaded.params, params)


def test_dit_export_sharded_roundtrip(tmp_path):
    from tests.test_oracle_dit import _cfg_from_kwargs, _tiny_kwargs

    cfg = _cfg_from_kwargs(_tiny_kwargs(num_layers=1, num_single_layers=1,
                                        num_refiner_layers=1))
    model = LaDCastTransformer3D(cfg)
    x = jnp.zeros((1, 2, 4, 6, cfg.in_channels))
    cond = jnp.zeros((1, 1, 4, 6, cfg.in_channels))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((1,)), cond,
                        jnp.zeros((1,)))
    d = tmp_path / "dit_sharded"
    hub.save_pretrained(str(d), "dit", cfg, params,
                        max_shard_bytes=64 * 1024)
    import os
    assert os.path.isfile(os.path.join(str(d), hub.INDEX_NAME))
    shards = [f for f in os.listdir(str(d)) if f.endswith(".safetensors")]
    assert len(shards) > 1, shards
    loaded = hub.load_pretrained(str(d))
    _assert_trees_equal(loaded.params, params)


def test_dit_export_loads_into_reference(tmp_path):
    """Exported weights load into the ACTUAL reference
    LaDCastTransformer3DModel with strict=True, and its forward equals
    the exported flax model's."""
    from tests.test_oracle_dit import _cfg_from_kwargs, _tiny_kwargs

    kwargs = _tiny_kwargs(num_layers=1, num_single_layers=1,
                          num_refiner_layers=1)
    cfg = _cfg_from_kwargs(kwargs)
    model = LaDCastTransformer3D(cfg)
    rng = np.random.RandomState(7)
    b, t, t_in, h, w, c = 1, 2, 1, 4, 6, cfg.in_channels
    x = rng.randn(b, t, h, w, c).astype(np.float32)
    cond = rng.randn(b, t_in, h, w, c).astype(np.float32)
    cn = (rng.randn(b) * 0.5).astype(np.float32)
    params = model.init(jax.random.PRNGKey(2), jnp.asarray(x),
                        jnp.asarray(cn), jnp.asarray(cond),
                        jnp.zeros((b,)))

    d = tmp_path / "dit_for_ref"
    hub.save_pretrained(str(d), "dit", cfg, params)
    sd = hub.load_state_dict(str(d))

    ref_mod = load_reference("ladcast.models.LaDCast_3D_model")
    ref = ref_mod.LaDCastTransformer3DModel(**kwargs)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected

    ref.eval()
    ts = np.array([2018010106], np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
                   torch.from_numpy(cn),
                   torch.from_numpy(cond.transpose(0, 4, 1, 2, 3)),
                   time_elapsed=torch.from_numpy(ts),
                   return_dict=False)[0].numpy()
    from ladcast_tpu.data.time_utils import timestamps_to_year_progress
    yp = jnp.asarray(timestamps_to_year_progress(ts).astype(np.float32))
    got = model.apply(params, jnp.asarray(x), jnp.asarray(cn),
                      jnp.asarray(cond), yp)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_dcae_export_loads_into_reference(tmp_path):
    from tests.test_oracle_dcae import B, DYN, H, STATIC, W, _tiny_pair

    ref, model, cfg = _tiny_pair(seed=3)
    rng = np.random.RandomState(3)
    x = rng.randn(B, H, W, DYN).astype(np.float32)
    static = rng.randn(H, W, STATIC).astype(np.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(x),
                        jnp.asarray(static))

    d = tmp_path / "dcae_for_ref"
    hub.save_pretrained(str(d), "dcae", cfg, params)
    sd = hub.load_state_dict(str(d))
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected

    xt = torch.from_numpy(
        np.concatenate([x, np.broadcast_to(static, (B, H, W, STATIC))],
                       axis=-1).transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = ref(xt).sample.numpy()
    got = model.apply(params, jnp.asarray(x), jnp.asarray(static))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_ema_metadata_written_and_ignored_on_load(tmp_path):
    """EMA checkpoints carry EMAModel.state_dict() keys merged into
    config.json (reference train_AR.py:559-583); export writes them and
    ingestion must keep filtering them out."""
    import json
    import os

    from tests.test_oracle_dit import _cfg_from_kwargs, _tiny_kwargs

    cfg = _cfg_from_kwargs(_tiny_kwargs(num_layers=1, num_single_layers=1,
                                        num_refiner_layers=1))
    model = LaDCastTransformer3D(cfg)
    x = jnp.zeros((1, 2, 4, 6, cfg.in_channels))
    cond = jnp.zeros((1, 1, 4, 6, cfg.in_channels))
    params = model.init(jax.random.PRNGKey(4), x, jnp.zeros((1,)), cond,
                        jnp.zeros((1,)))
    d = tmp_path / "ar_model_ema"
    hub.save_pretrained(str(d), "dit", cfg, params,
                        ema_metadata={"decay": 0.9999, "power": 2 / 3,
                                      "optimization_step": 1234,
                                      "not_an_ema_key": True})
    raw = json.load(open(os.path.join(str(d), hub.CONFIG_NAME)))
    assert raw["decay"] == 0.9999 and raw["optimization_step"] == 1234
    assert "not_an_ema_key" not in raw
    loaded = hub.load_pretrained(str(d))
    assert loaded.config == cfg
    _assert_trees_equal(loaded.params, params)
