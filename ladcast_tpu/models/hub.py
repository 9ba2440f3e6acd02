"""Diffusers hub-directory checkpoint ingestion.

The published reference artifacts (``tonyzyl/ladcast`` ``V0.1.X``) are
diffusers ``save_pretrained`` directories: a ``config.json`` written by
``register_to_config`` (reference DCAE.py:781, LaDCast_3D_model.py:623)
next to ``diffusion_pytorch_model.safetensors`` — possibly sharded with a
``diffusion_pytorch_model.safetensors.index.json`` weight map. Training
checkpoints additionally nest the model under ``ar_model/`` with an EMA
mirror under ``ar_model_ema/`` (reference train_AR.py:559-613); the EMA
directory's ``config.json`` carries extra ``EMAModel.state_dict()`` keys
(decay/power/optimization_step/...) merged in by
``model.register_to_config(**state_dict)``.

This module turns any of those layouts into ``(kind, config dataclass,
flax params)`` with zero manual config flags, via the production weight
converters in :mod:`ladcast_tpu.models.weight_import`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu import channels as ch
from ladcast_tpu.config import DCAEConfig, LaDCastDiTConfig

SAFETENSORS_NAME = "diffusion_pytorch_model.safetensors"
INDEX_NAME = "diffusion_pytorch_model.safetensors.index.json"
CONFIG_NAME = "config.json"

# diffusers EMAModel.save_pretrained merges its state dict (minus
# shadow_params) into the model config before save_pretrained — these keys
# are EMA metadata, not model config.
_EMA_CONFIG_KEYS = frozenset({
    "decay", "min_decay", "optimization_step", "update_after_step",
    "use_ema_warmup", "inv_gamma", "power", "foreach", "model_cls",
})

_CLASS_KINDS = {
    "LaDCastTransformer3DModel": "dit",
    "AutoencoderDC": "dcae",
}

# Subfolders probed when `path` itself has no config.json, most-preferred
# first (EMA weights are what the reference evaluates/ships with,
# train_AR.py:1154-1157).
_KNOWN_SUBFOLDERS = ("ar_model_ema", "ar_model", "DCAE", "dcae")


class HubModel(NamedTuple):
    kind: str          # "dit" | "dcae"
    config: object     # LaDCastDiTConfig | DCAEConfig
    params: Dict       # flax {'params': ...} tree


def is_hub_dir(path: str) -> bool:
    """True if `path` looks like a diffusers model directory (config.json
    at top level or in a known/unique subfolder)."""
    if not os.path.isdir(path):
        return False
    if os.path.isfile(os.path.join(path, CONFIG_NAME)):
        return True
    return bool(_candidate_subfolders(path))


def _candidate_subfolders(path: str):
    out = []
    for name in sorted(os.listdir(path)):
        sub = os.path.join(path, name)
        if os.path.isdir(sub) and os.path.isfile(
                os.path.join(sub, CONFIG_NAME)):
            out.append(name)
    return out


def resolve_model_dir(path: str, subfolder: Optional[str] = None) -> str:
    """Resolve the directory actually holding config.json + weights.

    Accepts the model dir itself, a training checkpoint dir containing
    ``ar_model/`` / ``ar_model_ema/`` (EMA preferred — it is what the
    reference swaps in for validation and final save), or any dir with
    exactly one model subfolder.
    """
    if subfolder:
        sub = os.path.join(path, subfolder)
        if not os.path.isfile(os.path.join(sub, CONFIG_NAME)):
            raise FileNotFoundError(
                f"no {CONFIG_NAME} in requested subfolder {sub}")
        return sub
    if os.path.isfile(os.path.join(path, CONFIG_NAME)):
        return path
    cands = _candidate_subfolders(path)
    for name in _KNOWN_SUBFOLDERS:
        if name in cands:
            return os.path.join(path, name)
    if len(cands) == 1:
        return os.path.join(path, cands[0])
    raise FileNotFoundError(
        f"no {CONFIG_NAME} under {path}; model subfolders found: "
        f"{cands or 'none'} (pass subfolder= to disambiguate)")


def _tupled(v):
    if isinstance(v, list):
        return tuple(_tupled(x) for x in v)
    return v


def _per_stage(v, n: int):
    """diffusers configs allow a bare string where a per-stage tuple is
    meant (reference DCAE.py:789-790 block_types / :813-814 norm/act)."""
    if isinstance(v, str):
        return (v,) * n
    return _tupled(v)


def parse_config_dict(raw: Dict) -> "tuple[str, object]":
    """Map a diffusers config.json dict to (kind, config dataclass).

    Unknown non-metadata keys raise: silently dropping a model option
    (e.g. a new reference flag this build does not implement) would load
    weights into the wrong architecture.
    """
    cls_name = raw.get("_class_name")
    if cls_name not in _CLASS_KINDS:
        raise ValueError(
            f"unrecognized _class_name {cls_name!r} (known: "
            f"{sorted(_CLASS_KINDS)})")
    kind = _CLASS_KINDS[cls_name]
    cfg_cls = LaDCastDiTConfig if kind == "dit" else DCAEConfig
    fields = {f.name for f in dataclasses.fields(cfg_cls)}

    kw = {}
    unknown = []
    for k, v in raw.items():
        if k.startswith("_") or k in _EMA_CONFIG_KEYS:
            continue
        if k not in fields:
            unknown.append(k)
            continue
        kw[k] = _tupled(v)
    if unknown:
        raise ValueError(
            f"config.json keys not supported by {cfg_cls.__name__}: "
            f"{sorted(unknown)}")

    if kind == "dcae":
        n = len(kw.get("encoder_block_out_channels",
                       DCAEConfig.encoder_block_out_channels))
        for key in ("encoder_block_types", "decoder_block_types",
                    "decoder_norm_types", "decoder_act_fns"):
            if key in kw:
                kw[key] = _per_stage(kw[key], n)
        if kw.get("out_channels") is None:
            kw["out_channels"] = kw.get("in_channels",
                                        DCAEConfig.in_channels)
    else:
        for key in ("rope_spatial_grid_start_pos", "rope_spatial_grid_end_pos"):
            v = kw.get(key)
            if isinstance(v, (int, float)):
                kw[key] = (float(v), float(v))
        if kw.get("rope_spatial_grid_end_pos") is None:
            raise ValueError(
                "rope_spatial_grid_end_pos=None (integer-index RoPE grid) "
                "is not supported; shipped configs always set it "
                "(configs/ladcast_375M.yaml:19-25)")
        if kw.get("out_channels") is None:
            kw["out_channels"] = kw.get("in_channels",
                                        LaDCastDiTConfig.in_channels)
    return kind, cfg_cls(**kw)


def load_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load the torch state dict (numpy values) from a model dir: single
    safetensors file or index-sharded layout."""
    from safetensors.numpy import load_file

    index_path = os.path.join(model_dir, INDEX_NAME)
    if os.path.isfile(index_path):
        with open(index_path) as f:
            weight_map = json.load(f)["weight_map"]
        out: Dict[str, np.ndarray] = {}
        for shard in sorted(set(weight_map.values())):
            out.update(load_file(os.path.join(model_dir, shard)))
        missing = set(weight_map) - set(out)
        if missing:
            raise ValueError(
                f"index lists tensors missing from shards: "
                f"{sorted(missing)[:5]} ({len(missing)} total)")
        return out
    single = os.path.join(model_dir, SAFETENSORS_NAME)
    if os.path.isfile(single):
        return load_file(single)
    sts = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]
    if len(sts) == 1:
        return load_file(os.path.join(model_dir, sts[0]))
    raise FileNotFoundError(
        f"no {SAFETENSORS_NAME} / {INDEX_NAME} in {model_dir} "
        f"(found: {sts or 'no safetensors files'})")


def build_param_template(kind: str, cfg) -> Dict:
    """Abstract param tree (eval_shape) for the converters' shape checks.
    Spatial dims do not affect parameter shapes; production grid dims are
    used (any dims divisible by the DCAE compression ratio would do)."""
    if kind == "dcae":
        from ladcast_tpu.models.dcae import AutoencoderDC

        model = AutoencoderDC(cfg)
        kw = {}
        if cfg.temb_channels:
            kw["time_elapsed"] = jax.ShapeDtypeStruct((1,), jnp.float32)
        return jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct(
                (1, ch.GRID_LAT, ch.GRID_LON,
                 cfg.in_channels - cfg.static_channels), jnp.float32),
            jax.ShapeDtypeStruct(
                (ch.GRID_LAT, ch.GRID_LON, cfg.static_channels),
                jnp.float32), **kw)
    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D

    model = LaDCastTransformer3D(cfg)
    return jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 4, ch.LATENT_LAT, ch.LATENT_LON,
                              cfg.in_channels), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.float32),
        jax.ShapeDtypeStruct((1, 1, ch.LATENT_LAT, ch.LATENT_LON,
                              cfg.conditioning_tensor_in_channels),
                             jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.float32))


_KIND_CLASSES = {v: k for k, v in _CLASS_KINDS.items()}

# diffusers shards at 10 GB by default (save_pretrained max_shard_size);
# same default here so big exports match the hub layout users expect.
DEFAULT_MAX_SHARD_BYTES = 10 * 1024 ** 3


def config_to_dict(kind: str, cfg) -> Dict:
    """Dataclass config -> diffusers-style config.json dict (the exact
    format ``parse_config_dict`` reads back; tuples become JSON lists)."""
    def jsonable(v):
        if isinstance(v, tuple):
            return [jsonable(x) for x in v]
        return v

    raw = {"_class_name": _KIND_CLASSES[kind]}
    for f in dataclasses.fields(type(cfg)):
        raw[f.name] = jsonable(getattr(cfg, f.name))
    return raw


def save_pretrained(path: str, kind: str, cfg, params,
                    ema_metadata: Optional[Dict] = None,
                    max_shard_bytes: int = DEFAULT_MAX_SHARD_BYTES) -> None:
    """Write a diffusers ``save_pretrained``-layout model directory:
    ``config.json`` + single or index-sharded
    ``diffusion_pytorch_model.safetensors`` holding the REFERENCE-layout
    state dict (torch naming + OIHW/out-in shapes via
    ``weight_import.export_reference_state_dict``) -- so a checkpoint
    trained here loads into the actual reference modules and back through
    ``load_pretrained`` unchanged.

    ``ema_metadata``: extra EMA keys merged into config.json, mirroring
    diffusers ``EMAModel.save_pretrained`` (reference train_AR.py:559-583
    writes ``ar_model_ema/`` this way).
    """
    from safetensors.numpy import save_file

    from ladcast_tpu.models import weight_import as wi

    os.makedirs(path, exist_ok=True)
    raw = config_to_dict(kind, cfg)
    if ema_metadata:
        raw.update({k: ema_metadata[k] for k in ema_metadata
                    if k in _EMA_CONFIG_KEYS})
    with open(os.path.join(path, CONFIG_NAME), "w") as f:
        json.dump(raw, f, indent=2, sort_keys=True)

    sd = wi.export_reference_state_dict(
        jax.tree.map(np.asarray, params), kind)
    total = sum(int(v.nbytes) for v in sd.values())
    if total <= max_shard_bytes:
        save_file(sd, os.path.join(path, SAFETENSORS_NAME))
        return
    # index-sharded layout (diffusers naming: -0000X-of-0000N suffixes)
    shards, cur, cur_bytes = [], {}, 0
    for k in sorted(sd):
        v = sd[k]
        if cur and cur_bytes + v.nbytes > max_shard_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += int(v.nbytes)
    shards.append(cur)
    n = len(shards)
    stem = SAFETENSORS_NAME[: -len(".safetensors")]
    weight_map = {}
    for i, shard in enumerate(shards):
        fname = f"{stem}-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(path, fname))
        for k in shard:
            weight_map[k] = fname
    with open(os.path.join(path, INDEX_NAME), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f, indent=2, sort_keys=True)


def load_pretrained(path: str, subfolder: Optional[str] = None,
                    expect_kind: Optional[str] = None) -> HubModel:
    """Load a diffusers model directory into (kind, config, flax params)."""
    from ladcast_tpu.models import weight_import as wi

    model_dir = resolve_model_dir(path, subfolder)
    with open(os.path.join(model_dir, CONFIG_NAME)) as f:
        raw = json.load(f)
    kind, cfg = parse_config_dict(raw)
    if expect_kind is not None and kind != expect_kind:
        raise ValueError(
            f"{model_dir} holds a {kind} model "
            f"(_class_name={raw.get('_class_name')!r}), expected "
            f"{expect_kind}")
    sd = load_state_dict(model_dir)
    template = build_param_template(kind, cfg)
    convert = (wi.convert_dit_state_dict if kind == "dit"
               else wi.convert_dcae_state_dict)
    return HubModel(kind, cfg, convert(sd, template))
