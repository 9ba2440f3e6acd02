"""Import published reference weights (HF diffusers/safetensors layout)
into LaDCast-TPU flax parameter pytrees.

Covers both models (SURVEY.md "hard parts": weight import):
  - AutoencoderDC  (tonyzyl/ladcast V0.1.X/DCAE, diffusers format)
  - LaDCastTransformer3DModel (375M / 1.6B, incl. *_ema variants)

Layout conversions:
  torch Linear  (out, in)        -> flax Dense kernel (in, out)
  torch Conv2d  (O, I/g, kh, kw) -> HWIO (kh, kw, I/g, O)
  torch Conv3d 1x1x1 (O, I,1,1,1)-> Dense (I, O)
  grouped 1x1 Conv2d (C, gs,1,1) -> block-diagonal einsum weight (g, gs, gs)

The mapping is generated from OUR parameter tree (one rule per module
kind), so coverage is mechanically checkable in both directions.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np


def _linear(name):
    return {"kernel": (f"{name}.weight", lambda w: np.transpose(w, (1, 0))),
            "bias": (f"{name}.bias", lambda b: b)}


def _conv(name):
    return {"kernel": (f"{name}.weight", lambda w: np.transpose(w, (2, 3, 1, 0))),
            "bias": (f"{name}.bias", lambda b: b)}


def _norm(name):
    return {"weight": (f"{name}.weight", lambda w: w),
            "bias": (f"{name}.bias", lambda b: b)}


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _grouped_1x1(w: np.ndarray, groups: int) -> np.ndarray:
    """(C, gs_in, 1, 1) grouped conv weight -> (g, gs_in, gs_out) einsum
    weight with out index local to the group."""
    C, gs_in = w.shape[0], w.shape[1]
    gs_out = C // groups
    w = w.reshape(groups, gs_out, gs_in)  # [g, o_local, i]
    return np.transpose(w, (0, 2, 1))     # [g, i, o_local]


def _dcae_rule(path: Tuple[str, ...]) -> Tuple[str, Callable]:
    """Map one flax param path of AutoencoderDC to (ref name, transform)."""
    ref = list(path)
    leaf = ref.pop()
    # down_blocks_3 -> down_blocks.3 etc. (but timestep_embedder's
    # linear_1/linear_2 are literal diffusers module names, not indices)
    parts = []
    for p in ref:
        if (p not in ("linear_1", "linear_2")
                and "_" in p and p.rsplit("_", 1)[-1].isdigit()):
            stem, idx = p.rsplit("_", 1)
            parts.extend([stem, idx])
        else:
            parts.append(p)

    if leaf == "proj_out_kernel":  # grouped 1x1 in Sana multiscale proj
        name = ".".join(parts + ["proj_out", "weight"])
        return name, None  # handled specially (needs group count)

    name = ".".join(parts)
    if leaf == "kernel":
        return f"{name}.weight", None  # conv vs dense decided by rank
    if leaf in ("bias", "weight"):
        return f"{name}.{leaf}", lambda w: w
    raise KeyError(path)


def convert_dcae_state_dict(state_dict: Dict[str, np.ndarray],
                            params_template: Dict) -> Dict:
    """state_dict: reference AutoencoderDC torch state dict (numpy values).
    params_template: our model.init(...) tree (for structure/shape checks).
    Returns {'params': ...} matching the template.
    """
    flat_t = _flatten(params_template["params"])
    out = {}
    used = set()
    for path, tmpl in flat_t.items():
        ref_name, tf = _dcae_rule(path)
        if ref_name not in state_dict:
            raise KeyError(f"{ref_name} (for {'/'.join(path)}) missing "
                           f"from state dict")
        w = np.asarray(state_dict[ref_name])
        used.add(ref_name)
        if tf is not None:
            w = tf(w)
        elif path[-1] == "proj_out_kernel":
            w = _grouped_1x1(w, groups=tmpl.shape[0])
        elif w.ndim == 4:  # conv OIHW -> HWIO
            w = np.transpose(w, (2, 3, 1, 0))
        elif w.ndim == 2:  # linear (our Dense implements 1x1 convs)
            w = np.transpose(w, (1, 0))
        if w.shape != tmpl.shape:
            # 1x1 convs stored as (O, I, 1, 1) map onto Dense kernels.
            if w.ndim == 4 and w.shape[:2] == (1, 1):
                w = w[0, 0]
            if w.shape != tmpl.shape:
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: ref {w.shape} "
                    f"vs ours {tmpl.shape}")
        out[path] = w.astype(np.float32)
    unused = [k for k in state_dict if k not in used]
    unused = [k for k in unused if not k.endswith("num_batches_tracked")]
    if unused:
        raise ValueError(f"unconsumed reference tensors: {unused[:8]} "
                         f"({len(unused)} total)")
    return {"params": _unflatten(out)}


_DIT_LEAF_RENAMES = {
    # our flax path piece -> reference module path piece(s)
    "x_embedder": "x_embedder.proj",
    "context_embedder": "context_embedder.proj",
    "norm_out_linear": "norm_out.linear",
    "text_embedder_linear_1": "text_embedder.linear_1",
    "text_embedder_linear_2": "text_embedder.linear_2",
    "to_out": "to_out.0",
}


_QK_NORM_LEAVES = ("norm_q_weight", "norm_k_weight",
                   "norm_added_q_weight", "norm_added_k_weight")


def _dit_rule(path: Tuple[str, ...]) -> str:
    # qk-norm weights are flat params here (attn/norm_q_weight) but
    # submodules in the reference (attn.norm_q.weight)
    if path[-1] in _QK_NORM_LEAVES:
        path = path[:-1] + (path[-1][: -len("_weight")], "weight")
    parts = []
    for i, p in enumerate(path[:-1]):
        if "_" in p and p.rsplit("_", 1)[-1].isdigit() and p.rsplit("_", 1)[0] in (
                "transformer_blocks", "single_transformer_blocks",
                "refiner_blocks", "linear"):
            stem, idx = p.rsplit("_", 1)
            if stem == "linear":
                parts.append(p)  # TimestepEmbedder linear_1/linear_2
                continue
            parts.extend([stem, idx])
        elif p in _DIT_LEAF_RENAMES:
            parts.append(_DIT_LEAF_RENAMES[p])
        elif p == "ff" or p == "ff_context":
            parts.append(p)
        elif p == "proj_in" and i > 0 and path[i - 1] in ("ff", "ff_context"):
            parts.append("net.0.proj")
        elif p == "proj_out" and i > 0 and path[i - 1] in ("ff", "ff_context"):
            parts.append("net.2")
        else:
            parts.append(p)
    # refiner blocks live under context_refiner.token_refiner in the ref
    name = ".".join(parts)
    name = name.replace("context_refiner.refiner_blocks",
                        "context_refiner.token_refiner.refiner_blocks")
    name = name.replace("norm_out_linear.", "norm_out.linear.")
    # refiner block gate head: our norm_out_linear == ref norm_out.linear
    leaf = path[-1]
    if leaf == "kernel":
        return f"{name}.weight"
    return f"{name}.{leaf}"


def convert_dit_state_dict(state_dict: Dict[str, np.ndarray],
                           params_template: Dict) -> Dict:
    """Reference LaDCastTransformer3DModel state dict -> our tree."""
    flat_t = _flatten(params_template["params"])
    out = {}
    used = set()
    for path, tmpl in flat_t.items():
        ref_name = _dit_rule(path)
        if ref_name not in state_dict:
            raise KeyError(f"{ref_name} (for {'/'.join(path)}) missing")
        w = np.asarray(state_dict[ref_name])
        used.add(ref_name)
        if path[-1] == "kernel":
            if w.ndim == 5:  # Conv3d 1x1x1 patch embed -> Dense
                w = w[:, :, 0, 0, 0]
            w = np.transpose(w, (1, 0))
        if w.shape != tmpl.shape:
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"ref {w.shape} vs ours {tmpl.shape}")
        out[path] = w.astype(np.float32)
    unused = [k for k in state_dict if k not in used]
    if unused:
        raise ValueError(f"unconsumed reference tensors: {unused[:8]} "
                         f"({len(unused)} total)")
    return {"params": _unflatten(out)}


def export_reference_state_dict(params: Dict, kind: str) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_*_state_dict``: our flax tree -> a state dict
    in the REFERENCE torch layout (numpy values), loadable by the actual
    reference modules with ``strict=True`` (oracle-tested in
    tests/test_hub_export.py). This is what lets checkpoints trained here
    ship back to diffusers/reference users via ``hub.save_pretrained``."""
    flat = _flatten(params["params"])
    sd: Dict[str, np.ndarray] = {}
    for path, w in flat.items():
        w = np.asarray(w)
        if kind == "dcae":
            ref_name, _ = _dcae_rule(path)
        else:
            ref_name = _dit_rule(path)
        leaf = path[-1]
        if leaf == "proj_out_kernel":
            # (g, gs_in, gs_out) einsum weight -> grouped 1x1 Conv2d
            g, gs_in, gs_out = w.shape
            w = np.transpose(w, (0, 2, 1)).reshape(g * gs_out, gs_in, 1, 1)
        elif leaf == "kernel" and w.ndim == 4:    # HWIO -> OIHW
            w = np.transpose(w, (3, 2, 0, 1))
        elif leaf == "kernel":                    # Dense (in, out) -> (out, in)
            w = np.transpose(w, (1, 0))
            if kind == "dit" and path[-2] in ("x_embedder",
                                              "context_embedder"):
                w = w[:, :, None, None, None]     # Conv3d 1x1x1 patch embed
            elif kind == "dcae" and path[-2] in ("conv_inverted",
                                                 "conv_point"):
                w = w[:, :, None, None]           # 1x1 Conv2d in GLUMBConv
        sd[ref_name] = np.ascontiguousarray(w, dtype=np.float32)
    return sd


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(path)


def synthesize_reference_state_dict(params_template: Dict, kind: str,
                                    seed: int = 0) -> Dict[str, np.ndarray]:
    """Build a random state dict in the REFERENCE layout whose conversion
    must exactly reproduce our template structure (used by tests; also
    documents the expected reference key set)."""
    rng = np.random.RandomState(seed)
    flat_t = _flatten(params_template["params"])
    sd = {}
    for path, tmpl in flat_t.items():
        if kind == "dcae":
            ref_name, _ = _dcae_rule(path)
        else:
            ref_name = _dit_rule(path)
        shape = tmpl.shape
        if path[-1] == "proj_out_kernel":
            g, gs_in, gs_out = shape
            ref_shape = (g * gs_out, gs_in, 1, 1)
        elif path[-1] == "kernel" and len(shape) == 4:
            ref_shape = (shape[3], shape[2], shape[0], shape[1])
        elif path[-1] == "kernel":
            if kind == "dit" and path[-2] in ("x_embedder", "context_embedder"):
                ref_shape = (shape[1], shape[0], 1, 1, 1)
            elif kind == "dcae" and path[-2] in ("conv_inverted", "conv_point"):
                # 1x1 Conv2d in the reference (GLUMBConv), Dense here.
                ref_shape = (shape[1], shape[0], 1, 1)
            else:
                ref_shape = (shape[1], shape[0])
        else:
            ref_shape = shape
        sd[ref_name] = rng.randn(*ref_shape).astype(np.float32)
    return sd
