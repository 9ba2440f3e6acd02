"""Parameter sharding rules (GSPMD tensor parallelism for the DiT).

The reference's only parallelism is DDP (SURVEY.md section 2.2) because
its models fit one device. Here we additionally provide Megatron-style
tensor parallelism as *sharding annotations*: QKV / MLP-in kernels are
column-sharded and attention-out / MLP-out kernels row-sharded over a
"model" mesh axis; XLA GSPMD inserts the all-reduces. Everything else
(norms, embeddings, heads of irregular shapes) stays replicated.

This scales the 1.6B model's optimizer+EMA state across chips without any
model-code changes -- the rules operate purely on parameter-tree paths.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL_KERNELS = (
    "to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj",
    "proj_mlp",
)
ROW_PARALLEL_KERNELS = ("to_out", "to_add_out")
FF_MODULES = ("ff", "ff_context")


def dit_param_spec(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one DiT parameter given its flattened path."""
    names = [getattr(k, "key", str(k)) for k in path]
    leaf_name = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    grand = names[-3] if len(names) >= 3 else ""

    if leaf_name == "kernel":
        if parent in COLUMN_PARALLEL_KERNELS:
            return P(None, "model")
        if parent in ROW_PARALLEL_KERNELS:
            return P("model", None)
        if parent == "proj_in" and grand in FF_MODULES:
            return P(None, "model")
        if parent == "proj_out" and grand in FF_MODULES:
            return P("model", None)
    if leaf_name == "bias":
        if parent in COLUMN_PARALLEL_KERNELS:
            return P("model")
        if parent == "proj_in" and grand in FF_MODULES:
            return P("model")
    return P()


def shard_dit_params(params, mesh: Mesh):
    """device_put a DiT param tree with TP sharding over mesh axis
    'model' (replicated over all other axes)."""
    def place(path, leaf):
        spec = dit_param_spec(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def dit_sharding_tree(params, mesh: Mesh):
    """The matching sharding pytree (for jit in_shardings/out_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, dit_param_spec(path, leaf)),
        params)


def _path_names(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)


def _zero_spec(leaf, mesh: Mesh) -> P:
    """ZeRO-style memory sharding for a mirror leaf the TP rules leave
    replicated: shard its largest dimension over every mesh axis. GSPMD
    inserts the gathers/scatters at the optimizer update; the forward
    compute layout is untouched because this is only applied to
    optimizer/EMA mirrors, never to the live params."""
    ndim = getattr(leaf, "ndim", 0) or 0
    shape = getattr(leaf, "shape", ())
    n_dev = 1
    for s in mesh.shape.values():
        n_dev *= s
    if ndim == 0 or max(shape) < n_dev:
        return P()
    dim = int(max(range(ndim), key=lambda i: shape[i]))
    if shape[dim] % n_dev != 0:
        # uneven NamedShardings are rejected by some placement paths on
        # real multi-host (device_put/make_array_from_process_local_data);
        # keep such leaves replicated rather than risk a runtime reject
        return P()
    spec = [None] * ndim
    spec[dim] = tuple(mesh.axis_names)
    return P(*spec)


def mirror_param_shardings(tree, params, mesh: Mesh,
                           spec_fn=dit_param_spec, zero: bool = False):
    """Sharding pytree for any state that *mirrors* the parameter tree.

    AdamW's mu/nu (and EMA shadow params) carry the param tree as a
    subtree of a larger structure (optax wrappers, counts, schedules).
    Each leaf whose flattened-path *suffix* equals a full parameter path
    gets that parameter's TP spec; with ``zero=True``, mirror leaves whose
    param is replicated get ZeRO-style largest-dim sharding over all mesh
    axes instead. Non-mirror leaves (counts, scalars) stay replicated.
    This is how the 1.6B optimizer/EMA state is scaled across chips --
    the reference needs nothing here because its models fit one GPU
    (SURVEY.md section 2.2).
    """
    param_specs = {
        _path_names(path): spec_fn(path, leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    plen = {len(k) for k in param_specs}

    def spec_for(path, leaf):
        names = _path_names(path)
        for n in sorted(plen, reverse=True):
            if len(names) >= n and names[-n:] in param_specs:
                spec = param_specs[names[-n:]]
                # guard against same-named leaves of different shape
                # (e.g. a scalar count living under a matching key)
                ndim = getattr(leaf, "ndim", None)
                if ndim is not None and ndim < len(spec):
                    continue
                if zero and not any(a is not None for a in spec):
                    return _zero_spec(leaf, mesh)
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), tree)


def train_state_sharding(state, mesh: Mesh, spec_fn=dit_param_spec,
                         zero_mirrors: bool = True):
    """Full TrainState sharding pytree: params via the TP rules, optimizer
    state and EMA via suffix matching (+ ZeRO sharding of replicated
    mirrors when ``zero_mirrors``), step replicated.

    On a mesh WITHOUT a 'model' axis (pure-ZeRO over DP, e.g.
    ``train_ar --zero`` on the default 1-D data mesh) the TP rules are
    inapplicable -- NamedSharding would reject their 'model' specs -- so
    params stay replicated and only the optimizer/EMA mirrors shard."""
    if "model" not in mesh.axis_names and spec_fn is dit_param_spec:
        spec_fn = lambda path, leaf: P()  # noqa: E731
    repl = NamedSharding(mesh, P())
    psh = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_fn(path, leaf)),
        state.params)
    opt_sh = mirror_param_shardings(state.opt_state, state.params, mesh,
                                    spec_fn, zero=zero_mirrors)
    ema_sh = None
    if getattr(state, "ema", None) is not None:
        ema_sh = type(state.ema)(
            params=mirror_param_shardings(state.ema.params, state.params,
                                          mesh, spec_fn, zero=zero_mirrors),
            step=repl)
    return type(state)(params=psh, opt_state=opt_sh, ema=ema_sh, step=repl)
