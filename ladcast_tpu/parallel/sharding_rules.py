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
