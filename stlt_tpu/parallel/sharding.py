"""Parameter partitioning rules (tensor parallelism).

Megatron-style sharding for the transformer stacks, expressed as
path-pattern → PartitionSpec rules consumed by GSPMD via ``NamedSharding``:

- q/k/v projection kernels ``[H, H]`` are column-sharded (heads split over
  ``model``), out-projection row-sharded — one all-reduce per attention block;
- FFN ``linear1`` column-sharded, ``linear2`` row-sharded — one all-reduce per
  FFN;
- embeddings, layer norms, heads and all biases of row-sharded layers are
  replicated.

XLA inserts the collectives; nothing here hand-writes communication
(SURVEY.md §2.6). With ``model_parallel=1`` every spec degenerates to
replicated and the whole thing is pure DP.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stlt_tpu.parallel.mesh import MODEL_AXIS

# (leaf-module name, param name) → spec builder
_COLUMN_PARALLEL = {"q_proj", "k_proj", "v_proj", "linear1", "fc1"}
_ROW_PARALLEL = {"out_proj", "linear2"}


def param_spec(path: tuple) -> P:
    """PartitionSpec for one flax param path."""
    if len(path) < 2:
        return P()
    module, leaf = path[-2], path[-1]
    if module in _COLUMN_PARALLEL:
        if leaf == "kernel":
            return P(None, MODEL_AXIS)
        if leaf == "bias":
            return P(MODEL_AXIS)
    if module in _ROW_PARALLEL and leaf == "kernel":
        return P(MODEL_AXIS, None)
    return P()


def params_partition_specs(params: Any) -> Any:
    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict({p: param_spec(p) for p in flat})


def params_shardings(mesh: Mesh, params: Any) -> Any:
    specs = params_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def tree_shardings_like(mesh: Mesh, tree: Any, params_sharding_tree: Any) -> Any:
    """Sharding for an arbitrary pytree (e.g. optax state): leaves that mirror
    a param (same path suffix is not reliable — match by array shape identity
    is also not reliable) — so we take the simple, correct route: optax states
    for adamw are pytrees *containing* param-shaped trees; we map any subtree
    that structurally equals the params tree to the params shardings, and
    replicate everything else."""
    params_struct = jax.tree_util.tree_structure(params_sharding_tree)

    def convert(node):
        try:
            if jax.tree_util.tree_structure(node) == params_struct:
                return params_sharding_tree
        except Exception:
            pass
        return None

    def walk(node):
        mapped = convert(node)
        if mapped is not None:
            return mapped
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            walked = [walk(v) for v in node]
            return type(node)(walked) if not hasattr(node, "_fields") else type(node)(*walked)
        return NamedSharding(mesh, P())

    return walk(tree)
