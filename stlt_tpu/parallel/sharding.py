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
    """Sharding for an arbitrary pytree (optax state): PATH-SUFFIX matching.

    Optimizer states embed param-shaped subtrees (adamw's mu/nu, sgd's
    trace, ...) as nested dicts whose key paths end with the parameter's own
    path. For every leaf we take its trailing run of dict keys and look up
    the longest suffix that is a full parameter path; matches get the
    parameter's sharding, everything else (counts, schedule scalars,
    MaskedNodes) replicates.

    This is robust to the optax chain's structure — wrapping with masked /
    multi_transform / inject_hyperparams, adding transforms, or reordering
    the chain cannot silently replicate the moments the way the previous
    whole-tree structural-equality walk could (e.g. MaskedNode leaves used
    to break the equality and fall back to replicated)."""
    flat_params = traverse_util.flatten_dict(params_sharding_tree)
    replicated = NamedSharding(mesh, P())

    def leaf_sharding(path) -> NamedSharding:
        keys = []
        for entry in reversed(path):
            if isinstance(entry, jax.tree_util.DictKey):
                keys.append(str(entry.key))
            else:
                break
        suffix = tuple(reversed(keys))
        while suffix:
            if suffix in flat_params:
                return flat_params[suffix]
            suffix = suffix[1:]
        return replicated

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return jax.tree_util.tree_unflatten(
        treedef, [leaf_sharding(path) for path, _ in flat]
    )
