"""Device-mesh construction.

The reference is strictly single-device (``src/utils/train_inference_utils.py:8-18``);
this module is the TPU-native replacement: a named ``jax.sharding.Mesh`` with

- ``data``  — batch (DP) axis; gradient all-reduce is emitted by XLA,
- ``model`` — tensor-parallel (TP) axis for attention heads / FFN hidden.

Axes ride ICI inside a slice; multi-slice DCN meshes can be expressed by
passing an explicit device array. PP/EP are explicit non-goals (SURVEY.md
§2.6 — the models are ≤ ~120M params with no MoE).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
CONTEXT_AXIS = "context"  # sequence parallelism over the frame axis


def make_mesh(
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    batch_size: Optional[int] = None,
    context_parallel: int = 1,
) -> Mesh:
    """Mesh of shape (data, model, context) with
    data = n_devices // (model_parallel · context_parallel).

    If ``batch_size`` is given and doesn't divide the data axis, the data
    axis shrinks to the largest divisor of both so small/debug batch sizes
    still run — with a loud warning naming the idle devices (single-process
    only; multi-process refuses, since dropping devices would strand whole
    hosts' batch slices).

    Multi-process invariants (asserted): the ``model`` × ``context`` axes
    must fit inside one process's local devices (they ride ICI, never DCN),
    and every process must own whole data-rows — guaranteed by ``data``
    being the outermost axis over the process-sorted global device list.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    per_replica = model_parallel * context_parallel
    if n % per_replica != 0:
        raise ValueError(
            f"model_parallel={model_parallel} x context_parallel="
            f"{context_parallel} does not divide {n} devices"
        )
    multiprocess = jax.process_count() > 1
    if multiprocess and per_replica > jax.local_device_count():
        raise ValueError(
            f"model_parallel x context_parallel = {per_replica} exceeds the "
            f"{jax.local_device_count()} local devices per process; the "
            "model/context axes must not span hosts (DCN)"
        )
    data = n // per_replica
    if batch_size is not None:
        import math

        shrunk = math.gcd(data, batch_size)
        if shrunk != data:
            if multiprocess:
                raise ValueError(
                    f"batch_size={batch_size} does not divide the data axis "
                    f"({data}); in multi-process mode every device must be "
                    "used — raise batch_size or change the mesh"
                )
            logging.warning(
                "make_mesh: batch_size=%d shrinks the data axis %d -> %d; "
                "%d of %d devices will be IDLE",
                batch_size, data, shrunk, (data - shrunk) * per_replica, n,
            )
            data = shrunk
    grid = np.asarray(devices[: data * per_replica]).reshape(
        data, model_parallel, context_parallel
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS, CONTEXT_AXIS))


# --- active-mesh registry ----------------------------------------------------
# Ring attention (ops/ring.py) runs via shard_map and needs the concrete Mesh
# object; flax modules only carry configs. compile_steps registers the mesh it
# jits against; modules consult it and fall back to gather-based attention
# when no mesh (or no context axis) is active — e.g. during model.init.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_context_mesh() -> Optional[Mesh]:
    """The active mesh iff it has a >1 context axis (else None)."""
    mesh = _ACTIVE_MESH
    if mesh is not None and mesh.shape.get(CONTEXT_AXIS, 1) > 1:
        return mesh
    return None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis, everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def constrain_folded_rows(x):
    """Sharding constraint for [B·F, ...] arrays whose leading dim merged a
    data-sharded batch axis with a context-sharded frame axis.

    GSPMD does not reliably propagate the merged (data×context) tiling
    through the fold — measured at 516 frames / context=4, the spatial
    stage's saved activations stayed frame-replicated and per-device train
    memory scaled only 0.78× instead of ~1/C. One explicit constraint at the
    fold point pins the product sharding; no-op when no context mesh is
    active (single-device, eager init, or context_parallel=1)."""
    mesh = active_context_mesh()
    if mesh is None:
        return x
    spec = P((DATA_AXIS, CONTEXT_AXIS), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
