"""Multi-host (multi-process) runtime.

The reference is strictly single-process, single-device
(``src/utils/train_inference_utils.py:8-18``); this module is the greenfield
multi-controller layer (SURVEY.md §2.6, "Device mesh & runtime" row: DCN /
multi-slice):

- ``maybe_initialize`` — ``jax.distributed.initialize`` behind CLI flags
  (TPU pods auto-discover; CPU testing uses the gloo collectives backend).
- ``process_row_span`` — the contiguous range of GLOBAL batch rows this
  process is responsible for producing, derived from the batch sharding
  (never assumed from ``process_index`` arithmetic).
- ``make_global_batch`` — assembles global ``jax.Array``s from each
  process's local rows via ``jax.make_array_from_process_local_data``.

Design constraints (asserted, not silently broken): the ``data`` mesh axis is
outermost, so processes own whole data-rows; the ``model`` × ``context`` axes
must fit inside one process's devices (they ride ICI, never DCN).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax


def maybe_initialize(args) -> bool:
    """Initialize the distributed runtime if the CLI asked for it.

    Returns True when running multi-process. Must be called before any
    device/backend query. ``--num_processes 0`` (the default) means
    single-process; ``--coordinator_address`` alone triggers auto-discovery
    initialization (TPU pod environments).
    """
    num_processes = getattr(args, "num_processes", 0) or 0
    coordinator = getattr(args, "coordinator_address", None)
    if num_processes <= 1 and not coordinator:
        return False
    if getattr(args, "platform", None) == "cpu":
        # CPU cross-process collectives need an explicit backend; gloo is
        # bundled with jaxlib and needs no external launcher.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes > 1:
        kwargs["num_processes"] = num_processes
        kwargs["process_id"] = getattr(args, "process_id", 0)
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def process_row_span(sharding, global_batch_size: int) -> Tuple[int, int]:
    """[start, stop) of global batch rows addressable by this process.

    Computed from the sharding's device→index map so it stays correct for
    any mesh layout; raises if this process's rows are not one contiguous
    block (which would mean the data axis interleaves processes — a layout
    we refuse because host-side batch assembly then needs scatter, and DP
    gradient all-reduce would ride DCN per-step).
    """
    imap = sharding.devices_indices_map((global_batch_size,))
    spans = sorted(
        {
            (idx[0].start or 0, global_batch_size if idx[0].stop is None else idx[0].stop)
            for device, idx in imap.items()
            if device.process_index == jax.process_index()
        }
    )
    if not spans:
        raise ValueError("this process holds no batch rows — shrink num_processes "
                         "or grow batch_size/data axis")
    start, stop = spans[0][0], spans[-1][1]
    cursor = start
    for lo, hi in spans:
        if lo > cursor:
            raise ValueError(f"non-contiguous batch rows for process "
                             f"{jax.process_index()}: {spans}")
        cursor = max(cursor, hi)
    assert cursor == stop
    return start, stop


def make_global_batch(
    batch: Dict[str, Any],
    shardings: Dict[str, Any],
    global_batch_size: int,
) -> Dict[str, Any]:
    """Process-local rows → global jax.Arrays (one per batch key).

    Non-batch dims must be fully present locally (the model/context axes sit
    inside one process — asserted at mesh construction).
    """
    out = {}
    for key, value in batch.items():
        if key not in shardings:
            out[key] = value
            continue
        global_shape = (global_batch_size,) + tuple(value.shape[1:])
        out[key] = jax.make_array_from_process_local_data(
            shardings[key], value, global_shape
        )
    return out


def put_tree(tree: Any, shardings: Any) -> Any:
    """``jax.device_put`` a pytree onto (possibly multi-host) shardings.

    Single-process: plain device_put. Multi-process: ``jax.device_put``
    refuses shardings spanning non-addressable devices, but every leaf here
    is process-identical AND every process addresses all distinct shards
    (the model/context axes are intra-process; the data axis only
    replicates parameters), so ``make_array_from_process_local_data`` with
    the full local value is exact.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    import numpy as np

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(s, x, x.shape)

    return jax.tree.map(put, tree, shardings)


def is_coordinator() -> bool:
    return jax.process_index() == 0
