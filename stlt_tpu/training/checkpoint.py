"""Checkpointing.

Reference behavior (``src/train.py:144-152``): save the model state_dict when
validation improves (``evaluator.is_best()``), optionally the backbone
separately; no optimizer state, no resume. We keep that "deliverable
checkpoint" surface (flax msgpack instead of torch .pt) and ADD what the
reference lacks (SURVEY.md §5): Orbax step checkpoints with params + optimizer
state + step for crash-resume.

``load_params`` transparently accepts torch ``.pt``/``.pth`` files and runs
them through the converter, so the released reference checkpoints load
directly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_params(path: str, params: Any) -> None:
    """Write a msgpack params file.

    Multi-process safe: EVERY process must call this (the replication gather
    is a collective); only process 0 writes the file.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        params = multihost_utils.process_allgather(params, tiled=True)
    params = jax.device_get(params)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template: Any, *, strict: bool = True) -> Any:
    if path.endswith((".pt", ".pth")):
        from stlt_tpu.utils.convert import load_torch_state_dict, torch_to_flax_params

        return torch_to_flax_params(
            load_torch_state_dict(path), template, strict=strict
        )
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return _reconcile_shapes(restored, template)


def _reconcile_shapes(restored: Any, template: Any) -> Any:
    """Validate restored leaf shapes against the model's template.

    ``flax.serialization.from_bytes`` returns whatever shapes were stored —
    without this check a stale checkpoint surfaces as an opaque jit error.
    The one legal mismatch is the frame-position table, which is resampled
    (``convert.resize_position_table``) so checkpoints trained at one clip
    length load at another.
    """
    from flax import traverse_util

    from stlt_tpu.utils.convert import _is_position_table, resize_position_table

    flat = traverse_util.flatten_dict(serialization.to_state_dict(restored))
    flat_tmpl = traverse_util.flatten_dict(serialization.to_state_dict(template))
    out = {}
    for path, leaf in flat.items():
        got = np.asarray(leaf)
        expected = np.asarray(flat_tmpl[path]).shape
        if got.shape != tuple(expected):
            if _is_position_table(path, got.shape, expected):
                got = resize_position_table(got, expected[0])
            else:
                raise ValueError(
                    f"checkpoint shape mismatch at {'/'.join(path)}: "
                    f"stored {got.shape} vs model {tuple(expected)}"
                )
        out[path] = got
    restored_tree = traverse_util.unflatten_dict(out)
    return serialization.from_state_dict(template, restored_tree)


# --- Orbax step checkpoints (resume support; no reference counterpart) ------


def make_checkpoint_manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_train_state(manager, step: int, state) -> None:
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        # Orbax handles global (multi-host) arrays natively; each process
        # writes its own shards.
        manager.save(step, args=ocp.args.StandardSave(state))
        return
    manager.save(step, args=ocp.args.StandardSave(jax.device_get(state)))


def restore_train_state(manager, state_template) -> Optional[Any]:
    """Restore the latest step, or None if the directory is empty."""
    import orbax.checkpoint as ocp

    step = manager.latest_step()
    if step is None:
        return None
    target = (
        state_template
        if jax.process_count() > 1
        else jax.device_get(state_template)
    )
    return manager.restore(step, args=ocp.args.StandardRestore(target))
