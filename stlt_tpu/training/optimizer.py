"""Optimizer + LR schedule.

Reference semantics reproduced with optax:

- AdamW with two parameter groups (``src/utils/train_inference_utils.py:37-54``):
  no weight decay for 1-D params, ``.bias``-suffixed params, and the model's
  ``no_weight_decay`` set (``pos_embed``/``cls_token`` of TransformerResnet,
  reference models.py:282-283);
- HF-style linear warmup→linear decay per-step schedule
  (``train_inference_utils.py:21-34``), ``num_batches = len(train) // batch_size``
  (reference train.py:105-110);
- global-norm gradient clipping at ``clip_val`` (reference train.py:129 uses
  ``clip_grad_norm_`` — torch scales by total norm, optax.clip_by_global_norm
  is the same operation);
- optional frozen-backbone masking (reference sets ``requires_grad=False``,
  models.py:170-176 — here a ``zero_grads`` mask on the ``backbone`` subtree).

torch AdamW defaults are kept: b1=0.9, b2=0.999, eps=1e-8.
"""

from __future__ import annotations

from typing import Any, Optional

import optax
from flax import traverse_util

def model_no_decay_names(model: Any) -> tuple:
    """The model's declared no-weight-decay parameter names.

    Reference semantics (``train_inference_utils.py:44-46``): honor
    ``model.no_weight_decay()`` iff the model declares it — asked of the
    model object, never inferred from its name. Only TransformerResnet
    declares the set in the reference (models.py:282-283); fusion models do
    NOT, so their pos_embed/cls_token DO decay."""
    fn = getattr(model, "no_weight_decay", None)
    return tuple(fn()) if callable(fn) else ()


def weight_decay_mask(params: Any, no_decay_names: tuple = ()) -> Any:
    """True where weight decay applies (mirrors add_weight_decay:
    no decay for 1-D params, .bias, and the model's no_weight_decay() set —
    which only TransformerResnet defines in the reference, so fusion models
    DO decay their pos_embed/cls_token, matching train_inference_utils.py:37-54)."""
    flat = traverse_util.flatten_dict(params)
    mask = {
        path: (getattr(leaf, "ndim", 0) > 1)
        and path[-1] != "bias"
        and path[-1] not in no_decay_names
        for path, leaf in flat.items()
    }
    return traverse_util.unflatten_dict(mask)


def frozen_backbone_mask(params: Any, frozen: bool) -> Any:
    """True where the param is trainable."""
    flat = traverse_util.flatten_dict(params)
    mask = {
        path: not (frozen and path and path[0] == "backbone") for path in flat
    }
    return traverse_util.unflatten_dict(mask)


def frozen_stats_mask(params: Any) -> Any:
    """True where the param is trainable; False for every param of a
    FrozenBatchNorm module (scale/bias/mean/var — identified by having
    'mean' + 'var' siblings). Reference semantics: BN affine params have
    requires_grad=False and BN stays in eval mode, so neither the affine
    params nor the running stats ever update (models.py:206-219)."""
    flat = traverse_util.flatten_dict(params)
    bn_modules = {
        path[:-1]
        for path in flat
        if path[-1] == "mean" and path[:-1] + ("var",) in flat
    }
    mask = {path: path[:-1] not in bn_modules for path in flat}
    return traverse_util.unflatten_dict(mask)


def _and_masks(a: Any, b: Any) -> Any:
    import jax

    return jax.tree_util.tree_map(lambda x, y: x and y, a, b)


def linear_warmup_decay(
    learning_rate: float, num_warmup_steps: int, num_training_steps: int
):
    """HF get_linear_schedule_with_warmup as an optax schedule."""

    def schedule(step):
        import jax.numpy as jnp  # local: keep module importable without jax init

        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        decay = (num_training_steps - step) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps
        )
        factor = jnp.where(step < num_warmup_steps, warmup, jnp.maximum(0.0, decay))
        return learning_rate * factor

    return schedule


def make_optimizer(
    params: Any,
    *,
    learning_rate: float,
    weight_decay: float,
    clip_val: float,
    num_warmup_steps: int,
    num_training_steps: int,
    freeze_backbone: bool = False,
    no_decay_names: tuple = (),
) -> optax.GradientTransformation:
    schedule = linear_warmup_decay(learning_rate, num_warmup_steps, num_training_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_val),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
            mask=weight_decay_mask(params, no_decay_names),
        ),
    )
    # Frozen params receive zero updates entirely (the torch analogue:
    # requires_grad=False params are invisible to the optimizer AND to
    # clip_grad_norm_, since their grads are None). BatchNorm scale/bias/
    # mean/var are ALWAYS frozen (reference models.py:206-219).
    # NOTE: optax.masked passes masked-out leaves through unchanged, so use
    # multi_transform with set_to_zero for the frozen partition.
    trainable = frozen_stats_mask(params)
    if freeze_backbone:
        trainable = _and_masks(trainable, frozen_backbone_mask(params, True))
    import jax

    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", trainable
    )
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )
