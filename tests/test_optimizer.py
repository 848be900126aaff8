"""Optimizer semantics: two-group weight decay, LR schedule, frozen params."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from stlt_tpu.training.optimizer import (
    frozen_backbone_mask,
    frozen_stats_mask,
    linear_warmup_decay,
    make_optimizer,
    weight_decay_mask,
)


def _params():
    return {
        "backbone": {
            "linear1": {"kernel": jnp.ones((4, 8)), "bias": jnp.ones((8,))},
            "bn1": {
                "scale": jnp.ones((4,)),
                "bias": jnp.zeros((4,)),
                "mean": jnp.zeros((4,)),
                "var": jnp.ones((4,)),
            },
        },
        "head": {"fc": {"kernel": jnp.ones((8, 2)), "bias": jnp.zeros((2,))}},
        "pos_embed": jnp.zeros((3, 1, 4)),
    }


def test_weight_decay_mask():
    mask = traverse_util.flatten_dict(weight_decay_mask(_params()))
    assert mask[("backbone", "linear1", "kernel")] is True
    assert mask[("backbone", "linear1", "bias")] is False  # 1-D / .bias
    assert mask[("head", "fc", "kernel")] is True
    # reference: only models declaring no_weight_decay() exempt these
    # (TransformerResnet standalone); by default 3-D pos_embed decays
    assert mask[("pos_embed",)] is True
    masked = traverse_util.flatten_dict(
        weight_decay_mask(_params(), no_decay_names=("pos_embed", "cls_token"))
    )
    assert masked[("pos_embed",)] is False


def test_frozen_masks():
    stats = traverse_util.flatten_dict(frozen_stats_mask(_params()))
    assert stats[("backbone", "bn1", "scale")] is False
    assert stats[("backbone", "bn1", "mean")] is False
    assert stats[("backbone", "linear1", "kernel")] is True
    bb = traverse_util.flatten_dict(frozen_backbone_mask(_params(), True))
    assert bb[("backbone", "linear1", "kernel")] is False
    assert bb[("head", "fc", "kernel")] is True


def test_schedule_warmup_then_linear_decay():
    sched = linear_warmup_decay(1e-3, num_warmup_steps=10, num_training_steps=110)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == np.float32(5e-4)
    assert float(sched(10)) == np.float32(1e-3)
    np.testing.assert_allclose(float(sched(60)), 5e-4, rtol=1e-6)
    assert float(sched(110)) == 0.0
    assert float(sched(200)) == 0.0  # clamped, never negative


def test_bn_params_never_update():
    params = _params()
    tx = make_optimizer(
        params, learning_rate=1e-2, weight_decay=1e-2, clip_val=1.0,
        num_warmup_steps=1, num_training_steps=10,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    # second step: past warmup, LR > 0
    updates, _ = tx.update(grads, state, params)
    flat = traverse_util.flatten_dict(updates)
    for leaf in ("scale", "bias", "mean", "var"):
        np.testing.assert_array_equal(flat[("backbone", "bn1", leaf)], 0.0)
    assert np.abs(flat[("backbone", "linear1", "kernel")]).max() > 0


def test_freeze_backbone_blocks_all_backbone_updates():
    params = _params()
    tx = make_optimizer(
        params, learning_rate=1e-2, weight_decay=1e-2, clip_val=1.0,
        num_warmup_steps=1, num_training_steps=10, freeze_backbone=True,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    updates, _ = tx.update(grads, state, params)
    flat = traverse_util.flatten_dict(updates)
    assert np.abs(flat[("backbone", "linear1", "kernel")]).max() == 0.0
    assert np.abs(flat[("head", "fc", "kernel")]).max() > 0


def test_model_declared_no_decay_is_honored():
    """train.py asks the MODEL for its no-decay set (reference hasattr
    semantics, train_inference_utils.py:44-46) — a hypothetical future model
    declaring no_weight_decay() must be honored without any name gate."""
    from stlt_tpu.training.optimizer import model_no_decay_names

    class DeclaringModel:
        @staticmethod
        def no_weight_decay():
            return {"my_special_table"}

    class PlainModel:
        pass

    assert model_no_decay_names(DeclaringModel()) == ("my_special_table",)
    assert model_no_decay_names(PlainModel()) == ()

    # The real declaring model in this codebase:
    from stlt_tpu.configs import AppearanceModelConfig
    from stlt_tpu.models import models_factory

    cfg = AppearanceModelConfig(
        num_classes=3, appearance_num_frames=1, resnet_model_path="unused",
    )
    names = model_no_decay_names(models_factory["resnet3d-transformer"](cfg))
    assert sorted(names) == ["cls_token", "pos_embed"]

    # ...and the set flows into the decay mask.
    params = {
        "my_special_table": np.zeros((2, 2), np.float32),
        "kernel": np.zeros((2, 2), np.float32),
    }
    mask = traverse_util.flatten_dict(
        weight_decay_mask(params, model_no_decay_names(DeclaringModel()))
    )
    assert mask[("my_special_table",)] is False
    assert mask[("kernel",)] is True
