"""Train-step smoke across feature combinations.

The bf16 CACNF train bug (stem-conv backward, ec01a26) only surfaced in a
combination no test exercised: bf16 × appearance × TRAIN. This module runs
one real train step for the risky corners of
{model} × {dtype} × {pallas} × {remat} × {grad_accum} so a combination
can't silently rot. Tiny shapes; pallas runs in interpret mode on CPU.
"""

import jax
import numpy as np
import pytest

from __graft_entry__ import _synthetic_layout_batch
from stlt_tpu.configs import make_model_config
from stlt_tpu.models import models_factory
from stlt_tpu.parallel.mesh import make_mesh
from stlt_tpu.training.criterion import make_criterion
from stlt_tpu.training.loop import compile_steps, create_train_state
from stlt_tpu.training.optimizer import make_optimizer

B = 8


def _batch(with_video):
    batch = _synthetic_layout_batch(B, 5, 4, 4)
    batch["labels"] = batch["labels"] % 5
    batch["valid"] = np.ones(B, bool)
    if with_video:
        rng = np.random.default_rng(0)
        batch["video_frames"] = rng.normal(0, 1, (B, 4, 64, 64, 3)).astype(np.float32)
    return batch


def _one_step(name, *, dtype, use_pallas=False, remat=False, grad_accum=1,
              uint8_followup=False):
    cfg = make_model_config(
        name,
        num_classes=5,
        unique_categories=4,
        hidden_size=32,
        num_attention_heads=4,
        num_spatial_layers=1,
        num_temporal_layers=1,
        num_appearance_layers=1,
        num_fusion_layers=1,
        appearance_num_frames=4,
        resnet_model_path="unused",
        resnet_depth=10,
        compute_dtype=dtype,
        use_pallas=use_pallas,
        remat=remat,
    )
    model = models_factory[name](cfg)
    batch = _batch(with_video=name != "stlt")
    if name in ("resnet3d", "resnet3d-transformer"):
        batch = {k: batch[k] for k in ("video_frames", "labels", "valid")}
    inputs = {k: v for k, v in batch.items() if k not in ("labels", "valid")}
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    tx = make_optimizer(params, learning_rate=1e-3, weight_decay=1e-3,
                        clip_val=5.0, num_warmup_steps=1, num_training_steps=5)
    state = create_train_state(params, tx)
    steps = compile_steps(make_mesh(1), model, tx, make_criterion("something"),
                          state=state, grad_accum=grad_accum)
    state = jax.device_put(state, steps.state_sharding)
    state, loss = steps.train_step(state, batch, np.uint32(3))
    assert np.isfinite(float(loss)), (name, dtype, use_pallas, remat, grad_accum)
    if uint8_followup:
        # device-normalize path: same step with raw uint8 frames.
        batch["video_frames"] = (
            (batch["video_frames"] + 1) * 127.5
        ).astype(np.uint8)
        state, loss = steps.train_step(state, batch, np.uint32(4))
        assert np.isfinite(float(loss)), (name, dtype, "uint8")


@pytest.mark.parametrize("name", ["stlt", "resnet3d", "resnet3d-transformer",
                                  "lcf", "caf"])
def test_bf16_train_step(name):
    _one_step(name, dtype="bfloat16")


def test_bf16_cacnf_train_step_with_uint8_frames():
    """Regression for the stem-conv backward bug (ec01a26): bf16 appearance
    TRAIN failed while eval worked; includes the uint8 device-normalize
    path. (uint8_followup recompiles the step for the uint8 batch — expected.)"""
    _one_step("cacnf", dtype="bfloat16", uint8_followup=True)


def test_bf16_remat_pallas_train_step():
    _one_step("cacnf", dtype="bfloat16", use_pallas=True, remat=True)


def test_bf16_grad_accum_train_step():
    _one_step("cacnf", dtype="bfloat16", grad_accum=2)


def test_f32_pallas_remat_train_step():
    _one_step("lcf", dtype="float32", use_pallas=True, remat=True)


def test_bf16_fused_train_kernel_step():
    """Round-3 fused train path in the risky corner: {bf16 × pallas ×
    fused_proj_attention_train custom backward} through a REAL compiled
    train step, plus remat (the custom_vjp is replayed inside
    jax.checkpoint) and grad_accum (scanned microbatches re-trace it)."""
    _one_step("stlt", dtype="bfloat16", use_pallas=True, remat=True,
              grad_accum=2)


def test_live_prefix_bf16_pallas_ragged_train_step():
    """Round-5 live-prefix spatial fold in the risky corner: {bf16 × pallas
    × ragged lengths × spatial_live_capacity} through a REAL compiled train
    step with remat (the gather/scatter must replay inside jax.checkpoint)
    and grad_accum (scanned microbatches re-trace the capped fold)."""
    import dataclasses

    from stlt_tpu.ops.fused_encoder import live_prefix_capacity

    cfg = make_model_config(
        "stlt",
        num_classes=5,
        unique_categories=4,
        hidden_size=32,
        num_attention_heads=4,
        num_spatial_layers=1,
        num_temporal_layers=1,
        layout_num_frames=8,
        compute_dtype="bfloat16",
        use_pallas=True,
        remat=True,
    )
    batch = _synthetic_layout_batch(B, 8, 4, 4, length_range=(3, 5))
    batch["labels"] = batch["labels"] % 5
    batch["valid"] = np.ones(B, bool)
    ft = np.asarray(batch["frame_types"])
    cap = live_prefix_capacity(int((ft != 0).sum()), int(ft.size))
    assert cap is not None  # fill ~50% must land below the top bucket
    cfg = dataclasses.replace(cfg, spatial_live_capacity=cap)
    model = models_factory["stlt"](cfg)
    inputs = {k: v for k, v in batch.items() if k not in ("labels", "valid")}
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    tx = make_optimizer(params, learning_rate=1e-3, weight_decay=1e-3,
                        clip_val=5.0, num_warmup_steps=1, num_training_steps=5)
    state = create_train_state(params, tx)
    steps = compile_steps(make_mesh(1), model, tx, make_criterion("something"),
                          state=state, grad_accum=2)
    state = jax.device_put(state, steps.state_sharding)
    state, loss = steps.train_step(state, batch, np.uint32(9))
    assert np.isfinite(float(loss))


def test_long_context_bf16_pallas_train_step():
    """The round-3 train-path features in one combo: blockwise-dispatched
    length (513 frames) × bf16 × pallas × dropout — the KV-loop Pallas
    backward, in-kernel hashed dropout, and causal block skipping all run in
    a REAL compiled train step (this corner is exactly where an untested
    {feature × train} interaction would rot)."""
    cfg = make_model_config(
        "stlt",
        num_classes=5,
        unique_categories=4,
        hidden_size=32,
        num_attention_heads=4,
        num_spatial_layers=1,
        num_temporal_layers=1,
        layout_num_frames=513,
        compute_dtype="bfloat16",
        use_pallas=True,
    )
    model = models_factory["stlt"](cfg)
    batch = _synthetic_layout_batch(8, 513, 4, 4)  # 8 divides the CPU mesh
    batch["labels"] = batch["labels"] % 5
    batch["valid"] = np.ones(8, bool)
    inputs = {k: v for k, v in batch.items() if k not in ("labels", "valid")}
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    tx = make_optimizer(params, learning_rate=1e-3, weight_decay=1e-3,
                        clip_val=5.0, num_warmup_steps=1, num_training_steps=5)
    state = create_train_state(params, tx)
    steps = compile_steps(make_mesh(1), model, tx, make_criterion("something"),
                          state=state)
    state = jax.device_put(state, steps.state_sharding)
    state, loss = steps.train_step(state, batch, np.uint32(7))
    assert np.isfinite(float(loss))
    state, loss2 = steps.train_step(state, batch, np.uint32(7))
    assert np.isfinite(float(loss2)) and float(loss2) != float(loss)
