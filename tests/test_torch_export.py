"""Reverse converter: flax params → reference-loadable torch checkpoints.

``flax_to_torch_state_dict`` must be the exact inverse of the load-path
converter AND produce a state_dict the reference's own models accept with
``load_state_dict(strict=True)`` (reference ``inference.py:59-69`` load
surface) — including the dead prototype layer (models.py:46-54), the
``position_ids`` buffer (models.py:94-96), Sequential-wrapped R3D numbering
(models.py:205) and BN ``num_batches_tracked`` buffers.
"""

import sys

import numpy as np
import pytest
import torch

import jax

from stlt_tpu.configs import StltModelConfig, model_configs_factory
from stlt_tpu.models import models_factory
from stlt_tpu.utils.convert import (
    flax_to_torch_state_dict,
    save_torch_checkpoint,
    torch_to_flax_params,
)
from tests.test_reference_parity import (
    HP,
    _reference,
    _torch_layout_batch,
    _video_np,
    r3d_checkpoint,  # noqa: F401  (fixture)
)
from tests.test_stlt_parity import synthetic_batch

STLT_KW = dict(
    num_classes=5, unique_categories=4, hidden_size=48, num_attention_heads=4,
    num_spatial_layers=2, num_temporal_layers=2, layout_num_frames=32,
)


def _flax_stlt(with_scores=True):
    rng = np.random.default_rng(0)
    batch_np = synthetic_batch(rng, B=3, F=7, O=5, with_scores=with_scores)
    inputs = {k: v for k, v in batch_np.items() if k != "labels"}
    model = models_factory["stlt"](StltModelConfig(**STLT_KW))
    params = model.init(jax.random.PRNGKey(1), inputs)["params"]
    return model, params, batch_np, inputs


def _as_torch(sd_np):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}


def test_roundtrip_is_identity():
    _, params, _, _ = _flax_stlt()
    sd = flax_to_torch_state_dict(params)
    back = torch_to_flax_params(sd, params)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
        )


def test_export_stlt_loads_strict_and_matches():
    ref_configs, ref_models = _reference()
    model, params, batch_np, inputs = _flax_stlt(with_scores=True)
    jout = model.apply({"params": params}, inputs)["stlt"]

    tmodel = ref_models.models_factory["stlt"](ref_configs.StltModelConfig(**STLT_KW))
    tmodel.load_state_dict(_as_torch(flax_to_torch_state_dict(params)), strict=True)
    tmodel.eval()
    with torch.no_grad():
        tout = tmodel(_torch_layout_batch(batch_np))["stlt"].numpy()
    np.testing.assert_allclose(np.asarray(jout), tout, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,logit_names",
    [
        ("lcf", ("lcf",)),
        ("caf", ("caf",)),
        ("cacnf", ("stlt", "resnet3d", "caf", "ensemble")),
    ],
)
def test_export_fusion_loads_strict_and_matches(name, logit_names, r3d_checkpoint):  # noqa: F811
    ref_configs, ref_models = _reference()
    kwargs = dict(HP, resnet_model_path=r3d_checkpoint)

    rng = np.random.default_rng(2)
    batch_np = synthetic_batch(rng, B=2, F=6, O=4)
    video = _video_np(seed=2)
    inputs = {k: v for k, v in batch_np.items() if k != "labels"}
    inputs["video_frames"] = video

    cfg = model_configs_factory[name](**kwargs)
    model = models_factory[name](cfg)
    params = model.init(jax.random.PRNGKey(4), inputs)["params"]
    jout = model.apply({"params": params}, inputs)

    tmodel = ref_models.models_factory[name](
        ref_configs.MultimodalModelConfig(**dict(kwargs))
    )
    tmodel.load_state_dict(_as_torch(flax_to_torch_state_dict(params)), strict=True)
    tmodel.eval()
    tbatch = _torch_layout_batch(batch_np)
    tbatch["video_frames"] = torch.from_numpy(video).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        tout = tmodel(tbatch)
    for key in logit_names:
        np.testing.assert_allclose(
            np.asarray(jout[key]), tout[key].numpy(), atol=1e-3, rtol=1e-3,
            err_msg=key,
        )


@pytest.mark.slow
@pytest.mark.parametrize("name", ["resnet3d", "resnet3d-transformer"])
def test_export_standalone_appearance_loads_strict(name, r3d_checkpoint):  # noqa: F811
    # Regression: the resnet.classifier zero-fill must key off the model's
    # OWN classifier rows when no fusion head (fc2) exists in the tree.
    ref_configs, ref_models = _reference()
    kwargs = dict(
        num_classes=HP["num_classes"],
        appearance_num_frames=HP["appearance_num_frames"],
        resnet_model_path=r3d_checkpoint,
        hidden_size=HP["hidden_size"],
        num_attention_heads=HP["num_attention_heads"],
        num_appearance_layers=HP["num_appearance_layers"],
    )
    video = _video_np(seed=3)
    inputs = {"video_frames": video}
    cfg = model_configs_factory[name](**kwargs)
    model = models_factory[name](cfg)
    params = model.init(jax.random.PRNGKey(6), inputs)["params"]
    jout = model.apply({"params": params}, inputs)["resnet3d"]

    tmodel = ref_models.models_factory[name](
        ref_configs.AppearanceModelConfig(**dict(kwargs))
    )
    tmodel.load_state_dict(_as_torch(flax_to_torch_state_dict(params)), strict=True)
    tmodel.eval()
    with torch.no_grad():
        tout = tmodel(
            {"video_frames": torch.from_numpy(video).permute(0, 4, 1, 2, 3)}
        )["resnet3d"].numpy()
    np.testing.assert_allclose(np.asarray(jout), tout, atol=1e-3, rtol=1e-3)


def test_export_cli_tool(tmp_path):
    from flax import serialization

    from tools.export_torch_checkpoint import main

    _, params, _, _ = _flax_stlt()
    msgpack = tmp_path / "best.msgpack"
    msgpack.write_bytes(serialization.to_bytes(params))
    out = tmp_path / "best.pt"
    main(["--checkpoint_path", str(msgpack), "--output_path", str(out)])
    sd = torch.load(out, map_location="cpu", weights_only=True)
    assert "backbone.frames_embeddings.position_ids" in sd
    want = flax_to_torch_state_dict(params)
    assert set(sd) == set(want)
    np.testing.assert_array_equal(
        sd["prediction_head.fc1.weight"].numpy(), want["prediction_head.fc1.weight"]
    )


def test_save_torch_checkpoint_roundtrips_through_load_params(tmp_path):
    from stlt_tpu.training.checkpoint import load_params

    _, params, _, _ = _flax_stlt()
    path = str(tmp_path / "export.pt")
    save_torch_checkpoint(path, params)
    back = load_params(path, params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
