"""Numeric parity: flax STLT + converter vs genuine PyTorch semantics.

Builds a randomly-initialized torch STLT (tests/torch_ref.py — same module
tree as the reference), converts its state_dict with
``stlt_tpu.utils.convert``, and asserts the flax logits match the torch
logits on a fixed batch. This validates post-LN ordering, mask conventions,
GELU flavor, CLS pooling, and the converter in one shot.
"""

import jax
import numpy as np
import pytest
import torch

from stlt_tpu.configs import StltModelConfig
from stlt_tpu.models.stlt import Stlt
from stlt_tpu.utils.convert import torch_to_flax_params
from tests.torch_ref import TorchStlt, torch_batch_from_numpy


def small_config(**kw):
    defaults = dict(
        num_classes=11,
        unique_categories=4,
        hidden_size=48,
        num_attention_heads=4,
        num_spatial_layers=2,
        num_temporal_layers=2,
        layout_num_frames=32,
        hidden_dropout_prob=0.1,  # irrelevant in eval
    )
    defaults.update(kw)
    return StltModelConfig(**defaults)


def synthetic_batch(rng, B=3, F=7, O=5, num_categories=4, with_scores=False):
    categories = np.zeros((B, F, O), dtype=np.int32)
    boxes = np.zeros((B, F, O, 4), dtype=np.float32)
    scores = np.zeros((B, F, O), dtype=np.float32)
    frame_types = np.zeros((B, F), dtype=np.int32)
    lengths = np.zeros((B,), dtype=np.int32)
    for b in range(B):
        n_real = int(rng.integers(2, F))  # frames incl. extract slot varies
        lengths[b] = n_real + 1
        for f in range(F):
            categories[b, f, 0] = 3  # cls
            boxes[b, f, 0] = (0, 0, 1, 1)
            scores[b, f, 0] = 1.0
            if f < n_real:
                frame_types[b, f] = 2
                n_obj = int(rng.integers(0, O - 1))
                for o in range(1, 1 + n_obj):
                    categories[b, f, o] = int(rng.integers(1, num_categories - 1))
                    x1, y1 = rng.uniform(0, 0.5, 2)
                    boxes[b, f, o] = (x1, y1, x1 + rng.uniform(0.1, 0.5), y1 + rng.uniform(0.1, 0.5))
                    scores[b, f, o] = rng.uniform(0.5, 1.0)
            elif f == n_real:
                frame_types[b, f] = 4  # extract
            # else: pad frame (type 0) with CLS only
    batch = {
        "categories": categories,
        "boxes": boxes,
        "frame_types": frame_types,
        "lengths": lengths,
        "labels": rng.integers(0, 11, size=B).astype(np.int32),
    }
    if with_scores:
        batch["scores"] = scores
    return batch


@pytest.mark.parametrize("with_scores", [False, True])
def test_stlt_logits_match_torch(with_scores):
    cfg = small_config()
    rng = np.random.default_rng(0)
    batch_np = synthetic_batch(rng, with_scores=with_scores)

    torch.manual_seed(0)
    tmodel = TorchStlt(cfg).eval()
    with torch.no_grad():
        tlogits = tmodel(torch_batch_from_numpy(batch_np))["stlt"].numpy()

    jbatch = {k: v for k, v in batch_np.items() if k != "labels"}
    model = Stlt(cfg)
    params = model.init(jax.random.PRNGKey(0), jbatch)["params"]
    state_dict = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = torch_to_flax_params(state_dict, params)
    jlogits = np.asarray(model.apply({"params": params}, jbatch)["stlt"])

    assert jlogits.shape == tlogits.shape
    np.testing.assert_allclose(jlogits, tlogits, atol=2e-5, rtol=1e-5)


def test_converter_rejects_shape_mismatch():
    cfg = small_config()
    rng = np.random.default_rng(1)
    batch_np = synthetic_batch(rng)
    jbatch = {k: v for k, v in batch_np.items() if k != "labels"}
    model = Stlt(cfg)
    params = model.init(jax.random.PRNGKey(0), jbatch)["params"]
    tmodel = TorchStlt(small_config(hidden_size=64))
    state_dict = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    with pytest.raises(ValueError):
        torch_to_flax_params(state_dict, params)


def test_pad_frames_do_not_affect_logits():
    """Static padding must be semantically inert: adding more pad frames
    (mask-carrying) must not change the pooled logits."""
    cfg = small_config()
    rng = np.random.default_rng(2)
    batch_np = synthetic_batch(rng, F=6)
    model = Stlt(cfg)
    jbatch = {k: v for k, v in batch_np.items() if k != "labels"}
    params = model.init(jax.random.PRNGKey(0), jbatch)["params"]
    out_small = np.asarray(model.apply({"params": params}, jbatch)["stlt"])

    # widen frame axis by 3 pad frames (CLS-carrying, type 0)
    B, F, O = batch_np["categories"].shape
    wide = {k: v for k, v in jbatch.items()}
    pad_cat = np.zeros((B, 3, O), np.int32)
    pad_cat[:, :, 0] = 3
    pad_box = np.zeros((B, 3, O, 4), np.float32)
    pad_box[:, :, 0] = (0, 0, 1, 1)
    wide["categories"] = np.concatenate([jbatch["categories"], pad_cat], 1)
    wide["boxes"] = np.concatenate([jbatch["boxes"], pad_box], 1)
    wide["frame_types"] = np.concatenate(
        [jbatch["frame_types"], np.zeros((B, 3), np.int32)], 1
    )
    out_wide = np.asarray(model.apply({"params": params}, wide)["stlt"])
    np.testing.assert_allclose(out_small, out_wide, atol=1e-5, rtol=1e-5)
