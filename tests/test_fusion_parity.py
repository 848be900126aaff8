"""Numeric parity: flax LCF / CAF / CACNF vs PyTorch (+ converter).

Covers the fusion quirks: shared bidirectional cross-attention, the
appearance_ffn-is-self-attention asymmetry, pooled-state snapshots, and the
ensemble head.
"""

import jax
import numpy as np
import pytest
import torch

from stlt_tpu.configs import MultimodalModelConfig
from stlt_tpu.models import models_factory
from tests.test_stlt_parity import synthetic_batch
from tests.torch_ref import TorchCACNF, TorchCAF, TorchLCF, torch_batch_from_numpy


def _cfg():
    return MultimodalModelConfig(
        num_classes=5,
        unique_categories=4,
        hidden_size=48,
        num_attention_heads=4,
        num_spatial_layers=1,
        num_temporal_layers=1,
        num_fusion_layers=2,
        num_appearance_layers=1,
        layout_num_frames=32,
        appearance_num_frames=1,  # R3D on 8×32×32 input → 1 token
        resnet_model_path="unused",
    )


def _mm_batch(seed=0):
    rng = np.random.default_rng(seed)
    batch = synthetic_batch(rng, B=2, F=6, O=4)
    batch["video_frames"] = rng.normal(0, 1, (2, 8, 32, 32, 3)).astype(np.float32)
    return batch


def _torch_mm_batch(batch_np):
    tb = torch_batch_from_numpy({k: v for k, v in batch_np.items() if k != "video_frames"})
    tb["video_frames"] = torch.from_numpy(batch_np["video_frames"]).permute(0, 4, 1, 2, 3)
    return tb


def _randomize(tmodel, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
        for name, p in tmodel.named_parameters():
            if name.endswith(("cls_token", "pos_embed")):
                p.normal_(0, 0.02)


@pytest.mark.parametrize(
    "name,torch_cls",
    [("lcf", TorchLCF), ("caf", TorchCAF), ("cacnf", TorchCACNF)],
)
def test_fusion_parity(name, torch_cls):
    from stlt_tpu.utils.convert import torch_to_flax_params

    cfg = _cfg()
    torch.manual_seed(7)
    tmodel = torch_cls(cfg)
    _randomize(tmodel, seed=7)
    tmodel.eval()
    batch_np = _mm_batch()
    with torch.no_grad():
        tout = tmodel(_torch_mm_batch(batch_np))

    model = models_factory[name](cfg)
    inputs = {k: v for k, v in batch_np.items() if k != "labels"}
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = torch_to_flax_params(sd, params)
    jout = model.apply({"params": params}, inputs)

    assert set(jout) == set(tout)
    assert tuple(jout) == tuple(model.logit_names)
    for key in tout:
        np.testing.assert_allclose(
            np.asarray(jout[key]), tout[key].numpy(), atol=1e-3, rtol=1e-4,
            err_msg=f"{name}:{key}",
        )
