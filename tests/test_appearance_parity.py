"""Numeric parity: flax R3D-50 appearance branch vs PyTorch.

Validates frozen-BN semantics, conv/maxpool padding, the Sequential-rename in
the converter, token ordering, and the torch-default (relu/0.1/1e-5) encoder.
"""

import jax
import numpy as np
import pytest
import torch

from stlt_tpu.configs import AppearanceModelConfig
from stlt_tpu.models.appearance import Resnet3D, TransformerResnet
from stlt_tpu.utils.convert import torch_to_flax_params
from tests.torch_ref_appearance import TorchResnet3D, TorchTransformerResnet

# Small input (T=8, 32px) keeps the 1-core CPU runtime tolerable while still
# exercising every stage of the R3D-50.
B, T, S = 2, 8, 32


def _cfg(num_classes=5):
    return AppearanceModelConfig(
        num_classes=num_classes,
        appearance_num_frames=T,
        resnet_model_path="unused",
        hidden_size=48,
        num_attention_heads=4,
        num_appearance_layers=2,
    )


def _video_batch(seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.normal(0, 1, (B, T, S, S, 3)).astype(np.float32)
    return {"video_frames": frames}


def _randomize_bn_stats(tmodel, seed=0):
    """Torch inits BN stats to (0,1); randomize so frozen-BN math is tested."""
    g = torch.Generator().manual_seed(seed)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.slow
def test_resnet3d_standalone_parity():
    cfg = _cfg()
    torch.manual_seed(0)
    tmodel = TorchResnet3D(cfg.num_classes)
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    tmodel.eval()
    batch = _video_batch()
    tbatch = {"video_frames": torch.from_numpy(batch["video_frames"]).permute(0, 4, 1, 2, 3)}
    with torch.no_grad():
        tlogits = tmodel(tbatch)["resnet3d"].numpy()

    model = Resnet3D(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = torch_to_flax_params(sd, params)
    jlogits = np.asarray(model.apply({"params": params}, batch)["resnet3d"])
    np.testing.assert_allclose(jlogits, tlogits, atol=5e-4, rtol=1e-4)


@pytest.mark.slow
def test_transformer_resnet_parity():
    # pos_embed table must match token count: with T=8, 32px → T'=2? No:
    # conv1 stride 1 in t → maxpool/2 → 4 → layer2/2 → 2 → layer3/2 → 1 →
    # layer4/2 → 1; spatial 32→16→8→4→2→1 ⇒ S_tokens = 1·1·1 = 1.
    # appearance_num_frames must equal S_tokens for the torch broadcast,
    # so configure it accordingly.
    tokens = 1
    cfg = AppearanceModelConfig(
        num_classes=5,
        appearance_num_frames=tokens,
        resnet_model_path="unused",
        hidden_size=48,
        num_attention_heads=4,
        num_appearance_layers=2,
    )
    torch.manual_seed(1)
    tmodel = TorchTransformerResnet(cfg)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=1)
        tmodel.pos_embed.normal_(0, 0.02)
        tmodel.cls_token.normal_(0, 0.02)
    tmodel.eval()
    batch = _video_batch(seed=1)
    tbatch = {"video_frames": torch.from_numpy(batch["video_frames"]).permute(0, 4, 1, 2, 3)}
    with torch.no_grad():
        tlogits = tmodel(tbatch)["resnet3d"].numpy()

    model = TransformerResnet(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = torch_to_flax_params(sd, params)
    jlogits = np.asarray(model.apply({"params": params}, batch)["resnet3d"])
    np.testing.assert_allclose(jlogits, tlogits, atol=5e-4, rtol=1e-4)


def test_stem_conv_s2d_equivalence():
    """Space-to-depth stem must match the plain convolution exactly, and
    fall back for odd spatial sizes."""
    import jax.numpy as jnp

    from stlt_tpu.models.resnet3d import StemConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 5, 32, 32, 3)), jnp.float32)
    stem = StemConv(conv1_t_size=7, conv1_t_stride=1, dtype=jnp.float32)
    params = stem.init(jax.random.PRNGKey(0), x)["params"]
    assert params["kernel"].shape == (7, 7, 7, 3, 64)  # layout unchanged
    got = stem.apply({"params": params}, x)
    ref = jax.lax.conv_general_dilated(
        x, params["kernel"], window_strides=(1, 2, 2),
        padding=((3, 3), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    x_odd = jnp.asarray(rng.normal(0, 1, (1, 5, 31, 31, 3)), jnp.float32)
    ref_odd = jax.lax.conv_general_dilated(
        x_odd, params["kernel"], window_strides=(1, 2, 2),
        padding=((3, 3), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got_odd = stem.apply({"params": params}, x_odd)
    np.testing.assert_allclose(np.asarray(got_odd), np.asarray(ref_odd), atol=2e-6)
