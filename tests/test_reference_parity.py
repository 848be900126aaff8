"""AUTHORITATIVE parity: flax models vs the reference's OWN code.

Unlike tests/test_stlt_parity.py and tests/test_fusion_parity.py (which use
hand-retyped torch oracles in tests/torch_ref*.py), this module imports
``/root/reference/src`` directly and uses ``modelling.models.models_factory``
(reference models.py:552-559) as the oracle for all six factory models.
A transcription bug in the retyped oracles cannot hide here: the converter +
flax model must reproduce the genuine ``nn.TransformerEncoder`` (deep-copied
prototype layers), ``generate_square_subsequent_mask``
(reference model_utils.py:4-7), torch MHA mask conventions, and the real
frozen-BN R3D-50 (reference models.py:198-229) byte-for-byte semantics.

The appearance/fusion models require a real Kinetics-style checkpoint file
(reference models.py:201-204 torch.loads it unconditionally); a session-scoped
fixture fabricates one from ``modelling.resnets3d.generate_model(50,
n_classes=1139)`` with randomized BN statistics so frozen-BN math is
non-trivial.
"""

import sys

import numpy as np
import pytest
import torch

import jax

from tests.test_stlt_parity import synthetic_batch

REFERENCE_SRC = "/root/reference/src"


def _reference():
    """Import the reference's packages (modelling/, utils/) lazily."""
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import modelling.configs as ref_configs  # noqa: PLC0415
    import modelling.models as ref_models  # noqa: PLC0415

    return ref_configs, ref_models


# Small-but-real hyperparameters; the R3D-50 trunk is full size (the reference
# hardcodes depth 50 / 1139 classes, models.py:201).
HP = dict(
    num_classes=5,
    unique_categories=4,
    hidden_size=48,
    num_attention_heads=4,
    num_spatial_layers=2,
    num_temporal_layers=2,
    num_appearance_layers=2,
    num_fusion_layers=2,
    layout_num_frames=32,
    # 8×32×32 video → R3D-50 emits a single 1×1×1 token, so the pos_embed
    # table is appearance_num_frames + 1 = 2 rows.
    appearance_num_frames=1,
)
B, T, S = 2, 8, 32


@pytest.fixture(scope="module")
def r3d_checkpoint(tmp_path_factory):
    """Fabricate a Kinetics-style R3D-50 checkpoint (reference README.md:48
    format: {"state_dict": ...}) with randomized BN stats."""
    _, _ = _reference()
    from modelling.resnets3d import generate_model  # noqa: PLC0415

    torch.manual_seed(3)
    resnet = generate_model(model_depth=50, n_classes=1139)
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for m in resnet.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    path = tmp_path_factory.mktemp("ref_ckpt") / "r3d50_KMS_200ep.pth"
    torch.save({"state_dict": resnet.state_dict()}, path)
    return str(path)


def _torch_layout_batch(batch_np):
    """numpy batch → reference-collater-shaped torch batch (the masks the
    reference StltCollater adds, datasets.py:273-286)."""
    out = {}
    for k, v in batch_np.items():
        t = torch.from_numpy(v)
        if k in ("categories", "frame_types", "lengths", "labels"):
            t = t.long()
        out[k] = t
    out["src_key_padding_mask_boxes"] = out["categories"] == 0
    out["src_key_padding_mask_frames"] = out["frame_types"] == 0
    return out


def _randomize_zero_params(tmodel, seed=11):
    """cls_token/pos_embed are zero-init in the reference (models.py:248-250);
    randomize so their conversion is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if name.endswith(("cls_token", "pos_embed")):
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)


def _flax_outputs(name, cfg_kwargs, inputs, torch_model):
    from stlt_tpu.configs import model_configs_factory  # noqa: PLC0415
    from stlt_tpu.models import models_factory  # noqa: PLC0415
    from stlt_tpu.utils.convert import torch_to_flax_params  # noqa: PLC0415

    cfg = model_configs_factory[name](**cfg_kwargs)
    model = models_factory[name](cfg)
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = torch_to_flax_params(sd, params)
    return model, model.apply({"params": params}, inputs)


def _assert_match(jout, tout, logit_names, atol, label):
    assert set(jout) == set(tout), f"{label}: logit-name mismatch"
    assert tuple(jout) == tuple(logit_names)
    for key in tout:
        np.testing.assert_allclose(
            np.asarray(jout[key]),
            tout[key].numpy(),
            atol=atol,
            rtol=1e-4,
            err_msg=f"{label}:{key}",
        )


@pytest.mark.parametrize("with_scores", [False, True])
def test_reference_stlt(with_scores):
    ref_configs, ref_models = _reference()
    rng = np.random.default_rng(0)
    batch_np = synthetic_batch(rng, B=3, F=7, O=5, with_scores=with_scores)

    torch.manual_seed(0)
    tcfg = ref_configs.StltModelConfig(**{
        k: v for k, v in HP.items()
        if k not in ("num_appearance_layers", "num_fusion_layers", "appearance_num_frames")
    })
    tmodel = ref_models.models_factory["stlt"](tcfg)
    # NB: the reference's train() overrides return None (models.py:180-183),
    # so .eval() cannot be chained off the constructor.
    tmodel.eval()
    with torch.no_grad():
        tout = tmodel(_torch_layout_batch(batch_np))

    inputs = {k: v for k, v in batch_np.items() if k != "labels"}
    cfg_kwargs = {k: HP[k] for k in (
        "num_classes", "unique_categories", "hidden_size", "num_attention_heads",
        "num_spatial_layers", "num_temporal_layers", "layout_num_frames",
    )}
    _, jout = _flax_outputs("stlt", cfg_kwargs, inputs, tmodel)
    _assert_match(jout, tout, ("stlt",), 1e-4, "stlt")


def _video_np(seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (B, T, S, S, 3)).astype(np.float32)


def _appearance_cfgs(r3d_checkpoint, ref_configs):
    kwargs = dict(
        num_classes=HP["num_classes"],
        appearance_num_frames=HP["appearance_num_frames"],
        resnet_model_path=r3d_checkpoint,
        hidden_size=HP["hidden_size"],
        num_attention_heads=HP["num_attention_heads"],
        num_appearance_layers=HP["num_appearance_layers"],
    )
    return ref_configs.AppearanceModelConfig(**dict(kwargs)), kwargs


@pytest.mark.slow
@pytest.mark.parametrize("name", ["resnet3d", "resnet3d-transformer"])
def test_reference_appearance(name, r3d_checkpoint):
    ref_configs, ref_models = _reference()
    tcfg, cfg_kwargs = _appearance_cfgs(r3d_checkpoint, ref_configs)
    torch.manual_seed(5)
    tmodel = ref_models.models_factory[name](tcfg)
    _randomize_zero_params(tmodel)
    tmodel.eval()

    video = _video_np()
    tbatch = {"video_frames": torch.from_numpy(video).permute(0, 4, 1, 2, 3)}
    with torch.no_grad():
        tout = tmodel(tbatch)

    _, jout = _flax_outputs(name, cfg_kwargs, {"video_frames": video}, tmodel)
    _assert_match(jout, tout, ("resnet3d",), 1e-3, name)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,logit_names",
    [
        ("lcf", ("lcf",)),
        ("caf", ("caf",)),
        ("cacnf", ("stlt", "resnet3d", "caf", "ensemble")),
    ],
)
def test_reference_fusion(name, logit_names, r3d_checkpoint):
    ref_configs, ref_models = _reference()
    kwargs = dict(HP, resnet_model_path=r3d_checkpoint)
    tcfg = ref_configs.MultimodalModelConfig(**dict(kwargs))
    torch.manual_seed(9)
    tmodel = ref_models.models_factory[name](tcfg)
    _randomize_zero_params(tmodel)
    tmodel.eval()

    rng = np.random.default_rng(2)
    batch_np = synthetic_batch(rng, B=B, F=6, O=4)
    video = _video_np(seed=2)
    tbatch = _torch_layout_batch(batch_np)
    tbatch["video_frames"] = torch.from_numpy(video).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        tout = tmodel(tbatch)

    inputs = {k: v for k, v in batch_np.items() if k != "labels"}
    inputs["video_frames"] = video
    _, jout = _flax_outputs(name, kwargs, inputs, tmodel)
    _assert_match(jout, tout, logit_names, 1e-3, name)
