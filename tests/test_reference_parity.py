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


# ---------------------------------------------------------------------------
# TRAINING-DYNAMICS parity: our fused train step vs the reference's OWN loop.
#
# The oracle is the genuine update chain of reference src/train.py:115-135 —
# its Criterion / add_weight_decay / torch AdamW / HF warmup-decay LambdaLR /
# clip_grad_norm_ imported from /root/reference/src — run for several steps
# on identical weights and batches (dropout off). A transposed beta, an
# eps-inside-sqrt difference, a decay-mask slip, or a schedule off-by-one in
# training/optimizer.py fails these (the off-by-one case is asserted
# explicitly below).
# ---------------------------------------------------------------------------

# Big-ish LR so one schedule step of difference moves params far beyond the
# comparison tolerance; clip_val small enough that clipping ACTIVATES (the
# tests assert it does, so the clip math is genuinely exercised).
TRAIN_HP = dict(lr=1e-3, weight_decay=0.1, clip_val=0.01, warmup=2, total=8, steps=4)


def _torch_reference_training(tmodel, tbatch, dataset_name, *, hp=TRAIN_HP):
    """Run the reference's exact update chain; returns per-step losses and
    asserts grad clipping engaged."""
    from torch import optim  # noqa: PLC0415
    from utils.train_inference_utils import (  # noqa: PLC0415
        Criterion,
        add_weight_decay,
        get_linear_schedule_with_warmup,
    )

    criterion = Criterion(dataset_name)
    parameters = add_weight_decay(tmodel, hp["weight_decay"])
    optimizer = optim.AdamW(parameters, lr=hp["lr"])
    scheduler = get_linear_schedule_with_warmup(
        optimizer, num_warmup_steps=hp["warmup"], num_training_steps=hp["total"]
    )
    tmodel.train(True)
    losses, clipped = [], False
    for _ in range(hp["steps"]):
        optimizer.zero_grad()
        logits = tmodel(tbatch)
        loss = criterion(logits, tbatch["labels"])
        loss.backward()
        total_norm = torch.nn.utils.clip_grad_norm_(
            tmodel.parameters(), hp["clip_val"]
        )
        clipped = clipped or float(total_norm) > hp["clip_val"]
        optimizer.step()
        scheduler.step()
        losses.append(float(loss))
    assert clipped, "clip_val never engaged; the test would not cover clipping"
    return losses


def _flax_training(model, params, batch_np, dataset_name, *, hp=TRAIN_HP,
                   warmup_offset=0):
    """Run our fused train step (training/loop.py) for the same trajectory."""
    from stlt_tpu.training.criterion import make_criterion  # noqa: PLC0415
    from stlt_tpu.training.loop import (  # noqa: PLC0415
        create_train_state,
        make_train_step,
    )
    from stlt_tpu.training.optimizer import (  # noqa: PLC0415
        make_optimizer,
        model_no_decay_names,
    )

    tx = make_optimizer(
        params,
        learning_rate=hp["lr"],
        weight_decay=hp["weight_decay"],
        clip_val=hp["clip_val"],
        num_warmup_steps=hp["warmup"] + warmup_offset,
        num_training_steps=hp["total"],
        no_decay_names=model_no_decay_names(model),
    )
    state = create_train_state(params, tx)
    train_step = make_train_step(model, tx, make_criterion(dataset_name))
    losses = []
    for _ in range(hp["steps"]):
        state, loss = train_step(state, batch_np, np.uint32(7))
        losses.append(float(loss))
    return state, losses


def _flat_numpy(tree):
    from flax import traverse_util  # noqa: PLC0415

    return {
        "/".join(k): np.asarray(v)
        for k, v in traverse_util.flatten_dict(tree).items()
    }


def _assert_params_match(jparams, tmodel, template, atol, label,
                         allowed_frac=0.0):
    """Updated torch params (converted) vs updated flax params.

    ``allowed_frac`` > 0 tolerates a tiny fraction of per-element violations
    (bounded at 10×atol) — needed for the conv-heavy fusion trunk, where f32
    reduction-order differences between torch and XLA convs meet AdamW's
    m/sqrt(v) on near-zero gradients and flip isolated elements by ~0.3×lr.
    An actual optimizer/schedule slip moves MOST elements of MOST params
    (verified by the warmup-offset sensitivity assert), so the fraction gate
    stays a sharp discriminator."""
    from stlt_tpu.utils.convert import torch_to_flax_params  # noqa: PLC0415

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    expected = _flat_numpy(torch_to_flax_params(sd, template))
    got = _flat_numpy(jparams)
    assert set(expected) == set(got)
    for key in sorted(expected):
        g, e = got[key], expected[key]
        if allowed_frac == 0.0:
            np.testing.assert_allclose(
                g, e, atol=atol, rtol=1e-4,
                err_msg=f"{label}: updated param {key} diverged from the "
                "reference training trajectory",
            )
        else:
            diff = np.abs(g - e)
            frac = float((diff > atol).mean())
            assert frac <= allowed_frac and diff.max() < 10 * atol, (
                f"{label}: updated param {key} diverged "
                f"(violation fraction {frac:.4%}, max {diff.max():.2e})"
            )


def _max_param_delta(jparams, tmodel, template):
    from stlt_tpu.utils.convert import torch_to_flax_params  # noqa: PLC0415

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    expected = _flat_numpy(torch_to_flax_params(sd, template))
    got = _flat_numpy(jparams)
    return max(np.abs(got[k] - expected[k]).max() for k in expected)


@pytest.mark.parametrize("dataset_name", ["something", "action_genome"])
def test_reference_train_dynamics_stlt(dataset_name):
    """4 reference update steps (CE and BCE criteria, warmup→decay crossing,
    active clipping, two-group decay) reproduced by our train step."""
    ref_configs, ref_models = _reference()
    rng = np.random.default_rng(4)
    with_scores = dataset_name == "action_genome"
    batch_np = synthetic_batch(rng, B=4, F=7, O=5, with_scores=with_scores)
    num_classes = HP["num_classes"]
    if dataset_name == "something":
        batch_np["labels"] = rng.integers(0, num_classes, size=4).astype(np.int32)
    else:
        # multi-hot float labels (BCEWithLogitsLoss path)
        batch_np["labels"] = (rng.random((4, num_classes)) < 0.4).astype(np.float32)

    torch.manual_seed(21)
    cfg_kwargs = {k: HP[k] for k in (
        "num_classes", "unique_categories", "hidden_size", "num_attention_heads",
        "num_spatial_layers", "num_temporal_layers", "layout_num_frames",
    )}
    tcfg = ref_configs.StltModelConfig(**dict(cfg_kwargs, hidden_dropout_prob=0.0))
    tmodel = ref_models.models_factory["stlt"](tcfg)

    tbatch = _torch_layout_batch(batch_np)
    if dataset_name == "action_genome":
        tbatch["labels"] = tbatch["labels"].float()

    # flax model with the SAME initial weights (converter-verified elsewhere)
    from stlt_tpu.configs import model_configs_factory  # noqa: PLC0415
    from stlt_tpu.models import models_factory as jax_factory  # noqa: PLC0415
    from stlt_tpu.utils.convert import torch_to_flax_params  # noqa: PLC0415

    jcfg = model_configs_factory["stlt"](**dict(cfg_kwargs, hidden_dropout_prob=0.0))
    jmodel = jax_factory["stlt"](jcfg)
    inputs = {k: v for k, v in batch_np.items() if k != "labels"}
    template = jmodel.init(jax.random.PRNGKey(0), inputs)["params"]
    sd0 = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params0 = torch_to_flax_params(sd0, template)

    t_losses = _torch_reference_training(tmodel, tbatch, dataset_name)
    state, j_losses = _flax_training(jmodel, params0, batch_np, dataset_name)

    np.testing.assert_allclose(j_losses, t_losses, atol=2e-5, rtol=1e-5)
    _assert_params_match(state.params, tmodel, template, 1e-5, f"stlt/{dataset_name}")

    # SENSITIVITY: a warmup off-by-one must push params beyond tolerance —
    # proof that the comparison can actually catch schedule/optimizer slips.
    state_off, _ = _flax_training(
        jmodel, params0, batch_np, dataset_name, warmup_offset=1
    )
    assert _max_param_delta(state_off.params, tmodel, template) > 1e-4


@pytest.mark.slow
def test_reference_train_dynamics_cacnf(r3d_checkpoint):
    """The fusion trajectory: heads-averaged Criterion over all four CACNF
    logit heads, frozen-BN params excluded from optimizer AND clip norm
    (requires_grad=False semantics), Kinetics-initialized R3D trunk."""
    ref_configs, ref_models = _reference()
    rng = np.random.default_rng(6)
    batch_np = synthetic_batch(rng, B=B, F=6, O=4)
    batch_np["labels"] = rng.integers(0, HP["num_classes"], size=B).astype(np.int32)
    video = _video_np(seed=6)

    kwargs = dict(HP, resnet_model_path=r3d_checkpoint, hidden_dropout_prob=0.0)
    tcfg = ref_configs.MultimodalModelConfig(**dict(kwargs))
    torch.manual_seed(13)
    tmodel = ref_models.models_factory["cacnf"](tcfg)
    _randomize_zero_params(tmodel)
    # The appearance encoder hard-codes torch-default dropout 0.1
    # (reference models.py:239-243); zero every dropout so the update math —
    # not RNG streams — is what's compared.
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0

    tbatch = _torch_layout_batch(batch_np)
    tbatch["video_frames"] = torch.from_numpy(video).permute(0, 4, 1, 2, 3)

    from stlt_tpu.configs import model_configs_factory  # noqa: PLC0415
    from stlt_tpu.models import models_factory as jax_factory  # noqa: PLC0415
    from stlt_tpu.utils.convert import torch_to_flax_params  # noqa: PLC0415
    import stlt_tpu.models.appearance as appearance_mod  # noqa: PLC0415

    old_dropout = appearance_mod.TORCH_ENCODER_DROPOUT
    appearance_mod.TORCH_ENCODER_DROPOUT = 0.0
    try:
        jcfg = model_configs_factory["cacnf"](**dict(kwargs))
        jmodel = jax_factory["cacnf"](jcfg)
        inputs = {k: v for k, v in batch_np.items() if k != "labels"}
        inputs["video_frames"] = video
        jbatch = dict(batch_np)
        jbatch["video_frames"] = video
        template = jmodel.init(jax.random.PRNGKey(0), inputs)["params"]
        sd0 = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        params0 = torch_to_flax_params(sd0, template)

        t_losses = _torch_reference_training(tmodel, tbatch, "something")
        state, j_losses = _flax_training(jmodel, params0, jbatch, "something")
    finally:
        appearance_mod.TORCH_ENCODER_DROPOUT = old_dropout

    np.testing.assert_allclose(j_losses, t_losses, atol=5e-4, rtol=1e-4)
    # conv-heavy trunk: bounded-violation comparison (see _assert_params_match
    # docstring), still far below the one-schedule-step signal (~lr = 1e-3).
    _assert_params_match(
        state.params, tmodel, template, 1e-4, "cacnf", allowed_frac=5e-3
    )
