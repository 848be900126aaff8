"""Temporal frame-capacity truncation (configs.temporal_frame_capacity).

The datasets pad frames tail-contiguously (reference datasets.py:247-286),
the temporal encoder is CAUSAL and pooling reads ``lengths - 1``, so
truncating the layout frame axis to a host-derived static capacity covering
every clip's live prefix must commute exactly with the untruncated model —
same logits, same grads — while shrinking the spatial fold, the temporal
stage AND the fusion modules by ~``cap / F`` (models/stlt.py
apply_frame_capacity; docs/PERF_NOTES.md round-5 frame-capacity section).
Contract: ``capacity >= every clip's live slot count``.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stlt_tpu.ops.fused_encoder import frame_capacity  # noqa: E402


def test_frame_capacity_buckets():
    # 8 buckets over 512 slots: longest live prefix 150 -> bucket 3 (192)
    assert frame_capacity(150, 512) == 192
    assert frame_capacity(1, 512) == 64
    assert frame_capacity(512, 512) is None  # full
    assert frame_capacity(500, 512) is None  # top bucket
    # sublane rounding: buckets of a non-multiple total round up to 8
    cap = frame_capacity(5, 100)
    assert cap is not None and cap % 8 == 0 and cap >= 13
    import stlt_tpu.ops.fused_encoder as fe

    old = fe.FRAME_CAP_ENABLED
    try:
        fe.FRAME_CAP_ENABLED = False
        assert frame_capacity(150, 512) is None
    finally:
        fe.FRAME_CAP_ENABLED = old


def _ragged_setup(dropout, use_pallas=True):
    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory

    cfg = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
        hidden_dropout_prob=dropout, layout_num_frames=24,
        use_pallas=use_pallas,
    )
    # lengths in [3, 9] against a 24-slot axis: cap=16 covers every live
    # prefix and drops only all-dead slots
    batch = _synthetic_layout_batch(4, 24, 5, 4, seed=5, length_range=(3, 9))
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    assert int(np.max(np.asarray(batch["lengths"]))) <= 16 < 24
    return cfg, models_factory["stlt"], batch, inputs, 16


def test_frame_cap_eval_matches_uncapped_and_xla():
    cfg, factory, batch, inputs, cap = _ragged_setup(0.1)
    m_cap = factory(dataclasses.replace(cfg, temporal_frame_capacity=cap))
    m_unc = factory(cfg)
    m_xla = factory(dataclasses.replace(
        cfg, temporal_frame_capacity=cap, use_pallas=False))
    params = m_unc.init(jax.random.PRNGKey(0), inputs)["params"]
    l_cap = np.asarray(m_cap.apply({"params": params}, inputs)["stlt"])
    l_unc = np.asarray(m_unc.apply({"params": params}, inputs)["stlt"])
    l_xla = np.asarray(m_xla.apply({"params": params}, inputs)["stlt"])
    # capacity vs uncapped: the same kernels over a sliced-off all-dead tail
    np.testing.assert_allclose(l_cap, l_unc, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(l_cap, l_xla, atol=2e-5, rtol=1e-5)


def test_frame_cap_composes_with_live_prefix():
    """Both ragged levers together (the --live_prefix CLI path): truncation
    first, then the spatial live-prefix gather over the sliced rows."""
    from stlt_tpu.ops.fused_encoder import live_prefix_capacity

    cfg, factory, batch, inputs, cap = _ragged_setup(0.1)
    live = int(np.sum(np.asarray(batch["frame_types"]) != 0))
    sp = live_prefix_capacity(live, 4 * cap)
    assert sp is not None and live <= sp < 4 * cap
    m_both = factory(dataclasses.replace(
        cfg, temporal_frame_capacity=cap, spatial_live_capacity=sp))
    m_unc = factory(cfg)
    params = m_unc.init(jax.random.PRNGKey(0), inputs)["params"]
    l_both = np.asarray(m_both.apply({"params": params}, inputs)["stlt"])
    l_unc = np.asarray(m_unc.apply({"params": params}, inputs)["stlt"])
    np.testing.assert_allclose(l_both, l_unc, atol=2e-6, rtol=1e-6)


def test_frame_cap_train_grads_match_uncapped():
    # dropout 0: nn.Dropout / the hashed streams draw bits by operand shape,
    # which truncation changes — bit-streams differ with dropout on, so the
    # exactness claim (and this test) is about the truncation itself.
    cfg, factory, batch, inputs, cap = _ragged_setup(0.0)
    from stlt_tpu.training.criterion import make_criterion

    crit = make_criterion("something")
    labels = jnp.asarray(batch["labels"] % 7)
    key = jax.random.key(3, impl="rbg")
    params = factory(cfg).init(jax.random.PRNGKey(0), inputs)["params"]

    def grads(model):
        def loss(p):
            lo = model.apply(
                {"params": p}, inputs, deterministic=False,
                rngs={"dropout": key},
            )
            return crit(lo, labels, None)

        return jax.grad(loss)(params)

    g_cap = grads(factory(dataclasses.replace(cfg, temporal_frame_capacity=cap)))
    g_unc = grads(factory(cfg))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_cap)[0],
        jax.tree_util.tree_flatten_with_path(g_unc)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6, rtol=1e-5,
            err_msg=str(pa),
        )


def test_frame_cap_param_tree_capacity_invariant():
    """One set of weights serves every bucket: the position table keeps its
    full layout_num_frames rows under truncation."""
    cfg, factory, batch, inputs, cap = _ragged_setup(0.1)
    p_unc = factory(cfg).init(jax.random.PRNGKey(0), inputs)["params"]
    p_cap = factory(
        dataclasses.replace(cfg, temporal_frame_capacity=cap)
    ).init(jax.random.PRNGKey(0), inputs)["params"]
    ta = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), p_unc)
    tb = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), p_cap)
    assert ta == tb
    rows = p_cap["backbone"]["frames_embeddings"]["position_embeddings"].shape[0]
    assert rows == cfg.layout_num_frames


@pytest.mark.parametrize("name", ["lcf", "caf", "cacnf"])
def test_frame_cap_fusion_models_match(name):
    """The fusion stacks consume the truncated layout branch: masks slice to
    the same cap (fusion.CrossAttentionFusionBackbone), logits unchanged."""
    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import MultimodalModelConfig
    from stlt_tpu.models import models_factory

    rng = np.random.default_rng(9)
    cfg = MultimodalModelConfig(
        num_classes=5, unique_categories=4, hidden_size=48,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
        num_fusion_layers=2, num_appearance_layers=1, layout_num_frames=24,
        appearance_num_frames=1, resnet_model_path="unused",
        use_pallas=True,
    )
    batch = _synthetic_layout_batch(2, 24, 4, 4, seed=7, length_range=(3, 9))
    batch["video_frames"] = rng.normal(0, 1, (2, 8, 32, 32, 3)).astype(
        np.float32
    )
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    factory = models_factory[name]
    m_unc = factory(cfg)
    m_cap = factory(dataclasses.replace(cfg, temporal_frame_capacity=16))
    params = m_unc.init(jax.random.PRNGKey(0), inputs)["params"]
    out_unc = m_unc.apply({"params": params}, inputs)
    out_cap = m_cap.apply({"params": params}, inputs)
    assert out_unc.keys() == out_cap.keys()
    for k in out_unc:
        np.testing.assert_allclose(
            np.asarray(out_cap[k]), np.asarray(out_unc[k]),
            atol=2e-6, rtol=1e-6, err_msg=k,
        )


def test_frame_capacity_for_datasets(tmp_path):
    """configs.frame_capacity_for: safe bound from the dataset scan (the
    CLIs' --live_prefix path)."""
    from stlt_tpu.configs import DataConfig, frame_capacity_for
    from stlt_tpu.data.layout import LayoutDataset

    from tests.fixtures import make_something_fixture

    paths, videos, _, _ = make_something_fixture(str(tmp_path), num_videos=5)
    cfg = DataConfig(
        dataset_name="something", train=False, layout_num_frames=32, **paths
    )
    ds = LayoutDataset(cfg)
    max_frames = max(len(v["frames"]) for v in videos)
    cap = frame_capacity_for(ds, cfg)
    want = min(33, ((min(max_frames, 32) + 1 + 7) // 8) * 8)
    assert cap == (None if want >= 33 else want)
    # a dataset that FILLS the table yields None (no shrink)
    cfg_full = DataConfig(
        dataset_name="something", train=False, layout_num_frames=4, **paths
    )
    assert frame_capacity_for(LayoutDataset(cfg_full), cfg_full) is None
