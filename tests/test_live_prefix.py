"""Live-prefix capacity for the spatial fold (configs.spatial_live_capacity).

The spatial stage is row-independent (per-frame attention over boxes,
per-token FFN/LN), so gathering live rows to a global prefix and running the
encoder at a smaller static capacity must commute exactly with the
uncapped compaction path — same logits, same grads — while shrinking the
grid, the dead-block DMA and the per-program floor by ~fill
(docs/PERF_NOTES.md round-5 live-prefix section). Contract holds whenever
``capacity >= live row count``; ``ops.fused_encoder.live_prefix_capacity``
derives such a capacity from host lengths.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stlt_tpu.ops.fused_encoder import live_prefix_capacity  # noqa: E402


def test_live_prefix_capacity_buckets():
    # 8 buckets over 1024 rows: 300 live -> ceil to bucket 3 (384)
    assert live_prefix_capacity(300, 1024) == 384
    assert live_prefix_capacity(1, 1024) == 128
    assert live_prefix_capacity(1024, 1024) is None  # full
    assert live_prefix_capacity(1000, 1024) is None  # top bucket
    # sublane rounding: buckets of a non-multiple total round up to 8
    cap = live_prefix_capacity(5, 100)
    assert cap is not None and cap % 8 == 0 and cap >= 13
    # disabled env returns None
    import stlt_tpu.ops.fused_encoder as fe

    old = fe.LIVE_PREFIX_ENABLED
    try:
        fe.LIVE_PREFIX_ENABLED = False
        assert live_prefix_capacity(300, 1024) is None
    finally:
        fe.LIVE_PREFIX_ENABLED = old


def _ragged_setup(dropout):
    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory

    cfg = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
        hidden_dropout_prob=dropout, use_pallas=True,
    )
    batch = _synthetic_layout_batch(4, 12, 5, 4, seed=5, length_range=(3, 9))
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    live = int(np.sum(np.asarray(batch["frame_types"]) != 0))
    total = int(np.asarray(batch["frame_types"]).size)
    cap = live_prefix_capacity(live, total)
    assert cap is not None and live <= cap < total
    model = models_factory["stlt"]
    return cfg, model, batch, inputs, cap


def test_live_prefix_eval_matches_uncapped_and_xla():
    cfg, factory, batch, inputs, cap = _ragged_setup(0.1)
    m_cap = factory(dataclasses.replace(cfg, spatial_live_capacity=cap))
    m_unc = factory(cfg)
    m_xla = factory(dataclasses.replace(cfg, use_pallas=False))
    params = m_unc.init(jax.random.PRNGKey(0), inputs)["params"]
    l_cap = np.asarray(m_cap.apply({"params": params}, inputs)["stlt"])
    l_unc = np.asarray(m_unc.apply({"params": params}, inputs)["stlt"])
    l_xla = np.asarray(m_xla.apply({"params": params}, inputs)["stlt"])
    # capacity vs uncapped: same kernels over permuted rows — near-bitwise
    # (only the pickers' ff-chunk split can reorder f32 sums)
    np.testing.assert_allclose(l_cap, l_unc, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(l_cap, l_xla, atol=2e-5, rtol=1e-5)


def test_live_prefix_train_grads_match_uncapped():
    # dropout 0: the hashed streams are indexed by operand row, which the
    # live-prefix gather permutes — bit-streams differ with dropout on, so
    # the exactness claim (and this test) is about the compaction itself.
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

    g_cap = grads(factory(dataclasses.replace(cfg, spatial_live_capacity=cap)))
    g_unc = grads(factory(cfg))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_cap)[0],
        jax.tree_util.tree_flatten_with_path(g_unc)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6, rtol=1e-5,
            err_msg=str(pa),
        )


def test_live_prefix_param_tree_capacity_invariant():
    """One set of weights serves every bucket: init under a capacity and
    under None produce identical param trees (shapes + names)."""
    cfg, factory, batch, inputs, cap = _ragged_setup(0.1)
    p_unc = factory(cfg).init(jax.random.PRNGKey(0), inputs)["params"]
    p_cap = factory(
        dataclasses.replace(cfg, spatial_live_capacity=cap)
    ).init(jax.random.PRNGKey(0), inputs)["params"]
    ta = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), p_unc)
    tb = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), p_cap)
    assert ta == tb


def test_capacity_for_datasets(tmp_path):
    """configs.spatial_live_capacity_for: safe bound from the dataset scan,
    same answer through LayoutDataset, the C++ NativeLayoutDataset and the
    multimodal wrapper (the CLIs' --live_prefix path)."""
    from stlt_tpu.configs import DataConfig, spatial_live_capacity_for
    from stlt_tpu.data.layout import LayoutDataset
    from tests.fixtures import make_something_fixture

    paths, videos, _, _ = make_something_fixture(str(tmp_path), num_videos=5)
    cfg = DataConfig(
        dataset_name="something", train=False, layout_num_frames=32, **paths
    )
    ds = LayoutDataset(cfg)
    max_frames = max(len(v["frames"]) for v in videos)
    assert ds.max_video_frames() == max_frames
    cap = spatial_live_capacity_for(ds, cfg, 4)
    want = min(4 * 33, ((4 * (min(max_frames, 32) + 1) + 7) // 8) * 8)
    assert cap == (None if want >= 4 * 33 else want)
    # native dataset scan agrees (skip silently if no compiler)
    try:
        from stlt_tpu.data.native import NativeLayoutDataset

        nds = NativeLayoutDataset(cfg)
        assert nds.max_video_frames() == max_frames
        assert spatial_live_capacity_for(nds, cfg, 4) == cap
    except RuntimeError:
        pass
    # a dataset that FILLS the table yields None (no shrink)
    cfg_full = DataConfig(
        dataset_name="something", train=False, layout_num_frames=4, **paths
    )
    assert spatial_live_capacity_for(LayoutDataset(cfg_full), cfg_full, 4) is None
