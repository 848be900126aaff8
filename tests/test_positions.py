"""Position-table growth: >255-frame clips and cross-length checkpoint loads.

The reference pins the layout frame-position table to 256 rows
(``src/modelling/configs.py:109``) and breaks beyond 255 layout frames; this
framework grows the table with the padded frame axis
(``configs.position_table_rows``) and resamples learned tables when a
checkpoint trained at one clip length is loaded at another
(``utils.convert.resize_position_table``).
"""

import dataclasses

import jax
import numpy as np
import pytest

from __graft_entry__ import _synthetic_layout_batch
from stlt_tpu.configs import DataConfig, StltModelConfig, position_table_rows
from stlt_tpu.models.stlt import Stlt
from stlt_tpu.training import checkpoint as ckpt
from stlt_tpu.utils.convert import resize_position_table


def small_config(**kw):
    defaults = dict(
        num_classes=11,
        unique_categories=4,
        hidden_size=48,
        num_attention_heads=4,
        num_spatial_layers=1,
        num_temporal_layers=1,
        layout_num_frames=32,
    )
    defaults.update(kw)
    return StltModelConfig(**defaults)


def data_config(tmp_path, **kw):
    defaults = dict(
        dataset_name="something",
        dataset_path=str(tmp_path / "nonexistent.json"),
        labels_path=str(tmp_path / "nonexistent.json"),
        videoid2size_path=str(tmp_path / "nonexistent.json"),
        train=False,
    )
    defaults.update(kw)
    return DataConfig(**defaults)


# --- resize_position_table -------------------------------------------------


def test_resize_identity():
    table = np.arange(12, dtype=np.float32).reshape(6, 2)
    assert resize_position_table(table, 6) is table


def test_resize_preserves_endpoints_and_dtype():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(256, 8)).astype(np.float32)
    grown = resize_position_table(table, 512)
    assert grown.shape == (512, 8)
    assert grown.dtype == np.float32
    np.testing.assert_allclose(grown[0], table[0], rtol=1e-6)
    np.testing.assert_allclose(grown[-1], table[-1], rtol=1e-6)


def test_resize_is_exactly_linear():
    # Rows [0, 2] resampled to 3 rows must give the midpoint row exactly.
    table = np.array([[0.0, 10.0], [2.0, 30.0]], np.float32)
    grown = resize_position_table(table, 3)
    np.testing.assert_allclose(grown, [[0, 10], [1, 20], [2, 30]])


def test_resize_downsample_endpoints():
    table = np.linspace(0, 1, 9, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
    small = resize_position_table(table, 5)
    # A linear ramp resamples to the same ramp at any resolution.
    np.testing.assert_allclose(small[:, 0], np.linspace(0, 1, 5), rtol=1e-6)


def test_resize_rejects_degenerate_table():
    with pytest.raises(ValueError, match="1-row"):
        resize_position_table(np.zeros((1, 4), np.float32), 8)


def test_resize_extend_keeps_learned_rows_exact():
    """mode='extend': learned prefix preserved bit-for-bit, tail repeats the
    last row (absolute-position semantics for fine-tuning at a new length)."""
    rng = np.random.default_rng(1)
    table = rng.normal(size=(6, 4)).astype(np.float32)
    grown = resize_position_table(table, 9, mode="extend")
    assert grown.shape == (9, 4)
    np.testing.assert_array_equal(grown[:6], table)
    for row in grown[6:]:
        np.testing.assert_array_equal(row, table[-1])
    with pytest.raises(ValueError, match="only grows"):
        resize_position_table(table, 4, mode="extend")


# --- position_table_rows ---------------------------------------------------


def test_rows_keep_reference_floor(tmp_path):
    # Default 16 sampled frames -> the reference's fixed 256-row table.
    cfg = data_config(tmp_path, layout_num_frames=16)
    assert position_table_rows(cfg) == 256


def test_rows_grow_with_long_clips(tmp_path):
    cfg = data_config(tmp_path, layout_num_frames=300)
    assert position_table_rows(cfg) == cfg.num_total_frames == 301


def test_rows_respect_context_padding(tmp_path):
    cfg = data_config(tmp_path, layout_num_frames=300, frames_multiple=4)
    assert cfg.num_total_frames == 304
    assert position_table_rows(cfg) == 304


# --- model guard -----------------------------------------------------------


def test_model_rejects_clip_longer_than_table():
    model = Stlt(small_config(layout_num_frames=8))
    batch = _synthetic_layout_batch(2, 9, 4, 4)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    with pytest.raises(ValueError, match="position table"):
        model.init(jax.random.PRNGKey(0), inputs)


def test_model_runs_past_256_frames_when_grown():
    model = Stlt(small_config(layout_num_frames=260))
    batch = _synthetic_layout_batch(2, 260, 4, 4)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    out = model.apply({"params": params}, inputs)["stlt"]
    assert np.isfinite(np.asarray(out)).all()


# --- checkpoint loads across table sizes ------------------------------------


def _init_params(config, num_frames):
    model = Stlt(config)
    batch = _synthetic_layout_batch(2, num_frames, 4, 4)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    return model.init(jax.random.PRNGKey(0), inputs)["params"]


def test_msgpack_load_resamples_position_table(tmp_path):
    src = _init_params(small_config(layout_num_frames=20), 10)
    path = str(tmp_path / "ckpt.msgpack")
    ckpt.save_params(path, src)

    template = _init_params(small_config(layout_num_frames=35), 10)
    loaded = ckpt.load_params(path, template)

    src_table = src["backbone"]["frames_embeddings"]["position_embeddings"]
    got_table = loaded["backbone"]["frames_embeddings"]["position_embeddings"]
    np.testing.assert_allclose(
        np.asarray(got_table),
        resize_position_table(np.asarray(src_table), 35),
        rtol=1e-6,
    )
    # Every other leaf round-trips untouched.
    np.testing.assert_allclose(
        np.asarray(loaded["prediction_head"]["fc1"]["kernel"]),
        np.asarray(src["prediction_head"]["fc1"]["kernel"]),
    )


def test_msgpack_load_rejects_other_shape_mismatches(tmp_path):
    src = _init_params(small_config(hidden_size=32), 10)
    path = str(tmp_path / "ckpt.msgpack")
    ckpt.save_params(path, src)
    template = _init_params(small_config(hidden_size=48), 10)
    with pytest.raises(ValueError, match="shape mismatch"):
        ckpt.load_params(path, template)


def test_torch_load_resamples_position_table(tmp_path):
    torch = pytest.importorskip("torch")
    from stlt_tpu.utils.convert import torch_to_flax_params
    from tests.torch_ref import TorchStlt

    cfg_small = small_config(layout_num_frames=20)
    oracle = TorchStlt(cfg_small)
    template = _init_params(small_config(layout_num_frames=40), 10)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    loaded = torch_to_flax_params(sd, template)
    got = np.asarray(loaded["backbone"]["frames_embeddings"]["position_embeddings"])
    want = resize_position_table(
        sd["backbone.frames_embeddings.position_embeddings.weight"], 40
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)
