"""Tiled-VMEM footprint guards for the fused-encoder block pickers.

Scoped VMEM is 16 MB/kernel and block footprints are TILED (last axis pads
to 128 lanes, the one before to the dtype's sublane tile) — a picker that
looks fine in nominal bytes can OOM only on real hardware (the round-3
rb=rows incident). These tests recompute the PADDED footprint of every
buffer a program touches for a sweep of realistic shapes and assert a
safety margin, so a picker regression fails on CPU before it ever reaches
the chip.
"""

import jax.numpy as jnp
import pytest

from stlt_tpu.ops.fused_encoder import (
    _pick_bwd_row_block,
    _pick_cross_row_block,
    _pick_fused_row_block,
    _pick_tail_blocks,
)

LIMIT = 15 * 1024 * 1024  # leave ≥1 MB headroom under the 16 MB scope


def padded(shape, itemsize):
    """Tiled VMEM bytes for one buffer: lane axis pads to 128, sublane axis
    to the dtype tile (8 for f32, 16 for bf16)."""
    if len(shape) == 0:
        return itemsize
    sub_tile = 8 if itemsize == 4 else 16
    dims = list(shape)
    dims[-1] = -(dims[-1] // -128) * 128
    if len(dims) >= 2:
        dims[-2] = -(dims[-2] // -sub_tile) * sub_tile
    total = itemsize
    for d in dims:
        total *= d
    return total


SHAPES = [
    # rows, T, H, N  (spatial / temporal / appearance / long-temporal)
    (17408, 8, 768, 12),
    (1024, 24, 768, 12),
    (128, 40, 768, 12),
    (1000 * 17, 8, 768, 12),   # odd CLI batch
    (32, 520, 768, 12),        # 512-frame tail shapes
    (64, 8, 64, 4),            # test-size models
]


@pytest.mark.parametrize("rows,T,H,N", SHAPES)
@pytest.mark.parametrize("itemsize", [2, 4])
def test_fused_fwd_footprint(rows, T, H, N, itemsize):
    if T > 64:
        pytest.skip("fwd kernel is gated to short sequences")
    rb = _pick_fused_row_block(rows, T, H, N, itemsize)
    if rb is None:
        return  # gate (fused_proj_fits) keeps such shapes on the XLA chain
    d = H // N
    total = (
        padded((rb, T, H), itemsize) * 2          # x, out blocks
        + padded((H, 3 * H), itemsize)            # wqkv
        + padded((H, H), itemsize)                # wo
        + padded((rb, 1, T, T), 4)                # bias block
        + padded((rb * T, H), 4)                  # x f32
        + padded((rb * T, 3 * H), 4)              # qkv f32
        + padded((rb * T, 3 * H), itemsize)       # qkv compute copy
        + 3 * padded((rb, T, d), 4)               # per-head q/k/v tiles
        + 2 * padded((rb, T, T), 4)               # logits/probs
        + padded((rb * T, H), 4)                  # attn concat
    )
    assert total <= LIMIT, (rb, total / 1e6)


@pytest.mark.parametrize("rows,T,H,N", SHAPES)
@pytest.mark.parametrize("itemsize", [2, 4])
def test_fused_bwd_footprint(rows, T, H, N, itemsize):
    if T > 64:
        pytest.skip("bwd kernel is gated to short sequences")
    rb = _pick_bwd_row_block(rows, T, H, itemsize)
    if rb is None:
        return  # gate (fused_train_fits) keeps such shapes on the XLA chain
    d = H // N
    total = (
        padded((rb, T, H), itemsize) * 2          # x, g blocks
        + padded((rb, T, 3 * H), itemsize)        # dqkv out block
        + padded((H, 3 * H), itemsize)            # wqkv
        + padded((H, H), itemsize)                # wo
        + padded((H, H), 4) + padded((1, H), 4)   # dwo/dbo accumulators
        + padded((rb, 1, T, T), 4)                # bias block
        + 2 * padded((rb * T, H), 4)              # x f32, g f32
        + padded((rb * T, 3 * H), 4)              # qkv f32
        + padded((rb * T, 3 * H), itemsize)       # qkv compute copy
        + padded((rb * T, H), 4) * 2              # dattn, attn
        + padded((rb * T, 3 * H), 4)              # dqkv f32 assembly
        + 3 * padded((rb, T, d), 4)               # per-head tiles
        + 5 * padded((rb, T, T), 4)               # p/dp/dz/keep/pv
    )
    assert total <= LIMIT, (rb, total / 1e6)


@pytest.mark.parametrize("rows,T,H,N", SHAPES)
@pytest.mark.parametrize("itemsize", [2, 4])
def test_tail_footprint(rows, T, H, N, itemsize):
    FF = 4 * H
    blocks = _pick_tail_blocks(rows, T, H, FF, itemsize)
    if blocks is None:
        # Legitimate: the dispatch gate (tail_blocks_fit) keeps such shapes
        # on the XLA chain (e.g. 512-frame f32).
        return
    rb, ffb = blocks
    total = (
        padded((rb, T, H), itemsize) * 3          # x, y, out blocks
        + padded((H, ffb), itemsize)              # w1 chunk
        + padded((ffb, H), itemsize)              # w2 chunk
        + padded((rb * T, H), itemsize)           # u scratch
        + padded((rb * T, H), 4)                  # accumulator scratch
        + padded((rb * T, ffb), 4)                # h1 f32
        + padded((rb * T, ffb), itemsize)         # h1 compute copy
        + 3 * padded((rb * T, H), 4)              # r32/LN temporaries
    )
    assert total <= LIMIT, (rb, ffb, total / 1e6)


CROSS_SHAPES = [
    # rows, T, S, H, N — the fusion models' cross-attention shapes
    (128, 40, 40, 768, 12),   # layout <-> appearance (34/33 padded)
    (128, 24, 40, 768, 12),
    (1000, 40, 24, 768, 12),
    (64, 8, 8, 64, 4),        # test-size models
]


@pytest.mark.parametrize("rows,T,S,H,N", CROSS_SHAPES)
@pytest.mark.parametrize("itemsize", [2, 4])
def test_cross_footprint(rows, T, S, H, N, itemsize):
    rb = _pick_cross_row_block(rows, T, S, H, N, itemsize)
    if rb is None:
        return  # gate keeps the XLA chain
    d = H // N
    total = (
        padded((rb, T, H), itemsize) * 2          # x, out blocks
        + padded((rb, S, H), itemsize)            # ctx block
        + padded((H, H), itemsize) * 2            # wq, wo
        + padded((H, 2 * H), itemsize)            # wkv
        + padded((rb, 1, T, S), 4)                # bias block
        + padded((rb * T, H), 4)                  # x f32
        + padded((rb * S, H), 4)                  # ctx f32
        + padded((rb * T, H), 4) + padded((rb * T, H), itemsize)   # q
        + padded((rb * S, 2 * H), 4) + padded((rb * S, 2 * H), itemsize)  # kv
        + 3 * padded((rb, max(T, S), d), 4)       # per-head tiles
        + 2 * padded((rb, T, S), 4)               # logits/probs
        + padded((rb * T, H), 4)                  # attn concat
    )
    assert total <= LIMIT, (rb, total / 1e6)
