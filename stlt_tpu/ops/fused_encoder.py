"""Fused projection+attention Pallas kernel for short-sequence encoders.

TPU-native replacement for the *whole* attention sublayer of
``torch.nn.TransformerEncoderLayer`` (reference ``src/modelling/models.py``
builds every encoder from it): one Pallas program computes, for a block of
batch rows,

    qkv  = x @ W_qkv + b_qkv          (one [rb*T, H] x [H, 3H] MXU matmul)
    o_h  = softmax(q_h k_h^T * scale + bias) v_h      (per head, in VMEM)
    y    = concat_h(o_h) @ W_o + b_o

and writes only ``y``. The round-2 design (``ops/flash.py``) fused only the
softmax middle: XLA still materialized q/k/v in HBM ([B, T, H] each), then
head-split-transposed them to [B, N, T, D] (three more HBM round trips),
and the attention output made the reverse trip into the out-projection. At
the spatial stage's shape (17k rows x 8 tokens x H=768, bf16) those
intermediates are ~214 MB each — ~1.5 GB of HBM traffic per layer that this
kernel never emits. The projection weights ride in VMEM across the whole
grid (constant ``index_map`` — Mosaic fetches them once), so weight DMA is
~7 MB total rather than per-program.

Scope: **eval path only** (``deterministic=True`` — no attention-probability
dropout, no backward). The train step keeps the round-3 fused kernels with
the in-kernel hashed-dropout stream (``ops/flash.py``). Dispatch lives in
``models/layers.MultiHeadAttention``; sequences longer than
``FUSED_PROJ_MAX_SEQ`` keep the blockwise path.

Numerics match the unfused module chain step for step: the projection
accumulates f32 on the MXU and rounds to the compute dtype (exactly what
``nn.Dense`` emits for bf16), logits/softmax are f32, the attention output
is rounded to the compute dtype before the out-projection (as the round-2
kernel's output write did). Parity: tests/test_fused_encoder.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stlt_tpu.ops.flash import _broadcast_bias, _pad_to

# Whole-[T, S] tiles + all heads live in one program: cap the token count.
# Covers the spatial (8), temporal (17/34) and appearance (33) encoders;
# longer sequences (256-frame+) stay on the blockwise kernels.
FUSED_PROJ_MAX_SEQ = 64


def _fused_proj_attn_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, bias_ref, o_ref,
    *, scale: float, num_heads: int, compute_dtype,
):
    """One program: rb batch rows, all heads. x_ref: [rb, T, H];
    wqkv_ref: [H, 3H]; bias_ref: [rb, 1, T, S]; o_ref: [rb, T, H]."""
    rb, t, h = x_ref.shape
    n, d = num_heads, h // num_heads
    # Mosaic reshape legality: every rank-changing reshape here runs on an
    # f32 vector (sublane tile 8) with all merged/split sublane dims
    # multiples of 8 — the launcher enforces t % 8 == 0. bf16 reshapes need
    # 16-multiples and failed real-TPU lowering ("unsupported shape cast");
    # the bf16<->f32 round trips below are exact, so numerics are unchanged.
    x = x_ref[...].astype(jnp.float32).reshape(rb * t, h)
    # Projection: compute-dtype operands on the MXU (bf16 rate), f32
    # accumulation, rounded to the compute dtype — bit-matching the unfused
    # nn.Dense(dtype=bf16) output.
    qkv = jax.lax.dot_general(
        x.astype(compute_dtype), wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv.astype(compute_dtype).astype(jnp.float32)
    bias = bias_ref[:, 0].astype(jnp.float32)  # [rb, T or 1, S]
    outs = []
    for i in range(n):
        q_h = qkv[:, i * d:(i + 1) * d].reshape(rb, t, d)
        k_h = qkv[:, h + i * d:h + (i + 1) * d].reshape(rb, t, d)
        v_h = qkv[:, 2 * h + i * d:2 * h + (i + 1) * d].reshape(rb, t, d)
        logits = jax.lax.dot_general(
            q_h, k_h,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + bias
        logits -= jnp.max(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                probs, v_h,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    attn = jnp.concatenate(outs, axis=-1).reshape(rb * t, h)
    # Round to compute dtype (the round-2 kernel wrote its output in the
    # compute dtype before XLA's out-projection — keep that numerics).
    y = jax.lax.dot_general(
        attn.astype(compute_dtype), wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)
    o_ref[...] = y.reshape(rb, t, h).astype(o_ref.dtype)


def _pick_fused_row_block(rows: int, t: int, h: int, n: int, itemsize: int) -> int:
    """Rows per program under a VMEM budget. Resident per program: the x and
    out blocks (compute dtype), the f32+compute-dtype qkv buffer, per-head
    f32 tiles, the f32 attention buffer, plus the weights (once, ~[H,3H] +
    [H,H]). Weights are grid-constant so they count once, not per block.
    Lane padding: t pads to 8 sublanes, h/3h are lane-exact at H=768."""
    t_sub = -(t // -8) * 8
    s_lane = -(t // -128) * 128
    per_row = (
        2 * t_sub * h * itemsize          # x block + out block
        + t_sub * 3 * h * (4 + itemsize)  # qkv f32 + compute-dtype copy
        + 3 * t_sub * s_lane * 4          # logits/probs/out per-head f32 tiles
        + t_sub * h * 4                   # concat attention buffer (f32)
    )
    weights = (3 * h + h) * h * itemsize + 4 * h * itemsize
    budget = 12 * 1024 * 1024 - weights
    rb = max(1, min(budget // max(per_row, 1), rows))
    if rb >= rows:
        return rows
    # Prefer zero/low padding within [rb/2, rb].
    best, best_pad = rb, (-rows) % rb
    for cand in range(rb, max(rb // 2, 1) - 1, -1):
        pad = (-rows) % cand
        if pad < best_pad:
            best, best_pad = cand, pad
            if pad == 0:
                break
    return best


def fused_proj_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    num_heads: int,
    compute_dtype,
    row_block: Optional[int] = None,
) -> jnp.ndarray:
    """Self-attention sublayer in one kernel. x: [B, T, H]; wqkv: [H, 3H]
    (q/k/v kernels concatenated on the output axis); bias broadcastable to
    [B, 1, T, T] (head-invariant — every encoder bias here is). Returns
    y = out_proj(attention(x)) as [B, T, H] in x.dtype."""
    B, T0, H = x.shape
    assert H % num_heads == 0
    D = H // num_heads
    scale = 1.0 / (D ** 0.5)

    bias4 = None
    if bias is not None:
        bias4 = jnp.asarray(bias, jnp.float32)
        while bias4.ndim < 4:
            bias4 = bias4[None]
        assert bias4.shape[1] == 1, "fused-proj kernel: head-invariant bias only"
    bias_arr = _broadcast_bias(bias4, B, T0, T0)

    # The in-kernel reshapes run on f32 vectors, whose sublane tile is 8 —
    # pad the token axis up to a multiple of 8 (temporal 17 -> 24,
    # appearance 33 -> 40). Padded KEYS get a -1e9 bias so real rows ignore
    # them; padded QUERY rows see an all-finite bias (softmax stays NaN-free)
    # and their junk output is sliced off. The extra tokens cost ~T/8 of the
    # sublayer's GEMM time — measured a net win vs the unfused fallback.
    pad_t = (-T0) % 8
    T = T0 + pad_t
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        bias_arr = jnp.pad(
            bias_arr,
            ((0, 0), (0, 0), (0, pad_t), (0, 0)),
        )
        bias_arr = jnp.pad(
            bias_arr,
            ((0, 0), (0, 0), (0, 0), (0, pad_t)),
            constant_values=-1e9,
        )

    itemsize = jnp.dtype(compute_dtype).itemsize
    rb = row_block or _pick_fused_row_block(B, T, H, num_heads, itemsize)
    pad_rows = (-B) % rb
    if pad_rows:
        x = _pad_to(x, 0, rb)
        bias_arr = _pad_to(bias_arr, 0, rb)
    Bp = B + pad_rows
    grid = (Bp // rb,)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, _n=nd: (0,) * _n, memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(
            _fused_proj_attn_kernel,
            scale=scale, num_heads=num_heads,
            compute_dtype=jnp.dtype(compute_dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const_spec((H, 3 * H)),
            const_spec((1, 3 * H)),
            const_spec((H, H)),
            const_spec((1, H)),
            pl.BlockSpec(
                (rb, 1, T, T), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, T, H), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(
        x,
        wqkv.astype(compute_dtype),
        jnp.reshape(bqkv, (1, 3 * H)).astype(compute_dtype),
        wo.astype(compute_dtype),
        jnp.reshape(bo, (1, H)).astype(compute_dtype),
        bias_arr,
    )
    return out[:B, :T0]
