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

Scope: short-sequence self-attention (dispatch in
``models/layers.MultiHeadAttention``; longer sequences keep the blockwise
kernels of ``ops/flash.py``). Three entry points:

- ``fused_proj_attention`` — eval forward (no dropout, no backward);
- ``fused_proj_attention_train`` — the same fused forward with IN-KERNEL
  hashed dropout plus a ``custom_vjp`` backward: one program per row block
  recomputes qkv/probs/keep in VMEM and emits dqkv + accumulated dWo/dbo,
  and XLA finishes with the three clean GEMMs (dx, dWqkv, dbqkv);
- ``fused_layer_tail`` — eval-only residual+norm1 -> FFN -> residual+norm2
  (the train tail stays on the differentiable XLA chain).

Numerics match the unfused module chain step for step: the projection
accumulates f32 on the MXU and rounds to the compute dtype (exactly what
``nn.Dense`` emits for bf16), logits/softmax are f32, the attention output
is rounded to the compute dtype before the out-projection (as the round-2
kernel's output write did). Parity: tests/test_fused_encoder.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stlt_tpu.ops.flash import (
    _broadcast_bias,
    _dropout_thresh,
    _keep_block,
    _pad_to,
)

# Whole-[T, S] tiles + all heads live in one program: cap the token count.
# Covers the spatial (8), temporal (17/34) and appearance (33) encoders;
# longer sequences (256-frame+) stay on the blockwise kernels.
FUSED_PROJ_MAX_SEQ = 64

# A/B + debug kill-switches (read once at import): setting any to "0"
# routes that dispatch back to the previous path. Used to attribute bench
# deltas to one kernel at a time and as insurance on new hardware.
FUSED_PROJ_ENABLED = os.environ.get("STLT_FUSED_PROJ", "1") != "0"
FUSED_TAIL_ENABLED = os.environ.get("STLT_FUSED_TAIL", "1") != "0"
FUSED_TRAIN_ENABLED = os.environ.get("STLT_FUSED_PROJ_TRAIN", "1") != "0"
COMPACTION_ENABLED = os.environ.get("STLT_COMPACTION", "1") != "0"
LIVE_PREFIX_ENABLED = os.environ.get("STLT_LIVE_PREFIX", "1") != "0"
FRAME_CAP_ENABLED = os.environ.get("STLT_FRAME_CAP", "1") != "0"


def live_prefix_capacity(live_rows: int, total_rows: int, buckets: int = 8):
    """Host-side bucket for the spatial live-prefix fold
    (``configs.spatial_live_capacity``): the smallest of ``buckets`` evenly
    spaced capacities that covers ``live_rows``, rounded up to a sublane
    multiple of 8. Returns ``None`` when the fold would not shrink (top
    bucket) or the feature is disabled (``STLT_LIVE_PREFIX=0``) — callers
    then run the plain block-skip path. Bucketing bounds jit recompiles at
    ``buckets`` per model while keeping the capacity >= the live row count
    (the correctness contract in models/stlt.py)."""
    if not LIVE_PREFIX_ENABLED:
        return None
    live_rows = max(int(live_rows), 1)
    if live_rows >= total_rows:
        return None
    k = -(-live_rows * buckets // total_rows)  # ceil
    if k >= buckets:
        return None
    cap = -(-total_rows * k // buckets)
    cap = min(total_rows, ((cap + 7) // 8) * 8)
    return None if cap >= total_rows else cap


def frame_capacity(max_live_frames: int, total_frames: int, buckets: int = 8):
    """Host-side bucket for the temporal frame-capacity truncation
    (``configs.temporal_frame_capacity``): the frame axis the whole model
    runs at when every clip's live slots fit a prefix of it. Unlike the
    spatial live-prefix (which compacts rows ACROSS clips), the frame axis
    can only shrink to the batch's LONGEST live prefix — pads are
    tail-contiguous per clip, so slicing ``[:, :cap]`` drops only all-dead
    slots (models/stlt.py apply_frame_capacity). Same 8-bucket scheme as
    :func:`live_prefix_capacity` to bound jit recompiles; rounded up to the
    f32 sublane multiple of 8. Returns ``None`` when truncation would not
    shrink or ``STLT_FRAME_CAP=0``."""
    if not FRAME_CAP_ENABLED:
        return None
    max_live_frames = max(int(max_live_frames), 1)
    if max_live_frames >= total_frames:
        return None
    k = -(-max_live_frames * buckets // total_frames)  # ceil
    if k >= buckets:
        return None
    cap = -(-total_frames * k // buckets)
    cap = min(total_frames, ((cap + 7) // 8) * 8)
    return None if cap >= total_frames else cap


def _block_live(rows_live, pad_rows: int, rb: int) -> jnp.ndarray:
    """[rows]-bool → per-row-block any-live flags, int32 [grid], for the
    SMEM skip operand (rank-1 arrays ride whole in SMEM — sub-array blocks
    are rejected by real-TPU lowering)."""
    live = jnp.asarray(rows_live, jnp.int32)
    if pad_rows:
        live = jnp.pad(live, (0, pad_rows))
    return jnp.max(live.reshape(-1, rb), axis=1)


def _const_spec(shape):
    """Grid-constant VMEM block (weights/biases): same block every step, so
    Mosaic fetches it once for the whole grid."""
    nd = len(shape)
    return pl.BlockSpec(
        shape, lambda *_args, _n=nd: (0,) * _n, memory_space=pltpu.VMEM
    )


def _best_row_block(rows: int, rb0: int) -> int:
    """Largest block <= rb0 minimizing pad waste within [rb0/2, rb0]."""
    if rb0 >= rows:
        return rows
    best, best_pad = rb0, (-rows) % rb0
    for cand in range(rb0, max(rb0 // 2, 1) - 1, -1):
        pad = (-rows) % cand
        if pad < best_pad:
            best, best_pad = cand, pad
            if pad == 0:
                break
    return best


def _fused_proj_attn_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, bias_ref, *rest,
    scale: float, num_heads: int, compute_dtype,
    dropout_scale: float = 0.0, prng: Optional[tuple] = None,
    has_live: bool = False,
):
    """One program: rb batch rows, all heads. x_ref: [rb, T, H];
    wqkv_ref: [H, 3H]; bias_ref: [rb, 1, T, S]; o_ref: [rb, T, H].
    With ``prng = (s_total, thresh)`` a seed operand precedes the output and
    keep bits are hashed in place per (b, head, t, s) — the same lowbias32
    stream as ops/flash.py, so the XLA fallback's hash_keep_mask
    reconstructs identical bits (s_total is the UNPADDED key length; padded
    columns collide into rows whose probability is already 0).
    With ``has_live`` a [grid] int32 SMEM vector precedes (seed_ref and) the
    output: per-row-block any-live flags (pad-frame compaction). Dead blocks
    skip ALL compute and write zeros — finite, and exactly what downstream
    reads, since pad-frame rows only ever enter later attention through
    -1e9-masked keys whose softmax weight underflows to exactly 0."""
    rest = list(rest)
    live_ref = rest.pop(0) if has_live else None
    if prng is not None:
        seed_ref, o_ref = rest
    else:
        (o_ref,) = rest
    rb, t, h = x_ref.shape
    n, d = num_heads, h // num_heads
    i_row = pl.program_id(0)  # hoisted: no pl.program_id under pl.when

    def _body():
        # Mosaic reshape legality: every rank-changing reshape here runs on
        # an f32 vector (sublane tile 8) with all merged/split sublane dims
        # multiples of 8 — the launcher enforces t % 8 == 0. bf16 reshapes
        # need 16-multiples and failed real-TPU lowering ("unsupported shape
        # cast"); the bf16<->f32 round trips below are exact, so numerics
        # are unchanged.
        x = x_ref[...].astype(jnp.float32).reshape(rb * t, h)
        # Projection: compute-dtype operands on the MXU (bf16 rate), f32
        # accumulation, rounded to the compute dtype — bit-matching the
        # unfused nn.Dense(dtype=bf16) output.
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
            if prng is not None:
                s_total, thresh = prng
                keep = _keep_block(
                    seed_ref[0], i_row * rb, i, 0, 0, (rb, t, t),
                    n, s_total, thresh,
                )
                probs = probs * (keep * dropout_scale)
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

    if live_ref is None:
        _body()
    else:
        block_live = live_ref[i_row] != 0
        pl.when(block_live)(_body)

        @pl.when(jnp.logical_not(block_live))
        def _dead():
            o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)


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
    rb0 = min(budget // max(per_row, 1), rows)
    if rb0 < 1:
        # Not even one row fits next to the grid-resident weights (e.g.
        # H >= 1024 at f32): the dispatch predicate keeps the XLA chain.
        return None
    return _best_row_block(rows, rb0)


def _pick_cross_row_block(rows: int, t: int, s: int, h: int, n: int,
                          itemsize: int):
    """Row block for the cross kernel with its OWN buffer accounting (the
    self-attention picker under-counts: it omits the ctx block, the f32
    x/ctx flatten copies and the 2H kv buffer). Conservative tiled bytes;
    None when nothing fits."""
    t_sub = -(t // -8) * 8
    s_sub = -(s // -8) * 8
    s_lane = -(s // -128) * 128
    per_row = (
        (2 * t_sub + s_sub) * h * itemsize      # x, out, ctx blocks
        + (t_sub + s_sub) * h * 4               # x/ctx f32 flatten copies
        # q/kv buffers: charged (8 + itemsize) per element — 4 B for the f32
        # copy plus a deliberate 2x margin over the compute copy. Mosaic's
        # real allocation exceeds nominal by up to 16x on tiny tiles
        # (CLAUDE.md VMEM traps); an undercounting picker OOMs on hardware
        # while every CPU-interpreter test passes, so this model stays
        # conservative by design.
        + t_sub * h * (8 + itemsize)            # q f32 + margin
        + s_sub * 2 * h * (8 + itemsize)        # kv f32 + margin
        + (t_sub + 2 * s_sub) * 128 * 4         # per-head q/k/v tiles
        + 2 * t_sub * s_lane * 4                # logits/probs
        + t_sub * h * 4                         # attn concat (f32)
        + t_sub * s_lane * 4                    # bias block
    )
    weights = 4 * h * h * itemsize + 4 * h * itemsize
    budget = 12 * 1024 * 1024 - weights
    rb0 = min(budget // max(per_row, 1), rows)
    if rb0 < 1:
        return None
    return _best_row_block(rows, rb0)


def fused_proj_fits(rows: int, t: int, h: int, n: int, itemsize: int) -> bool:
    """Dispatch predicate for the eval self-attention kernel."""
    return _pick_fused_row_block(rows, t + (-t) % 8, h, n, itemsize) is not None


def fused_train_fits(rows: int, t: int, h: int, n: int, itemsize: int) -> bool:
    """Dispatch predicate for the train path: BOTH the fused forward and the
    fused backward must fit scoped VMEM."""
    tp = t + (-t) % 8
    return (
        _pick_fused_row_block(rows, tp, h, n, itemsize) is not None
        and _pick_bwd_row_block(rows, tp, h, itemsize) is not None
    )


def fused_cross_fits(rows: int, t: int, s: int, h: int, n: int,
                     itemsize: int) -> bool:
    return _pick_cross_row_block(
        rows, t + (-t) % 8, s + (-s) % 8, h, n, itemsize
    ) is not None


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
    rows_live: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Self-attention sublayer in one kernel. x: [B, T, H]; wqkv: [H, 3H]
    (q/k/v kernels concatenated on the output axis); bias broadcastable to
    [B, 1, T, T] (head-invariant — every encoder bias here is). Returns
    y = out_proj(attention(x)) as [B, T, H] in x.dtype.

    ``rows_live``: optional [B] bool — pad-frame compaction. Row blocks with
    no live row skip all compute and return zeros (the spatial stage's
    folded pad-frame rows are dead downstream: their only consumers are
    -1e9-masked attention keys)."""
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
    if rb is None:
        raise RuntimeError(
            f"no fused-proj row block fits scoped VMEM at (T={T}, H={H}, "
            f"{compute_dtype}); the dispatch gate (fused_proj_fits) should "
            "have kept this shape on the flash/XLA path"
        )
    pad_rows = (-B) % rb
    if pad_rows:
        x = _pad_to(x, 0, rb)
        bias_arr = _pad_to(bias_arr, 0, rb)
    Bp = B + pad_rows
    grid = (Bp // rb,)

    in_specs = [
        pl.BlockSpec((rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        _const_spec((H, 3 * H)),
        _const_spec((1, 3 * H)),
        _const_spec((H, H)),
        _const_spec((1, H)),
        pl.BlockSpec(
            (rb, 1, T, T), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [
        x,
        wqkv.astype(compute_dtype),
        jnp.reshape(bqkv, (1, 3 * H)).astype(compute_dtype),
        wo.astype(compute_dtype),
        jnp.reshape(bo, (1, H)).astype(compute_dtype),
        bias_arr,
    ]
    has_live = rows_live is not None
    if has_live:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(_block_live(rows_live, pad_rows, rb))

    out = pl.pallas_call(
        functools.partial(
            _fused_proj_attn_kernel,
            scale=scale, num_heads=num_heads,
            compute_dtype=jnp.dtype(compute_dtype), has_live=has_live,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, T, H), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return out[:B, :T0]


# --- fused layer tail: residual + LN1 -> FFN -> residual + LN2 ---------------
#
# The other half of torch.nn.TransformerEncoderLayer (post-LN, reference
# models.py passim):
#
#     u = norm1(x + attn_out)
#     o = norm2(u + linear2(act(linear1(u))))
#
# XLA materializes u ([rows, T, H]), the 4H-wide linear1 output (the largest
# activation in the model - 855 MB bf16 at the spatial bench shape), and the
# linear2 output, each with an HBM round trip. This kernel keeps all of them
# in VMEM: the grid is (row-block, ff-chunk) with the chunk axis innermost;
# chunk 0 computes u once into a scratch, every chunk contributes
# act(u @ W1[:, c]) @ W2[c, :] into an f32 accumulator scratch, and the last
# chunk adds b2, applies the residual and LN2, and writes the only HBM
# output. W1/W2 ride in VMEM per chunk; LayerNorm math follows flax.linen
# exactly (f32 stats, fast variance clipped at 0) for checkpoint parity.


def _fused_tail_kernel(
    x_ref, y_ref, n1s_ref, n1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    n2s_ref, n2b_ref, *rest,
    eps: float, compute_dtype, gelu_approximate: bool, activation: str,
    ff_chunks: int, has_live: bool = False,
):
    rest = list(rest)
    live_ref = rest.pop(0) if has_live else None
    o_ref, u_scr, acc_scr = rest
    rb, t, h = x_ref.shape
    i_row = pl.program_id(0)  # hoisted: no pl.program_id under pl.when
    c = pl.program_id(1)
    live = live_ref[i_row] != 0 if live_ref is not None else None

    def _body():
        @pl.when(c == 0)
        def _compute_u():
            # Residual add in the compute dtype (bit-matching the unfused
            # bf16 add), then flax-LayerNorm in f32. Reshape discipline: rank
            # changes happen on f32 vectors only (sublane tile 8; launcher
            # pads t to 8).
            r = x_ref[...].astype(compute_dtype) + y_ref[...].astype(compute_dtype)
            r32 = r.astype(jnp.float32).reshape(rb * t, h)
            mu = jnp.mean(r32, axis=-1, keepdims=True)
            var = jnp.maximum(
                0.0, jnp.mean(r32 * r32, axis=-1, keepdims=True) - mu * mu
            )
            mul = jax.lax.rsqrt(var + eps) * n1s_ref[0].astype(jnp.float32)
            u32 = (r32 - mu) * mul + n1b_ref[0].astype(jnp.float32)
            u_scr[...] = u32.astype(compute_dtype)

        u = u_scr[...]
        h1 = jax.lax.dot_general(
            u, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0].astype(jnp.float32)
        h1 = h1.astype(compute_dtype)
        if activation == "gelu":
            h1 = jax.nn.gelu(h1, approximate=gelu_approximate)
        elif activation == "relu":
            h1 = jax.nn.relu(h1)
        else:
            raise ValueError(activation)
        partial = jax.lax.dot_general(
            h1, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(c == 0)
        def _init_acc():
            acc_scr[...] = partial

        @pl.when(c > 0)
        def _add_acc():
            acc_scr[...] = acc_scr[...] + partial

        @pl.when(c == ff_chunks - 1)
        def _finish():
            h2 = (acc_scr[...] + b2_ref[0].astype(jnp.float32)).astype(compute_dtype)
            r2 = u_scr[...] + h2  # compute-dtype residual, as unfused
            r232 = r2.astype(jnp.float32)
            mu2 = jnp.mean(r232, axis=-1, keepdims=True)
            var2 = jnp.maximum(
                0.0, jnp.mean(r232 * r232, axis=-1, keepdims=True) - mu2 * mu2
            )
            mul2 = jax.lax.rsqrt(var2 + eps) * n2s_ref[0].astype(jnp.float32)
            y32 = (r232 - mu2) * mul2 + n2b_ref[0].astype(jnp.float32)
            o_ref[...] = y32.reshape(rb, t, h).astype(o_ref.dtype)

    if live is None:
        _body()
    else:
        pl.when(live)(_body)

        @pl.when(jnp.logical_not(live) & (c == ff_chunks - 1))
        def _dead():
            o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)


def _pick_tail_blocks(rows: int, t: int, h: int, ff: int, itemsize: int):
    """(row_block, ff_chunk) under the VMEM budget. Per program: x/y/o
    blocks + u scratch (compute dtype) + f32 accumulator + the h1 chunk
    (f32 + compute copy) + the W1/W2 chunk slabs (grid-resident per chunk)."""
    best = None
    for ffb in (ff, ff // 2, ff // 4, ff // 8):
        if not ffb or ff % ffb:
            continue
        weights = 2 * h * ffb * itemsize + (ffb + 3 * h) * itemsize
        per_row = (
            3 * t * h * itemsize      # x, y, o blocks
            + t * h * itemsize        # u scratch
            + t * h * 4               # f32 accumulator
            + t * ffb * (4 + itemsize)  # h1 chunk f32 + compute copy
            + 2 * t * h * 4           # LN temporaries
        )
        budget = 12 * 1024 * 1024 - weights
        if budget <= per_row:
            continue
        rb0 = min(budget // per_row, rows)
        if rb0 < 1:
            continue
        rb = _best_row_block(rows, rb0)
        # Prefer fewer chunks (fewer scratch round trips) as long as the
        # row block stays usefully large.
        if best is None or rb * ffb > best[0] * best[1]:
            best = (rb, ffb)
    # None = no chunking fits scoped VMEM at this shape (e.g. 512-frame
    # f32): the dispatch in models/layers.py then keeps the XLA chain.
    return best


def tail_blocks_fit(rows: int, t: int, h: int, ff: int, itemsize: int) -> bool:
    """Dispatch predicate: does any (row-block, ff-chunk) fit scoped VMEM?
    The launcher flattens tokens into rows of 8, so the fit is evaluated at
    token-count granularity — T no longer pressures VMEM (512-frame shapes
    fit)."""
    total = rows * t
    return _pick_tail_blocks(-(total // -8), 8, h, ff, itemsize) is not None


def fused_layer_tail(
    x: jnp.ndarray,
    attn_out: jnp.ndarray,
    n1_scale: jnp.ndarray,
    n1_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    n2_scale: jnp.ndarray,
    n2_bias: jnp.ndarray,
    *,
    eps: float,
    compute_dtype,
    activation: str = "gelu",
    gelu_approximate: bool = False,
    rows_live: Optional[jnp.ndarray] = None,
    tokens_live: Optional[jnp.ndarray] = None,
    blocks: Optional[tuple] = None,
) -> jnp.ndarray:
    """norm2(u + FFN(u)) for u = norm1(x + attn_out), in one kernel.
    x/attn_out: [B, T, H]; w1: [H, FF]; w2: [FF, H]. Returns [B, T, H] in
    x.dtype. Eval path only (no dropout, no backward).

    The tail has NO cross-token op (LN/FFN are per-token), so the launcher
    FLATTENS tokens into rows of 8 (the f32 sublane tile): pad waste drops
    from per-row token padding (17 -> 24 was +41%) to <= 7 tokens per batch,
    and per-block VMEM no longer scales with T (the fused tail now serves
    512-frame shapes the [B, T, H] blocking could not fit). ``rows_live``
    ([B] bool, whole input rows dead — the folded spatial stage) or
    ``tokens_live`` ([B, T] bool, ragged token validity — the temporal
    stage's pad frames) let dead row blocks skip the FFN entirely and write
    zeros (pad-frame compaction; see fused_proj_attention for why zeros are
    exact). The skip is ROW-BLOCK-granular (row_block x 8 tokens; 8-token
    groups only when row_block=1, and the picker typically covers the whole
    batch in a few blocks) — a block with any live group computes fully, so
    ragged-eval wins scale with the live-BLOCK fraction, not the live-token
    fraction."""
    B, T0, H = x.shape
    FF = w1.shape[1]
    cdtype = jnp.dtype(compute_dtype)

    tokens = B * T0
    pad_tok = (-tokens) % 8
    xf = x.reshape(tokens, H)
    af = attn_out.reshape(tokens, H)
    if pad_tok:
        xf = jnp.pad(xf, ((0, pad_tok), (0, 0)))
        af = jnp.pad(af, ((0, pad_tok), (0, 0)))
    R = (tokens + pad_tok) // 8
    xf = xf.reshape(R, 8, H)
    af = af.reshape(R, 8, H)

    live = None
    if tokens_live is not None:
        live = jnp.asarray(tokens_live, bool).reshape(tokens)
    elif rows_live is not None:
        live = jnp.repeat(jnp.asarray(rows_live, bool), T0)
    if live is not None:
        if pad_tok:
            live = jnp.pad(live, (0, pad_tok))
        live = jnp.max(live.reshape(R, 8).astype(jnp.int32), axis=1)

    T = 8
    blocks = blocks or _pick_tail_blocks(R, T, H, FF, cdtype.itemsize)
    if blocks is None:
        raise RuntimeError(
            "no tail block configuration fits scoped VMEM at "
            f"(H={H}, FF={FF}, {cdtype}); the dispatch gate "
            "(tail_blocks_fit) should have kept this shape on the XLA chain"
        )
    rb, ffb = blocks
    pad_rows = (-R) % rb
    if pad_rows:
        xf = _pad_to(xf, 0, rb)
        af = _pad_to(af, 0, rb)
    x, attn_out = xf, af
    Bp = R + pad_rows
    grid = (Bp // rb, FF // ffb)

    def row_spec():
        return pl.BlockSpec(
            (rb, T, H), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def vec_spec(width, chunked=False):
        if chunked:
            return pl.BlockSpec(
                (1, width), lambda i, c: (0, c), memory_space=pltpu.VMEM
            )
        return pl.BlockSpec(
            (1, width), lambda i, c: (0, 0), memory_space=pltpu.VMEM
        )

    in_specs = [
        row_spec(),                                   # x
        row_spec(),                                   # attn_out
        vec_spec(H), vec_spec(H),                     # norm1 scale/bias
        pl.BlockSpec((H, ffb), lambda i, c: (0, c), memory_space=pltpu.VMEM),
        vec_spec(ffb, chunked=True),                  # b1
        pl.BlockSpec((ffb, H), lambda i, c: (c, 0), memory_space=pltpu.VMEM),
        vec_spec(H),                                  # b2
        vec_spec(H), vec_spec(H),                     # norm2 scale/bias
    ]
    operands = [
        x,
        attn_out,
        jnp.reshape(n1_scale, (1, H)).astype(jnp.float32),
        jnp.reshape(n1_bias, (1, H)).astype(jnp.float32),
        w1.astype(cdtype),
        jnp.reshape(b1, (1, FF)).astype(jnp.float32),
        w2.astype(cdtype),
        jnp.reshape(b2, (1, H)).astype(jnp.float32),
        jnp.reshape(n2_scale, (1, H)).astype(jnp.float32),
        jnp.reshape(n2_bias, (1, H)).astype(jnp.float32),
    ]
    has_live = live is not None
    if has_live:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(_block_live(live, pad_rows, rb))

    out = pl.pallas_call(
        functools.partial(
            _fused_tail_kernel,
            eps=float(eps), compute_dtype=cdtype,
            gelu_approximate=bool(gelu_approximate), activation=activation,
            ff_chunks=FF // ffb, has_live=has_live,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=row_spec(),
        out_shape=jax.ShapeDtypeStruct((Bp, T, H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rb * T, H), cdtype),
            pltpu.VMEM((rb * T, H), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return out.reshape(Bp * 8, H)[:tokens].reshape(B, T0, H)


# --- train path: fused forward + fused backward ------------------------------
#
# The train step keeps the projections fused too. Forward: the same kernel
# as eval with in-kernel hashed dropout (one uint32 seed, zero mask traffic).
# Backward: one Pallas program per row block recomputes qkv/probs/keep in
# VMEM (nothing saved but the layer inputs), applies the softmax+dropout
# backward per head, and emits
#
#   dqkv  [rows, T, 3H]  (compute dtype)  - the only O(rows) buffer
#   dWo   [H, H] f32, dbo [1, H] f32      - accumulated across the grid
#                                           (@pl.when(i == 0) init, += after)
#
# The remaining three grads are single clean GEMMs XLA runs at peak from
# dqkv: dx = dqkv Wqkv^T, dWqkv = x^T dqkv, dbqkv = colsum(dqkv). This
# splits the work so the [H, 3H] f32 dW accumulator (7 MB at H=768) never
# has to share VMEM with the per-head tiles of a bigger row block.


def _fused_proj_bwd_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bias_ref, g_ref, *rest,
    scale: float, num_heads: int, compute_dtype,
    dropout_scale: float = 0.0, prng: Optional[tuple] = None,
    has_live: bool = False,
):
    rest = list(rest)
    live_ref = rest.pop(0) if has_live else None
    if prng is not None:
        seed_ref, dqkv_ref, dwo_ref, dbo_ref = rest
    else:
        dqkv_ref, dwo_ref, dbo_ref = rest
    rb, t, h = x_ref.shape
    n, d = num_heads, h // num_heads
    i_row = pl.program_id(0)  # hoisted: no pl.program_id under pl.when

    if live_ref is not None:
        # Pad-frame compaction: zero-init the grid-resident dW accumulators
        # at step 0, then each LIVE block adds its partial (0 + x == x in
        # f32, so the live-only path's numerics are unchanged); dead blocks
        # emit zero dqkv — exactly the true cotangent, since dead rows'
        # downstream consumers are -1e9-masked attention keys.
        block_live = live_ref[i_row] != 0

        @pl.when(i_row == 0)
        def _init_acc():
            dwo_ref[...] = jnp.zeros(dwo_ref.shape, dwo_ref.dtype)
            dbo_ref[...] = jnp.zeros(dbo_ref.shape, dbo_ref.dtype)

        def _live_body():
            _fused_proj_bwd_body(
                x_ref, wqkv_ref, bqkv_ref, wo_ref, bias_ref, g_ref,
                None if prng is None else seed_ref,
                dqkv_ref, dwo_ref, dbo_ref, i_row, accumulate_always=True,
                scale=scale, num_heads=num_heads, compute_dtype=compute_dtype,
                dropout_scale=dropout_scale, prng=prng,
            )

        pl.when(block_live)(_live_body)

        @pl.when(jnp.logical_not(block_live))
        def _dead():
            dqkv_ref[...] = jnp.zeros(dqkv_ref.shape, dqkv_ref.dtype)

        return

    _fused_proj_bwd_body(
        x_ref, wqkv_ref, bqkv_ref, wo_ref, bias_ref, g_ref,
        None if prng is None else seed_ref,
        dqkv_ref, dwo_ref, dbo_ref, i_row, accumulate_always=False,
        scale=scale, num_heads=num_heads, compute_dtype=compute_dtype,
        dropout_scale=dropout_scale, prng=prng,
    )


def _fused_proj_bwd_body(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bias_ref, g_ref, seed_ref,
    dqkv_ref, dwo_ref, dbo_ref, i_row, *, accumulate_always: bool,
    scale: float, num_heads: int, compute_dtype,
    dropout_scale: float, prng: Optional[tuple],
):
    rb, t, h = x_ref.shape
    n, d = num_heads, h // num_heads

    x = x_ref[...].astype(jnp.float32).reshape(rb * t, h)
    qkv = jax.lax.dot_general(
        x.astype(compute_dtype), wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv.astype(compute_dtype).astype(jnp.float32)
    bias = bias_ref[:, 0].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32).reshape(rb * t, h)
    # d(attn) through the out-projection: g @ Wo^T (f32 accumulation).
    dattn = jax.lax.dot_general(
        g.astype(compute_dtype), wo_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    outs = []
    dqs, dks, dvs = [], [], []
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
        p = jnp.exp(logits)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        do_h = dattn[:, i * d:(i + 1) * d].reshape(rb, t, d)
        dp = jax.lax.dot_general(
            do_h, v_h,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        pv = p
        if prng is not None:
            s_total, thresh = prng
            keep = _keep_block(
                seed_ref[0], i_row * rb, i, 0, 0, (rb, t, t),
                n, s_total, thresh,
            )
            keepc = keep * dropout_scale
            pv = p * keepc
            dp = dp * keepc
        outs.append(
            jax.lax.dot_general(
                pv, v_h,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        dz = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        dqs.append(
            (jax.lax.dot_general(
                dz, k_h,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale).reshape(rb * t, d)
        )
        dks.append(
            (jax.lax.dot_general(
                dz, q_h,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale).reshape(rb * t, d)
        )
        dvs.append(
            jax.lax.dot_general(
                pv, do_h,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(rb * t, d)
        )
    attn = jnp.concatenate(outs, axis=-1).reshape(rb * t, h)
    dwo_partial = jax.lax.dot_general(
        attn.astype(compute_dtype), g.astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo_partial = jnp.sum(g, axis=0, keepdims=True)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # [rb*t, 3h] f32
    dqkv_ref[...] = dqkv.reshape(rb, t, 3 * h).astype(dqkv_ref.dtype)

    if accumulate_always:
        # compaction path: accumulators were zero-initialized at step 0 by
        # the caller (possibly in a dead block), so every live block adds.
        dwo_ref[...] = dwo_ref[...] + dwo_partial
        dbo_ref[...] = dbo_ref[...] + dbo_partial
    else:
        @pl.when(i_row == 0)
        def _init():
            dwo_ref[...] = dwo_partial
            dbo_ref[...] = dbo_partial

        @pl.when(i_row > 0)
        def _accum():
            dwo_ref[...] = dwo_ref[...] + dwo_partial
            dbo_ref[...] = dbo_ref[...] + dbo_partial


def _train_operands(x, bias):
    """Shared fwd/bwd token padding: broadcast the bias and pad T to the
    f32 sublane tile (padded keys get -1e9; padded query rows are junk and
    sliced off by the callers). Returns (x_padded, bias_arr, T_padded,
    pad_t)."""
    B, T0, H = x.shape
    bias4 = None
    if bias is not None:
        bias4 = jnp.asarray(bias, jnp.float32)
        while bias4.ndim < 4:
            bias4 = bias4[None]
    bias_arr = _broadcast_bias(bias4, B, T0, T0)
    pad_t = (-T0) % 8
    T = T0 + pad_t
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        bias_arr = jnp.pad(bias_arr, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        bias_arr = jnp.pad(
            bias_arr, ((0, 0), (0, 0), (0, 0), (0, pad_t)),
            constant_values=-1e9,
        )
    return x, bias_arr, T, pad_t


def _pick_bwd_row_block(rows: int, t: int, h: int, itemsize: int) -> int:
    """The [H, H] f32 dWo accumulator and both weight slabs are grid-
    resident; the per-row backward working set is ~2.5x the forward's."""
    t_sub = -(t // -8) * 8
    s_lane = -(t // -128) * 128
    per_row = (
        3 * t_sub * h * itemsize            # x, g, dqkv-out blocks
        + t_sub * 3 * h * (4 + itemsize)    # qkv f32 + compute copy
        + t_sub * 3 * h * 4                 # dqkv f32 assembly
        + 2 * t_sub * h * 4                 # dattn + attn f32
        + 5 * t_sub * s_lane * 4            # p/dp/dz/keep/pv tiles
    )
    fixed = (3 * h + h) * h * itemsize + h * h * 4 + 8 * h * 4
    budget = 12 * 1024 * 1024 - fixed
    rb0 = min(budget // max(per_row, 1), rows)
    if rb0 < 1:
        return None
    return _best_row_block(rows, rb0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_proj_attention_train(num_heads, dropout_rate, x, wqkv, bqkv,
                               wo, bo, bias, seed, rows_live=None):
    """Differentiable fused projection+attention for the TRAIN path.
    x: [B, T, H] in the compute dtype; seed: uint32 scalar or None (no
    dropout). Same hashed keep-bit stream as ops/flash.py, so the XLA
    fallback path stays bit-compatible. ``rows_live``: optional [B] bool —
    pad-frame compaction; dead row blocks skip fwd AND bwd compute (their
    true cotangents are exactly zero: see fused_proj_attention)."""
    y, _ = _fused_proj_train_fwd(
        num_heads, dropout_rate, x, wqkv, bqkv, wo, bo, bias, seed, rows_live
    )
    return y


def _fused_proj_train_fwd(num_heads, dropout_rate, x, wqkv, bqkv, wo, bo,
                          bias, seed, rows_live=None):
    B, T0, H = x.shape
    cdtype = x.dtype
    xp, bias_arr, T, _ = _train_operands(x, bias)
    D = H // num_heads
    scale = 1.0 / (D ** 0.5)
    dropout_on = seed is not None and dropout_rate > 0.0
    dropout_scale = 1.0 / (1.0 - dropout_rate) if dropout_on else 0.0

    rb = _pick_fused_row_block(B, T, H, num_heads, jnp.dtype(cdtype).itemsize)
    if rb is None:
        raise RuntimeError(
            "no fused-train row block fits scoped VMEM; the dispatch gate "
            "(fused_train_fits) should have kept this shape on the XLA chain"
        )
    pad_rows = (-B) % rb
    if pad_rows:
        xp = _pad_to(xp, 0, rb)
        bias_arr = _pad_to(bias_arr, 0, rb)
    Bp = B + pad_rows

    in_specs = [
        pl.BlockSpec((rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        _const_spec((H, 3 * H)),
        _const_spec((1, 3 * H)),
        _const_spec((H, H)),
        _const_spec((1, H)),
        pl.BlockSpec((rb, 1, T, T), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        xp,
        wqkv.astype(cdtype),
        jnp.reshape(bqkv, (1, 3 * H)).astype(cdtype),
        wo.astype(cdtype),
        jnp.reshape(bo, (1, H)).astype(cdtype),
        bias_arr,
    ]
    # Operand order must match the kernel's `rest` unpacking: live flags
    # (if any) BEFORE the seed, both before the output.
    has_live = rows_live is not None
    if has_live:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(_block_live(rows_live, pad_rows, rb))
    prng = None
    if dropout_on:
        prng = (T0, _dropout_thresh(dropout_rate))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.reshape(seed, (1,)).astype(jnp.uint32))

    out = pl.pallas_call(
        functools.partial(
            _fused_proj_attn_kernel,
            scale=scale, num_heads=num_heads, compute_dtype=jnp.dtype(cdtype),
            dropout_scale=dropout_scale, prng=prng, has_live=has_live,
        ),
        grid=(Bp // rb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, T, H), cdtype),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return out[:B, :T0], (x, wqkv, bqkv, wo, bias, seed, rows_live)


def _fused_proj_train_bwd(num_heads, dropout_rate, residuals, g):
    x, wqkv, bqkv, wo, bias, seed, rows_live = residuals
    B, T0, H = x.shape
    cdtype = x.dtype
    xp, bias_arr, T, pad_t = _train_operands(x, bias)
    D = H // num_heads
    scale = 1.0 / (D ** 0.5)
    dropout_on = seed is not None and dropout_rate > 0.0
    dropout_scale = 1.0 / (1.0 - dropout_rate) if dropout_on else 0.0

    gp = g
    if pad_t:
        gp = jnp.pad(gp, ((0, 0), (0, pad_t), (0, 0)))

    rb = _pick_bwd_row_block(B, T, H, jnp.dtype(cdtype).itemsize)
    if rb is None:
        raise RuntimeError(
            "no fused-train backward row block fits scoped VMEM; the dispatch "
            "gate (fused_train_fits) should have kept this shape on the XLA "
            "chain"
        )
    pad_rows = (-B) % rb
    if pad_rows:
        xp = _pad_to(xp, 0, rb)
        gp = _pad_to(gp, 0, rb)
        bias_arr = _pad_to(bias_arr, 0, rb)
    Bp = B + pad_rows

    in_specs = [
        pl.BlockSpec((rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        _const_spec((H, 3 * H)),
        _const_spec((1, 3 * H)),
        _const_spec((H, H)),
        pl.BlockSpec((rb, 1, T, T), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        xp,
        wqkv.astype(cdtype),
        jnp.reshape(bqkv, (1, 3 * H)).astype(cdtype),
        wo.astype(cdtype),
        bias_arr,
        gp.astype(cdtype),
    ]
    has_live = rows_live is not None
    if has_live:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(_block_live(rows_live, pad_rows, rb))
    prng = None
    if dropout_on:
        prng = (T0, _dropout_thresh(dropout_rate))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.reshape(seed, (1,)).astype(jnp.uint32))

    dqkv, dwo, dbo = pl.pallas_call(
        functools.partial(
            _fused_proj_bwd_kernel,
            scale=scale, num_heads=num_heads, compute_dtype=jnp.dtype(cdtype),
            dropout_scale=dropout_scale, prng=prng, has_live=has_live,
        ),
        grid=(Bp // rb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((rb, T, 3 * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, T, 3 * H), cdtype),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(*operands)

    dqkv = dqkv[:B, :T0]                        # [B, T0, 3H]
    dqkv2 = dqkv.reshape(B * T0, 3 * H)
    x2 = x.reshape(B * T0, H).astype(cdtype)
    # The three clean GEMMs stay in XLA (they run at MXU peak and their
    # operands are already in HBM): dx, dWqkv, dbqkv.
    dx = jax.lax.dot_general(
        dqkv2, wqkv.astype(cdtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(B, T0, H).astype(x.dtype)
    dwqkv = jax.lax.dot_general(
        x2, dqkv2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv = jnp.sum(dqkv2.astype(jnp.float32), axis=0)
    return (dx, dwqkv, dbqkv, dwo, dbo[0], None, None, None)


fused_proj_attention_train.defvjp(_fused_proj_train_fwd, _fused_proj_train_bwd)


# --- fused cross-attention (eval) --------------------------------------------
#
# Same design as the self-attention kernel, for the fusion models'
# CrossAttentionLayer (reference models.py:367-388): queries project from
# x, keys/values from a different context sequence. One program per row
# block computes q = x W_q, kv = ctx W_kv, per-head attention over the
# [T, S] tile and the out-projection — with this, every attention in every
# model runs fused on the eval path.


def _fused_cross_attn_kernel(
    x_ref, ctx_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
    bias_ref, o_ref, *, scale: float, num_heads: int, compute_dtype,
):
    rb, t, h = x_ref.shape
    s = ctx_ref.shape[1]
    n, d = num_heads, h // num_heads
    x = x_ref[...].astype(jnp.float32).reshape(rb * t, h)
    ctx = ctx_ref[...].astype(jnp.float32).reshape(rb * s, h)
    q = jax.lax.dot_general(
        x.astype(compute_dtype), wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0].astype(jnp.float32)
    q = q.astype(compute_dtype).astype(jnp.float32)
    kv = jax.lax.dot_general(
        ctx.astype(compute_dtype), wkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bkv_ref[0].astype(jnp.float32)
    kv = kv.astype(compute_dtype).astype(jnp.float32)
    bias = bias_ref[:, 0].astype(jnp.float32)
    outs = []
    for i in range(n):
        q_h = q[:, i * d:(i + 1) * d].reshape(rb, t, d)
        k_h = kv[:, i * d:(i + 1) * d].reshape(rb, s, d)
        v_h = kv[:, h + i * d:h + (i + 1) * d].reshape(rb, s, d)
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
    y = jax.lax.dot_general(
        attn.astype(compute_dtype), wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)
    o_ref[...] = y.reshape(rb, t, h).astype(o_ref.dtype)


def fused_cross_attention(
    x: jnp.ndarray,
    ctx: jnp.ndarray,
    wq: jnp.ndarray,
    bq: jnp.ndarray,
    wkv: jnp.ndarray,
    bkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    num_heads: int,
    compute_dtype,
) -> jnp.ndarray:
    """Cross-attention sublayer in one kernel. x: [B, T, H] queries;
    ctx: [B, S, H] keys/values; wkv: [H, 2H] (k and v kernels concatenated).
    bias broadcastable to [B, 1, T, S], head-invariant. Eval only."""
    B, T0, H = x.shape
    S0 = ctx.shape[1]
    assert H % num_heads == 0
    D = H // num_heads
    scale = 1.0 / (D ** 0.5)
    cdtype = jnp.dtype(compute_dtype)

    bias4 = None
    if bias is not None:
        bias4 = jnp.asarray(bias, jnp.float32)
        while bias4.ndim < 4:
            bias4 = bias4[None]
        assert bias4.shape[1] == 1
    bias_arr = _broadcast_bias(bias4, B, T0, S0)

    pad_t, pad_s = (-T0) % 8, (-S0) % 8
    T, S = T0 + pad_t, S0 + pad_s
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        bias_arr = jnp.pad(bias_arr, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
    if pad_s:
        ctx = jnp.pad(ctx, ((0, 0), (0, pad_s), (0, 0)))
        bias_arr = jnp.pad(
            bias_arr, ((0, 0), (0, 0), (0, 0), (0, pad_s)),
            constant_values=-1e9,
        )

    rb = _pick_cross_row_block(B, T, S, H, num_heads, cdtype.itemsize)
    if rb is None:
        raise RuntimeError(
            f"no cross-attention row block fits scoped VMEM at (T={T}, "
            f"S={S}, H={H}, {cdtype}); the dispatch gate (fused_cross_fits) "
            "should have kept this shape on the flash/XLA path"
        )
    pad_rows = (-B) % rb
    if pad_rows:
        x = _pad_to(x, 0, rb)
        ctx = _pad_to(ctx, 0, rb)
        bias_arr = _pad_to(bias_arr, 0, rb)
    Bp = B + pad_rows

    out = pl.pallas_call(
        functools.partial(
            _fused_cross_attn_kernel,
            scale=scale, num_heads=num_heads, compute_dtype=cdtype,
        ),
        grid=(Bp // rb,),
        in_specs=[
            pl.BlockSpec((rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _const_spec((H, H)),
            _const_spec((1, H)),
            _const_spec((H, 2 * H)),
            _const_spec((1, 2 * H)),
            _const_spec((H, H)),
            _const_spec((1, H)),
            pl.BlockSpec((rb, 1, T, S), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, T, H), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(
        x,
        ctx,
        wq.astype(cdtype),
        jnp.reshape(bq, (1, H)).astype(cdtype),
        wkv.astype(cdtype),
        jnp.reshape(bkv, (1, 2 * H)).astype(cdtype),
        wo.astype(cdtype),
        jnp.reshape(bo, (1, H)).astype(cdtype),
        bias_arr,
    )
    return out[:B, :T0]
