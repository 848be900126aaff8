"""Fused attention Pallas kernels for TPU.

The TPU-native replacement for the attention math inside
``torch.nn.MultiheadAttention`` (reference models.py passim). Two regimes:

1. **Row-blocked fully-fused kernel** (short sequences — 8 box
   tokens/frame spatial, 17 frames temporal, 33 appearance tokens): grid
   over (batch-blocks × heads); each program loads a ``[Rb, T, D]`` q block
   plus the matching k/v blocks into VMEM, computes QKᵀ·scale + bias →
   softmax → PV entirely on-chip (f32 accumulation), and writes only the
   output block. The ``[*, T, S]`` probability tensor never touches HBM —
   that's the bandwidth the XLA path spends at these shapes.
2. **Blockwise (KV-loop) kernel** (long context — the 256-frame path and
   beyond, SURVEY.md §5 long-context row): grid adds (q-block × kv-block)
   dims with the kv loop innermost; running max / sum / accumulator live in
   VMEM scratch (classic online softmax), so VMEM usage is O(Tb·Sb), not
   O(T·S) — sequence length is bounded by HBM, not VMEM. Dispatch is by
   sequence length (``_BLOCKWISE_MIN_SEQ``).

Bias convention everywhere: additive f32, broadcastable to [B, N, T, S];
masked entries use a large-negative finite value (NaN-free by construction —
the causal mask semantics of reference ``utils/model_utils.py:4-7``).

Backward:

- short sequences: a fused recompute kernel (``_fused_bwd_kernel``) — one
  program per (row-block, head) recomputes softmax in VMEM and emits
  dq/dk/dv, so probabilities stay out of HBM in the backward too (the
  round-2 design recomputed through XLA, materializing [B, N, T, S] twice
  per layer; replacing it measured +5.6% on the real train loop, and
  together with hashed-seed dropout the round-3 train path went
  3373 → 4258 clips/s);
- blockwise-dispatched sequences: a pair of KV-loop Pallas kernels (dq with
  the KV loop innermost; dk/dv with the Q loop innermost) recompute each
  probability block from the forward's saved logsumexp, so the [B, N, T, S]
  probability tensor never exists in HBM during TRAINING either — the
  long-context memory story holds end to end, not just for eval
  (tests/test_flash_kernel.py asserts grad parity at T=S>=513 and
  tests/test_long_context_memory.py asserts the compiled train step's HBM
  drop vs the recompute backward).

Kernel-vs-reference numerics: tests/test_flash_kernel.py.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --- counter-based in-kernel dropout bits -----------------------------------
#
# The train path's attention-probability dropout needs one keep-bit per
# (b, n, t, s). Round 2 sampled a [B, N, T, S] mask on the host side of the
# kernel and shipped it through HBM every step — O(T²) bytes, the next
# long-context blocker after the blockwise backward. Instead, the kernels
# derive the bit from a COUNTER-BASED HASH of (seed, b, n, t, s): stateless,
# identical in forward and both backward kernels by construction (no stream
# to keep aligned), platform-independent (plain uint32 VPU ops — unlike
# pltpu.prng_random_bits, which the CPU interpreter stubs to zeros), and
# reconstructible in XLA (`hash_keep_mask`) so tests can compare the fused
# kernel against the reference path bit-for-bit. The mix is lowbias32
# (a full-avalanche 32-bit permutation); keep = hash >= rate·2³².


def _lowbias32(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _dropout_thresh(rate: float) -> int:
    # Plain Python int: it travels into kernels as a static closure literal
    # (a captured jax array would trip pallas's no-captured-constants rule).
    return min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1)


def _keep_block(seed, b0, n, t0, s0, shape, num_heads, s_total, thresh):
    """Keep-mask block [rb, tb, sb] (f32 0/1) for global offsets (b0, t0, s0),
    head n. ``s_total`` is the UNPADDED key length — the element counter is
    t·S + s, so padded tails merely collide into sliced-off rows."""
    rb, tb, sb = shape
    b_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(b0)
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(t0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 2) + jnp.uint32(s0)
    lane = _lowbias32((b_ids * jnp.uint32(num_heads) + jnp.uint32(n)) ^ seed)
    h = _lowbias32((rows * jnp.uint32(s_total) + cols) ^ lane)
    return (h >= jnp.uint32(thresh)).astype(jnp.float32)


def hash_keep_mask(seed, B, N, T, S, rate):
    """XLA reconstruction of the kernels' in-kernel dropout bits:
    [B, N, T, S] f32 0/1. Used by the short-path backward (where the mask is
    small) and by parity tests; NOT materialized on the blockwise path."""
    seed = jnp.asarray(seed, jnp.uint32)
    thresh = _dropout_thresh(rate)
    bn = (
        jnp.arange(B, dtype=jnp.uint32)[:, None] * jnp.uint32(N)
        + jnp.arange(N, dtype=jnp.uint32)[None, :]
    )
    lane = _lowbias32(bn ^ seed)  # [B, N]
    ctr = (
        jnp.arange(T, dtype=jnp.uint32)[:, None] * jnp.uint32(S)
        + jnp.arange(S, dtype=jnp.uint32)[None, :]
    )
    h = _lowbias32(ctr[None, None] ^ lane[:, :, None, None])
    return (h >= thresh).astype(jnp.float32)


def _fused_attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, *rest, scale: float,
    dropout_scale: float = 0.0, prng: Optional[tuple] = None,
):
    # q_ref: [Rb, 1, T, D]; k_ref/v_ref: [Rb, 1, S, D]; bias_ref: [Rb, 1, T, S]
    # Dropout: either a mask operand (rest = (mask_ref, o_ref)) or in-kernel
    # hash bits (prng = (num_heads, s_total, thresh); rest = (seed_ref, o_ref)).
    if dropout_scale and prng is not None:
        seed_ref, o_ref = rest
    elif dropout_scale:
        mask_ref, o_ref = rest
    else:
        (o_ref,) = rest
    q = q_ref[:, 0].astype(jnp.float32)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # batched over Rb
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale + bias_ref[:, 0].astype(jnp.float32)
    logits -= jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    if dropout_scale:
        # PyTorch MHA drops NORMALIZED probabilities, scaled by 1/(1-rate).
        if prng is not None:
            num_heads, s_total, thresh = prng
            rb, t, s = probs.shape
            keep = _keep_block(
                seed_ref[0], pl.program_id(0) * rb, pl.program_id(1), 0, 0,
                (rb, t, s), num_heads, s_total, thresh,
            )
        else:
            keep = mask_ref[:, 0].astype(jnp.float32)
        probs = probs * (keep * dropout_scale)
    out = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, 0] = out.astype(o_ref.dtype)


def _fused_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, *rest, scale: float,
    dropout_scale: float = 0.0, prng: Optional[tuple] = None,
):
    """Fused dq/dk/dv for one (row-block, head) — the whole [T, S] tile in
    VMEM, softmax recomputed in place (no saved residuals). Replaces the
    round-2 XLA recompute backward, which materialized the [B, N, T, S]
    probability tensor in HBM twice per layer (recompute + vjp) and issued
    the five attention matmuls as separate fusions. Same math as
    ``_blockwise_dq_kernel``/``_blockwise_dkdv_kernel`` without the KV loop:
    with keepc the scaled keep mask, dPv = (dO Vᵀ)∘keepc,
    dz = p∘(dPv − rowsum(p∘dPv)), dq = dz K·scale, dk = dzᵀ Q·scale,
    dv = (p∘keepc)ᵀ dO."""
    if dropout_scale and prng is not None:
        seed_ref, dq_ref, dk_ref, dv_ref = rest
    elif dropout_scale:
        mask_ref, dq_ref, dk_ref, dv_ref = rest
    else:
        dq_ref, dk_ref, dv_ref = rest
    q = q_ref[:, 0].astype(jnp.float32)    # [rb, T, D]
    k = k_ref[:, 0].astype(jnp.float32)    # [rb, S, D]
    v = v_ref[:, 0].astype(jnp.float32)
    do = do_ref[:, 0].astype(jnp.float32)  # [rb, T, D]
    z = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[:, 0].astype(jnp.float32)
    z -= jnp.max(z, axis=-1, keepdims=True)
    p = jnp.exp(z)
    p = p / jnp.sum(p, axis=-1, keepdims=True)          # [rb, T, S]
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    pv = p
    if dropout_scale:
        if prng is not None:
            num_heads, s_total, thresh = prng
            rb, t, s = p.shape
            keep = _keep_block(
                seed_ref[0], pl.program_id(0) * rb, pl.program_id(1), 0, 0,
                (rb, t, s), num_heads, s_total, thresh,
            )
        else:
            keep = mask_ref[:, 0].astype(jnp.float32)
        keepc = keep * dropout_scale
        pv = p * keepc
        dp = dp * keepc
    # dv = pvᵀ dO: contract the query dimension (axis 1 of both).
    dv_ref[:, 0] = jax.lax.dot_general(
        pv, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dz = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq_ref[:, 0] = (jax.lax.dot_general(
        dz, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dq_ref.dtype)
    dk_ref[:, 0] = (jax.lax.dot_general(
        dz, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dk_ref.dtype)


def _pick_row_block(
    rows: int, t: int, s: int, d: int, *, masked: bool = False,
    bwd: bool = False,
) -> int:
    """Batch rows per program, sized by a VMEM target.

    Eval (no dropout mask): 4 MB. Measured on the spatial shape (17408 rows
    × 8 tokens, 12 heads): 1 MB → 7.89 ms, 2 MB → 7.34, 4 MB → 7.05, 8 MB →
    6.99; ×2 double-buffering still fits VMEM at every dispatched shape.
    Train (mask operand present): the bigger blocks REGRESS the real CLI
    loop (2560 vs 2926 clips/s at B=512), so the masked path keeps 1 MB.
    The residual eval cost is the per-row mini-matmul issue rate (B·N·2 MXU
    ops), which block-diagonal clip packing does NOT fix (measured 11.1 ms
    at every pack factor — see PERF_NOTES).

    ``bwd`` sizes for the fused backward kernel instead: ~2× the operand
    blocks (dO plus the three gradient outputs), ~2× the [t, s]
    intermediates (z/p/dP/dz live simultaneously), and the 1 MB train
    target unconditionally — measured on the real CLI loop at B=512:
    1 MB → 4258 clips/s, 4 MB → 3729 (the same direction as the masked
    forward; the train step wants small kernel working sets that overlap
    with the surrounding fusions).

    The caller PADS the row axis to a multiple of the returned block (the
    padded rows are sliced off after the call), so awkward row counts no
    longer silently degrade to rb=1 (round-2 weakness: CLI batch 1000 →
    17000 rows walked the old divisor search down to 8). Within
    [target/2, target] the block minimizing pad waste is chosen — e.g.
    17000 rows → rb=100 with zero padding."""
    row_blocks = 7 if bwd else 4       # q,k,v,dO,dq,dk,dv vs q,k,v,out
    ts_interm = 4 if bwd else 2        # z/p/dP/dz vs bias+probs scratch
    bytes_per_row = (row_blocks * (t + s) * d // 2 + ts_interm * t * s) * 4
    target = (1 if (masked or bwd) else 4) * 1024 * 1024
    rb0 = max(1, min(target // max(bytes_per_row, 1), rows))
    # Hard safety cap from the TILED footprint: VMEM blocks pad the last
    # axis to 128 lanes and the one before to 8 sublanes, so small t/s/d
    # inflate the real allocation far past the nominal estimate (observed:
    # t=s=4, d=8 → 16× → scoped-VMEM OOM on hardware at rb=rows). Bound the
    # per-program padded bytes (q + k + v + bias + probs scratch + out,
    # mask if present) by 14 MB of the 16 MB scoped limit. At the measured
    # production shapes (t=s=8, d=64) the cap sits above the 4 MB-target
    # choice, so tuned blocks are unchanged.
    t_sub, s_sub = -(t // -8) * 8, -(s // -8) * 8          # sublane axes
    s_lane, d_lane = -(s // -128) * 128, -(d // -128) * 128  # lane axes
    padded_per_row = (
        (4 if bwd else 2) * t_sub * d_lane   # q(+dO, dq) and out blocks
        + (4 if bwd else 2) * s_sub * d_lane  # k, v (+dk, dv) blocks
        + (1 + ts_interm) * t_sub * s_lane    # bias block + intermediates
        + (t_sub * s_lane if masked else 0)
    ) * 4
    rb_safe = max(1, (14 * 1024 * 1024) // padded_per_row)
    rb0 = min(rb0, rb_safe)
    # (pad waste, prefer larger block) over the half-to-full target range.
    rb = min(range(max(1, rb0 // 2), rb0 + 1), key=lambda r: ((-rows) % r, -r))
    pad = (-rows) % rb
    logging.debug(
        "flash row block: rows=%d t=%d s=%d -> rb=%d (pad %d rows)",
        rows, t, s, rb, pad,
    )
    if pad * 20 > rows:
        logging.warning(
            "flash row block %d pads %d->%d rows (>5%% wasted compute); "
            "consider a batch size whose row count divides more evenly",
            rb, rows, rows + pad,
        )
    return rb


# Sequences above this take the blockwise (KV-loop) kernel. Below it the
# fully-fused kernel wins: a [T, S] f32 probability tile still fits VMEM
# comfortably (513² x 4B ≈ 1 MB) and blockwise's pad-to-128 on BOTH axes
# wastes real compute at non-multiple lengths (e.g. 257→384 = 2.2x; measured
# 370 vs 509 clips/s on the 256-frame workload before this threshold).
_BLOCKWISE_MIN_SEQ = 513
_Q_BLOCK = 128
_NEG_INF = -1e30  # finite: exp(-1e30 - m) == 0 without inf-inf NaNs


def _pick_kv_block(s: int) -> int:
    """Shape-keyed KV block choice (replaces a frozen constant).

    Measured at the 512-frame workload (S=514): 128 → 176 clips/s, 256 →
    207, 384 → 228, 512 → 224. The KV-loop iteration overhead outweighs
    pad-waste (384 pads 514→768 keys yet beats 128's 640), so prefer fewer,
    larger KV steps — UNTIL the block's padding blows past ~1.55× the real
    key count (512's 514→1024 = 1.99× loses to 384). The rule reproduces
    every measured ranking and generalizes it to shapes the constant was
    never tuned for; the choice is logged so odd shapes are diagnosable."""
    candidates = (512, 384, 256, 128)
    for b in candidates:
        padded = -(s // -b) * b
        if padded <= 1.55 * s:
            choice = b
            break
    else:
        choice = min(candidates, key=lambda b: -(s // -b) * b)
    logging.debug("flash kv block: S=%d -> %d", s, choice)
    return choice


def _causal_live(t_blk, s_blk, tb: int, sb: int):
    """False iff the (q-block, kv-block) pair is ENTIRELY above the causal
    diagonal (min key index > max query index) — every logit in it carries
    the large-negative causal bias, so p = 0 and the block contributes
    nothing to l/acc or any gradient. Skipping it saves the MXU work
    (~30-45% of blocks at square causal shapes, granularity permitting).
    Block (t, 0) is never skipped, so no row's l can end up 0."""
    return s_blk * sb <= (t_blk + 1) * tb - 1


def _keep_block_heads(seed, b, n0, t0, s0, shape, num_heads, s_total, thresh):
    """Keep-mask block [hb, tb, sb] for one batch row, heads n0..n0+hb-1
    (head index on dim 0) — the same bit stream as hash_keep_mask."""
    n_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(n0)
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(t0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 2) + jnp.uint32(s0)
    lane = _lowbias32((jnp.uint32(b) * jnp.uint32(num_heads) + n_ids) ^ seed)
    h = _lowbias32((rows * jnp.uint32(s_total) + cols) ^ lane)
    return (h >= jnp.uint32(thresh)).astype(jnp.float32)


def _block_bias(bias_ref, lengths_bias, causal, b_i, t_i, s_i, shape,
                off_base=None, valid_cols=None):
    """The additive bias tile for one (t, s) block: read from the dense
    [*, bn, tb, sb] operand, or GENERATED from the clip's kv length (the
    whole [B] int32 vector rides in SMEM un-blocked — TPU lowering rejects
    rank-1 sub-array blocks — and each program reads its own element) + the
    causal rule. The lengths mode is what removes the last O(T²) HBM buffer
    from the long-context path (the [B, 1, T, S] bias).

    ``off_base`` (static int): the ring (sequence-parallel) variant — the
    lengths SMEM vector carries two extra elements [row_offset, col_offset]
    at indices off_base/off_base+1 (traced per ring step: the device's query
    rows start at row_offset globally, the K/V chunk it currently holds at
    col_offset). ``valid_cols`` (static int) additionally masks the chunk's
    sb-padding columns, whose GLOBAL index would alias into the next chunk's
    range (single-device callers don't need this: there col >= S >= length)."""
    if not lengths_bias:
        return bias_ref[0].astype(jnp.float32)
    tb, sb = shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (tb, sb), 0) + t_i * tb
    local_cols = jax.lax.broadcasted_iota(jnp.int32, (tb, sb), 1) + s_i * sb
    cols = local_cols
    if off_base is not None:
        rows = rows + bias_ref[off_base]
        cols = local_cols + bias_ref[off_base + 1]
    valid = cols < bias_ref[b_i]
    if valid_cols is not None:
        valid = valid & (local_cols < valid_cols)
    if causal:
        valid = valid & (cols <= rows)
    # [tb, sb], broadcasts over the head axis of the logits.
    return jnp.where(valid, 0.0, _NEG_INF)


def _causal_live_off(t_blk, s_blk, tb: int, sb: int, bias_ref, off_base: int):
    """Traced ring-step variant of ``_causal_live``: the block pair is live
    iff its min GLOBAL key index <= its max GLOBAL query index. Block s=0 is
    forced live in the FORWARD kernel (caller ORs ``s_blk == 0``) so no row's
    softmax denominator is 0 — an all-masked s=0 block contributes finite
    exp(-1e30)-scale terms that the cross-chunk lse merge then wipes."""
    return (
        s_blk * sb + bias_ref[off_base + 1]
        <= (t_blk + 1) * tb - 1 + bias_ref[off_base]
    )


def _blockwise_attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, *rest,
    scale: float, num_kv_blocks: int, dropout_scale: float = 0.0,
    prng: Optional[tuple] = None, causal: bool = False,
    lengths_bias: bool = False, off_base: Optional[int] = None,
    valid_cols: Optional[int] = None,
):
    """Blockwise forward, ALL HEADS per program.

    Round-3 regime analysis (PERF_NOTES "causal block skipping"): at the
    512-frame shapes the old one-head-per-program grid spent ~12 µs of
    per-program overhead on ~0.05 µs of MXU work and re-read the
    head-collapsed bias tile once per head. Folding the head axis into the
    block cuts program count by N and reads the bias ONCE per (b, t, s) —
    the matmuls stay a single Mosaic-legal batched dot (batch dim = heads;
    the round-2 rejection was a per-head LOOP at short sequences, a
    different design in a different regime).

    q_ref: [1, N, Tb, D]; k/v: [1, N, Sb, D]; bias: [1, bn, Tb, Sb] (bn ∈
    {1, N}, broadcast); outputs o [1, N, Tb, D] + lse [1, N, Tb, 1];
    scratch m/l [N, Tb], acc [N, Tb, D]. Dropout: mask operand or in-kernel
    hash bits (prng = (num_heads, s_total, thresh))."""
    if dropout_scale and prng is not None:
        seed_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    elif dropout_scale:
        mask_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    b_i = pl.program_id(0)
    t_i = pl.program_id(1)
    s_i = pl.program_id(2)

    @pl.when(s_i == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, _NEG_INF, m_ref.dtype)
        l_ref[...] = jnp.zeros(l_ref.shape, l_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def _compute():
        q = q_ref[0].astype(jnp.float32)   # [N, tb, D]
        k = k_ref[0].astype(jnp.float32)   # [N, sb, D]
        v = v_ref[0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # batch = heads
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale + _block_bias(
            bias_ref, lengths_bias, causal, b_i, t_i, s_i,
            (q_ref.shape[2], k_ref.shape[2]),
            off_base=off_base, valid_cols=valid_cols,
        )
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        corr = jnp.exp(m_prev - m_new)
        # The softmax denominator accumulates UNDROPPED probabilities
        # (dropout applies after normalization); only PV is dropped.
        l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=-1)
        pv = p
        if dropout_scale:
            if prng is not None:
                num_heads, s_total, thresh = prng
                keep = _keep_block_heads(
                    seed_ref[0], b_i, 0, t_i * p.shape[1], s_i * p.shape[2],
                    p.shape, num_heads, s_total, thresh,
                )
            else:
                keep = mask_ref[0].astype(jnp.float32)
            pv = p * (keep * dropout_scale)
        acc_ref[...] = acc_ref[...] * corr[..., None] + jax.lax.dot_general(
            pv, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = m_new

    # Dead-q-block skip (lengths mode, non-ring): a q block whose first row
    # is at or past the clip's length is entirely pad frames — its outputs
    # are never read downstream (causal+padding masking zeroes its attention
    # weight as a key, and its cotangents are zero by induction from the
    # loss, which reads only the extract row). Skip ALL its KV iterations
    # and write zeros + lse 0 at finish (the live path would divide by
    # l = 0). Ring steps (off_base) keep full compute: their q rows are
    # device-local chunks merged across devices by lse.
    tb_sz, sb_sz = q_ref.shape[2], k_ref.shape[2]
    q_alive = None
    if lengths_bias and off_base is None:
        q_alive = t_i * tb_sz < bias_ref[b_i]

    if causal and off_base is not None:
        live = (s_i == 0) | _causal_live_off(
            t_i, s_i, tb_sz, sb_sz, bias_ref, off_base
        )
        pl.when(live)(_compute)
    elif causal:
        live = _causal_live(t_i, s_i, tb_sz, sb_sz)
        if q_alive is not None:
            live = live & q_alive
        pl.when(live)(_compute)
    elif q_alive is not None:
        pl.when(q_alive)(_compute)
    else:
        _compute()

    if q_alive is None:
        @pl.when(s_i == num_kv_blocks - 1)
        def _finish():
            o_ref[0] = (acc_ref[...] / l_ref[...][..., None]).astype(o_ref.dtype)
            lse_ref[0, :, :, 0] = m_ref[...] + jnp.log(l_ref[...])
    else:
        @pl.when((s_i == num_kv_blocks - 1) & q_alive)
        def _finish_live():
            o_ref[0] = (acc_ref[...] / l_ref[...][..., None]).astype(o_ref.dtype)
            lse_ref[0, :, :, 0] = m_ref[...] + jnp.log(l_ref[...])

        @pl.when((s_i == num_kv_blocks - 1) & jnp.logical_not(q_alive))
        def _finish_dead():
            o_ref[0] = jnp.zeros(o_ref.shape[1:], o_ref.dtype)
            lse_ref[0] = jnp.zeros(lse_ref.shape[1:], lse_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _blockwise_block_sizes(T: int, S: int):
    # Q blocks need only sublane (x8) alignment, so pick the multiple-of-8
    # size minimizing row padding (largest such block on ties); KV blocks
    # are the lane dim of the bias/mask tiles and must stay x128.
    sb = min(_pick_kv_block(S), S)
    tb = min(
        range(8, _Q_BLOCK + 1, 8),
        key=lambda t: (-(T // -t) * t - T, -t),  # (ceil-pad waste, prefer big)
    )
    return tb, sb


def _blockwise_forward(qt, kt, vt, bias_arr, mask=None, dropout_scale=0.0,
                       seed=None, dropout_rate=0.0, causal=False,
                       kv_lengths=None, offsets=None):
    """Long-context path. qt/kt/vt: [B, N, T/S, D]; bias via EITHER a dense
    ``bias_arr`` [B, bn, T, S] OR ``kv_lengths`` [B] int32 (+ ``causal``) —
    the lengths mode generates the key-padding/causal bias IN-KERNEL from
    iota comparisons, so no [B, 1, T, S] buffer exists at all. Dropout via
    EITHER ``mask`` ([B, mn, T, S] keep mask) OR ``seed`` (uint32 scalar ->
    in-kernel hash bits). ``offsets`` (lengths mode only): a traced int32
    [2] = [row_offset, col_offset] — the ring (sequence-parallel) caller's
    global coordinates for this device's query rows / the K/V chunk it
    currently holds (ops/ring.py). Returns (out [B, N, T, D],
    lse [B, N, T])."""
    B, N, T, D = qt.shape
    S = kt.shape[2]
    scale = 1.0 / (D ** 0.5)
    out_dtype = vt.dtype
    lengths_bias = kv_lengths is not None
    assert offsets is None or lengths_bias, "offsets require kv_lengths"

    tb, sb = _blockwise_block_sizes(T, S)
    # Pad to block multiples: padded KV columns get large-negative bias
    # (contribute exp(.)=0; in lengths mode col >= S >= length masks them);
    # padded Q rows get bias 0 (garbage rows, sliced off after the call —
    # never NaN because l >= exp(0) > 0).
    qt = _pad_to(qt, 2, tb)
    kt = _pad_to(kt, 2, sb)
    vt = _pad_to(vt, 2, sb)
    if not lengths_bias:
        bias_arr = _pad_to(bias_arr, 3, sb, value=_NEG_INF)
        bias_arr = _pad_to(bias_arr, 2, tb, value=0.0)
    if mask is not None:
        mask = _pad_to(_pad_to(mask, 3, sb), 2, tb)
    Tp, Sp = qt.shape[2], kt.shape[2]

    grid = (B, Tp // tb, Sp // sb)

    q_spec = pl.BlockSpec(
        (1, N, tb, D), lambda b, t, s: (b, 0, t, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, N, sb, D), lambda b, t, s: (b, 0, s, 0), memory_space=pltpu.VMEM
    )

    def nts_spec(n_dim):
        return pl.BlockSpec(
            (1, n_dim, tb, sb), lambda b, t, s: (b, 0, t, s),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (1, N, tb, D), lambda b, t, s: (b, 0, t, 0), memory_space=pltpu.VMEM
    )
    lse_spec = pl.BlockSpec(
        (1, N, tb, 1), lambda b, t, s: (b, 0, t, 0), memory_space=pltpu.VMEM
    )

    off_base = valid_cols = None
    if lengths_bias:
        # Whole [B] vector un-blocked in SMEM (TPU lowering rejects rank-1
        # sub-array blocks); each program indexes its own element by b_i.
        bias_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        bias_operand = jnp.asarray(kv_lengths, jnp.int32)
        if offsets is not None:
            # Ring step: [row0, col0] ride in the same SMEM vector past the
            # lengths; padded chunk columns must be masked by LOCAL index
            # (their global index aliases into the next chunk's range).
            bias_operand = jnp.concatenate(
                [bias_operand, jnp.asarray(offsets, jnp.int32).reshape(2)]
            )
            off_base, valid_cols = B, S
    else:
        bias_spec = nts_spec(bias_arr.shape[1])
        bias_operand = bias_arr
    in_specs = [q_spec, kv_spec, kv_spec, bias_spec]
    operands = [qt, kt, vt, bias_operand]
    prng = None
    if mask is not None:
        in_specs.append(nts_spec(mask.shape[1]))
        operands.append(mask)
    elif seed is not None:
        prng = (N, S, _dropout_thresh(dropout_rate))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.reshape(seed, (1,)).astype(jnp.uint32))

    out, lse = pl.pallas_call(
        functools.partial(
            _blockwise_attn_kernel,
            scale=scale,
            num_kv_blocks=Sp // sb,
            dropout_scale=dropout_scale,
            prng=prng,
            causal=causal,
            lengths_bias=lengths_bias,
            off_base=off_base,
            valid_cols=valid_cols,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, Tp, D), out_dtype),
            jax.ShapeDtypeStruct((B, N, Tp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, tb), jnp.float32),
            pltpu.VMEM((N, tb), jnp.float32),
            pltpu.VMEM((N, tb, D), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return out[:, :, :T], lse[:, :, :T, 0]


def _blockwise_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, lse_ref, dsum_ref, do_ref, *rest,
    scale: float, num_kv_blocks: int, dropout_scale: float = 0.0,
    prng: Optional[tuple] = None, causal: bool = False,
    lengths_bias: bool = False, off_base: Optional[int] = None,
    valid_cols: Optional[int] = None,
):
    """dq for one (batch-row, q-block), ALL HEADS: KV loop innermost,
    probability block recomputed from the forward's saved logsumexp —
    nothing [T, S] ever leaves VMEM. With keepc the scaled keep mask,
    dp = (dO Vᵀ)∘keepc, dz = p∘(dp − rowsum(dO∘O)), dq = dz K·scale."""
    if dropout_scale:
        _keep_src, dq_ref, acc_ref = rest
    else:
        dq_ref, acc_ref = rest
    b_i = pl.program_id(0)
    h_i = pl.program_id(1)
    t_i = pl.program_id(2)
    s_i = pl.program_id(3)

    @pl.when(s_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def _compute():
        q = q_ref[0].astype(jnp.float32)      # [N, tb, D]
        k = k_ref[0].astype(jnp.float32)      # [N, sb, D]
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)    # [N, tb, D]
        lse = lse_ref[0, :, :, 0]             # [N, tb]
        dsum = dsum_ref[0, :, :, 0]

        z = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + _block_bias(
            bias_ref, lengths_bias, causal, b_i, t_i, s_i,
            (q_ref.shape[2], k_ref.shape[2]),
            off_base=off_base, valid_cols=valid_cols,
        )
        p = jnp.exp(z - lse[..., None])       # [N, tb, sb]; <= 1 by lse >= m
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if dropout_scale:
            keep = (
                _keep_src[0].astype(jnp.float32)
                if prng is None
                else _keep_block_heads(
                    _keep_src[0], b_i, h_i * p.shape[0],
                    t_i * p.shape[1], s_i * p.shape[2],
                    p.shape, prng[0], prng[1], prng[2],
                )
            )
            dp = dp * (keep * dropout_scale)
        dz = p * (dp - dsum[..., None])
        acc_ref[...] += jax.lax.dot_general(
            dz, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale

    # Dead-q-block skip (lengths mode, non-ring): dead q rows carry dO = 0
    # (zero cotangents by induction from the loss), so dq is exactly zero —
    # the zero-initialized accumulator IS the right answer; skip every KV
    # iteration and let _finish write it.
    tb_sz, sb_sz = q_ref.shape[2], k_ref.shape[2]
    q_alive = None
    if lengths_bias and off_base is None:
        q_alive = t_i * tb_sz < bias_ref[b_i]

    if causal and off_base is not None:
        pl.when(_causal_live_off(t_i, s_i, tb_sz, sb_sz, bias_ref, off_base))(
            _compute
        )
    elif causal:
        live = _causal_live(t_i, s_i, tb_sz, sb_sz)
        if q_alive is not None:
            live = live & q_alive
        pl.when(live)(_compute)
    elif q_alive is not None:
        pl.when(q_alive)(_compute)
    else:
        _compute()

    @pl.when(s_i == num_kv_blocks - 1)
    def _finish():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _blockwise_dkdv_kernel(
    q_ref, k_ref, v_ref, bias_ref, lse_ref, dsum_ref, do_ref, *rest,
    scale: float, num_q_blocks: int, dropout_scale: float = 0.0,
    prng: Optional[tuple] = None, causal: bool = False,
    lengths_bias: bool = False, off_base: Optional[int] = None,
    valid_cols: Optional[int] = None,
):
    """dk/dv for one (batch-row, kv-block), ALL HEADS: Q loop innermost.
    dv = (p∘keepc)ᵀ dO; dk = dzᵀ Q·scale with dz as in the dq kernel."""
    if dropout_scale:
        _keep_src, dk_ref, dv_ref, dk_acc, dv_acc = rest
    else:
        dk_ref, dv_ref, dk_acc, dv_acc = rest
    b_i = pl.program_id(0)
    h_i = pl.program_id(1)
    s_i = pl.program_id(2)
    t_i = pl.program_id(3)

    @pl.when(t_i == 0)
    def _init():
        dk_acc[...] = jnp.zeros(dk_acc.shape, dk_acc.dtype)
        dv_acc[...] = jnp.zeros(dv_acc.shape, dv_acc.dtype)

    def _compute():
        q = q_ref[0].astype(jnp.float32)      # [N, tb, D]
        k = k_ref[0].astype(jnp.float32)      # [N, sb, D]
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)    # [N, tb, D]
        lse = lse_ref[0, :, :, 0]             # [N, tb]
        dsum = dsum_ref[0, :, :, 0]

        z = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + _block_bias(
            bias_ref, lengths_bias, causal, b_i, t_i, s_i,
            (q_ref.shape[2], k_ref.shape[2]),
            off_base=off_base, valid_cols=valid_cols,
        )
        p = jnp.exp(z - lse[..., None])       # [N, tb, sb]
        pv = p
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if dropout_scale:
            keep = (
                _keep_src[0].astype(jnp.float32)
                if prng is None
                else _keep_block_heads(
                    _keep_src[0], b_i, h_i * p.shape[0],
                    t_i * p.shape[1], s_i * p.shape[2],
                    p.shape, prng[0], prng[1], prng[2],
                )
            )
            keepc = keep * dropout_scale
            pv = p * keepc
            dp = dp * keepc
        # dv += pvᵀ dO: contract the q dimension (axis 1 of both).
        dv_acc[...] += jax.lax.dot_general(
            pv, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dz = p * (dp - dsum[..., None])
        dk_acc[...] += jax.lax.dot_general(
            dz, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale

    # Dead-q-block skip (lengths mode, non-ring): dead q rows have dO = 0,
    # so dz = dp = 0 — they contribute nothing to dk/dv. Skip their whole
    # inner-loop iteration; the zero-init/accumulate structure is unchanged.
    tb_sz, sb_sz = q_ref.shape[2], k_ref.shape[2]
    q_alive = None
    if lengths_bias and off_base is None:
        q_alive = t_i * tb_sz < bias_ref[b_i]

    if causal and off_base is not None:
        pl.when(_causal_live_off(t_i, s_i, tb_sz, sb_sz, bias_ref, off_base))(
            _compute
        )
    elif causal:
        live = _causal_live(t_i, s_i, tb_sz, sb_sz)
        if q_alive is not None:
            live = live & q_alive
        pl.when(live)(_compute)
    elif q_alive is not None:
        pl.when(q_alive)(_compute)
    else:
        _compute()

    @pl.when(t_i == num_q_blocks - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _blockwise_backward(qt, kt, vt, bias_arr, mask, dOt, out_t, lse,
                        dropout_scale=0.0, seed=None, dropout_rate=0.0,
                        causal=False, kv_lengths=None, offsets=None):
    """KV-loop Pallas backward (long-context train path), heads-in-block.

    All activation-shaped tensors are [B, N, T/S, D] (head-major); bias_arr
    [B, bn, T, S]; mask [B, mn, T, S] or None; lse [B, N, T] from the
    forward. Derivation: out = (p∘keepc)V with p = softmax(z) recomputable
    as exp(z − lse); rowsum((dO Vᵀ)∘keepc∘p) = rowsum(dO∘out), so the
    softmax-backward row term is the cheap [B, N, T] dsum — the same trick
    as FlashAttention-2, composed with PyTorch-style probability dropout
    (keepc includes the 1/(1−rate) scale, and the softmax denominator is
    dropout-free). Padded Q rows carry dO = 0 (no dk/dv pollution); padded
    KV columns carry bias −1e30 (p = 0)."""
    B, N, T, D = qt.shape
    S = kt.shape[2]
    scale = 1.0 / (D ** 0.5)

    dsum = jnp.sum(dOt.astype(jnp.float32) * out_t.astype(jnp.float32), axis=-1)

    lengths_bias = kv_lengths is not None
    tb, sb = _blockwise_block_sizes(T, S)
    qt = _pad_to(qt, 2, tb)
    dOt = _pad_to(dOt, 2, tb)
    kt = _pad_to(kt, 2, sb)
    vt = _pad_to(vt, 2, sb)
    if not lengths_bias:
        bias_arr = _pad_to(bias_arr, 3, sb, value=_NEG_INF)
        bias_arr = _pad_to(bias_arr, 2, tb, value=0.0)
    if mask is not None:
        mask = _pad_to(_pad_to(mask, 3, sb), 2, tb)
    lse4 = _pad_to(lse[..., None], 2, tb)  # [B, N, Tp, 1]
    dsum4 = _pad_to(dsum[..., None], 2, tb)
    Tp, Sp = qt.shape[2], kt.shape[2]
    interpret = jax.default_backend() == "cpu"

    # Head-group size: all-heads blocks OOM the 16 MB scoped-VMEM limit in
    # the two-output dk/dv kernel at N=12 (measured 17.46M) — split heads
    # into the largest group the cost model keeps under ~11 MB (the model
    # charges double-buffered f32 in/out blocks, f32 scratch, and the four
    # [hb, tb, sb] f32 intermediates).
    def pick_hb(n_out):
        def est(hb):
            blocks = (2 * tb * D + (2 + n_out) * sb * D) * 4 * 2
            scratch = (2 * sb * D * 4) if n_out == 2 else (tb * D * 4)
            interm = 4 * tb * sb * 4
            return hb * (blocks + scratch + interm)
        for d in range(N, 0, -1):
            if N % d == 0 and est(d) <= 11 * 1024 * 1024:
                return d
        return 1

    def row_spec(seq, which, hb):
        # which: "t" rows follow the q-block grid dim, "s" the kv dim. The
        # dq grid is (b, h, t, s); the dk/dv grid is (b, h, s, t).
        if which == "t":
            return pl.BlockSpec(
                (1, hb, seq, D), lambda b, h, x, y: (b, h, x, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, hb, seq, D), lambda b, h, x, y: (b, h, y, 0),
            memory_space=pltpu.VMEM,
        )

    def scalar_spec(which, hb):
        if which == "t":
            return pl.BlockSpec(
                (1, hb, tb, 1), lambda b, h, x, y: (b, h, x, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, hb, tb, 1), lambda b, h, x, y: (b, h, y, 0),
            memory_space=pltpu.VMEM,
        )

    def nts_spec(n_dim, order, hb):
        # bias/mask [*, *, T, S] blocks; the (t, s) block index is (x, y)
        # on the dq grid, (y, x) on the dk/dv grid. Head-collapsed arrays
        # (n_dim == 1) read block 0 on the head axis; per-head arrays follow
        # the head-group index.
        nb = 1 if n_dim == 1 else hb
        if order == "ts":
            idx = (lambda b, h, x, y: (b, 0, x, y)) if n_dim == 1 else (
                lambda b, h, x, y: (b, h, x, y))
        else:
            idx = (lambda b, h, x, y: (b, 0, y, x)) if n_dim == 1 else (
                lambda b, h, x, y: (b, h, y, x))
        return pl.BlockSpec(
            (1, nb, tb, sb), idx, memory_space=pltpu.VMEM,
        )

    def bias_spec(order, hb):
        if lengths_bias:
            # Whole [B] vector un-blocked in SMEM (see _blockwise_forward).
            return pl.BlockSpec(memory_space=pltpu.SMEM)
        return nts_spec(bias_arr.shape[1], order, hb)

    bias_operand = (
        jnp.asarray(kv_lengths, jnp.int32) if lengths_bias else bias_arr
    )
    off_base = valid_cols = None
    if offsets is not None:
        # Ring-step global coordinates (see _blockwise_forward).
        assert lengths_bias, "offsets require kv_lengths"
        bias_operand = jnp.concatenate(
            [bias_operand, jnp.asarray(offsets, jnp.int32).reshape(2)]
        )
        off_base, valid_cols = B, S

    # --- dq: grid (B, head-groups, q-blocks, kv-blocks), kv innermost -------
    hb_q = pick_hb(1)
    in_specs = [
        row_spec(tb, "t", hb_q),            # q
        row_spec(sb, "s", hb_q),            # k
        row_spec(sb, "s", hb_q),            # v
        bias_spec("ts", hb_q),              # bias (dense tile or SMEM length)
        scalar_spec("t", hb_q),             # lse
        scalar_spec("t", hb_q),             # dsum
        row_spec(tb, "t", hb_q),            # dO
    ]
    operands = [qt, kt, vt, bias_operand, lse4, dsum4, dOt]
    prng = None
    seed_arr = None
    if mask is not None:
        in_specs.append(nts_spec(mask.shape[1], "ts", hb_q))
        operands.append(mask)
    elif seed is not None:
        prng = (N, S, _dropout_thresh(dropout_rate))
        seed_arr = jnp.reshape(seed, (1,)).astype(jnp.uint32)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(seed_arr)
    dq = pl.pallas_call(
        functools.partial(
            _blockwise_dq_kernel,
            scale=scale, num_kv_blocks=Sp // sb, dropout_scale=dropout_scale,
            prng=prng, causal=causal, lengths_bias=lengths_bias,
            off_base=off_base, valid_cols=valid_cols,
        ),
        grid=(B, N // hb_q, Tp // tb, Sp // sb),
        in_specs=in_specs,
        out_specs=row_spec(tb, "t", hb_q),
        out_shape=jax.ShapeDtypeStruct((B, N, Tp, D), qt.dtype),
        scratch_shapes=[pltpu.VMEM((hb_q, tb, D), jnp.float32)],
        interpret=interpret,
    )(*operands)

    # --- dk/dv: grid (B, head-groups, kv-blocks, q-blocks), q innermost -----
    hb_kv = pick_hb(2)
    in_specs = [
        row_spec(tb, "s", hb_kv),            # q   (block follows innermost y)
        row_spec(sb, "t", hb_kv),            # k   (block follows dim x)
        row_spec(sb, "t", hb_kv),            # v
        bias_spec("st", hb_kv),              # bias (t index = y, s index = x)
        scalar_spec("s", hb_kv),             # lse  (q-row scalar, follows y)
        scalar_spec("s", hb_kv),             # dsum
        row_spec(tb, "s", hb_kv),            # dO
    ]
    operands = [qt, kt, vt, bias_operand, lse4, dsum4, dOt]
    if mask is not None:
        in_specs.append(nts_spec(mask.shape[1], "st", hb_kv))
        operands.append(mask)
    elif seed_arr is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(seed_arr)
    dk, dv = pl.pallas_call(
        functools.partial(
            _blockwise_dkdv_kernel,
            scale=scale, num_q_blocks=Tp // tb, dropout_scale=dropout_scale,
            prng=prng, causal=causal, lengths_bias=lengths_bias,
            off_base=off_base, valid_cols=valid_cols,
        ),
        grid=(B, N // hb_kv, Sp // sb, Tp // tb),
        in_specs=in_specs,
        out_specs=(row_spec(sb, "t", hb_kv), row_spec(sb, "t", hb_kv)),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, Sp, D), kt.dtype),
            jax.ShapeDtypeStruct((B, N, Sp, D), vt.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((hb_kv, sb, D), jnp.float32),
            pltpu.VMEM((hb_kv, sb, D), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return dq[:, :, :T], dk[:, :, :S], dv[:, :, :S]


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dropout_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    causal: bool = False,
    kv_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q: [B, T, N, D]; k, v: [B, S, N, D]; bias broadcastable to
    [B, N, T, S] (given with leading dims of size 1 or matching) — or, for
    the key-padding+causal form every model here uses, ``kv_lengths`` [B]
    int32 (+ ``causal``): key s of clip b attends iff ``s < kv_lengths[b]``
    (and ``s <= t`` when causal). On the blockwise path the bias is then
    GENERATED IN-KERNEL from iota comparisons — no [B, 1, T, S] array is
    ever built, removing the last O(T²) HBM buffer from long-context
    training (requires tail-contiguous padding, the datasets' invariant).
    Returns [B, T, N, D].

    PyTorch-style attention-probability dropout (drop the NORMALIZED
    probabilities, scale survivors by 1/(1-rate)) fuses into the kernels two
    ways — pass at most one of:

    - ``dropout_mask`` ([B, N, T, S], 0/1, sampled by the caller): exact
      stream parity with the XLA fallback path; the mask read costs 1-2
      bytes/element vs an f32 probability write+read.
    - ``dropout_seed`` (uint32 scalar): keep bits are HASHED IN-KERNEL from
      (seed, b, n, t, s) — no [B, N, T, S] buffer exists anywhere, which is
      the long-context requirement (the mask itself is O(T²) HBM). The same
      bits are regenerated by the backward kernels (stateless counter hash),
      and ``hash_keep_mask`` reconstructs them in XLA for tests/fallback.

    ``causal=True`` declares (it does not create — the bias must still carry
    the causal terms) that the bias is causal, letting the blockwise kernels
    SKIP (q, kv) block pairs entirely above the diagonal: their p is
    identically 0, so forward l/acc and every gradient are untouched while
    the MXU work disappears.

    Lengths-mode ROW contract: query rows at or past ``kv_lengths[b]`` are
    pad frames. Their forward values are unspecified-but-finite (the
    blockwise dispatch SKIPS whole dead q blocks and writes zeros; other
    dispatches compute them) and their cotangents are treated as zero in
    backward. Callers must never read dead rows or send gradient into them
    — the models here guarantee both (dead rows are only ever consumed as
    -1e9-masked attention keys, and the loss reads the extract row), which
    is what makes the skip exact (dO = 0 ⇒ dq = 0 and dz = dp = 0).
    """
    assert dropout_mask is None or dropout_seed is None
    assert bias is None or kv_lengths is None, (
        "pass a dense bias OR kv_lengths (+ causal), not both"
    )
    bias4 = None
    if bias is not None:
        bias4 = jnp.asarray(bias, jnp.float32)
        while bias4.ndim < 4:
            bias4 = bias4[None]
    return _flash_custom(
        float(dropout_rate), bool(causal), q, k, v, bias4, dropout_mask,
        dropout_seed, kv_lengths,
    )


def _lengths_dense_bias(kv_lengths, T, S, causal):
    """Dense [B, 1, T, S] bias equivalent to the lengths mode — the
    short-sequence fallback (tiny there) and the XLA recompute backward."""
    cols = jnp.arange(S)
    valid = cols[None, :] < jnp.asarray(kv_lengths, jnp.int32)[:, None]  # [B, S]
    if causal:
        valid = valid[:, None, :] & (cols[None, None, :] <= jnp.arange(T)[None, :, None])
        return jnp.where(valid, 0.0, _NEG_INF)[:, None].astype(jnp.float32)
    return jnp.where(valid, 0.0, _NEG_INF)[:, None, None, :].astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flash_custom(dropout_rate, causal, q, k, v, bias4, mask, seed, kv_lengths):
    return _flash_forward(
        q, k, v, bias4, mask, dropout_rate, seed, causal, kv_lengths
    )[0]


def _broadcast_bias(bias4, B, T, S):
    if bias4 is None:
        bias_arr = jnp.zeros((1, 1, T, S), jnp.float32)
    else:
        bias_arr = bias4.astype(jnp.float32)
    # Materialize batch/query/key dims physically (cheap: T·S per batch row),
    # keep heads collapsed when head-invariant.
    return jnp.broadcast_to(bias_arr, (B, bias_arr.shape[1], T, S))


def _flash_forward(q, k, v, bias4, mask, dropout_rate, seed=None, causal=False,
                   kv_lengths=None):
    """Returns (out, residual): residual is (out_t, lse) head-major on the
    blockwise path (consumed by the Pallas backward), or None on the
    short-sequence path (whose backward recomputes through XLA)."""
    B, T, N, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    dropout_on = mask is not None or seed is not None
    dropout_scale = 1.0 / (1.0 - dropout_rate) if dropout_on else 0.0

    # [B, N, T/S, D]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    if max(T, S) >= _BLOCKWISE_MIN_SEQ:
        # Lengths mode: the bias is generated in-kernel — NO [B, *, T, S]
        # array is built here at all.
        bias_arr = (
            None if kv_lengths is not None else _broadcast_bias(bias4, B, T, S)
        )
        out_t, lse = _blockwise_forward(
            qt, kt, vt, bias_arr, mask, dropout_scale, seed, dropout_rate,
            causal, kv_lengths,
        )
        return out_t.transpose(0, 2, 1, 3), (out_t, lse)

    if kv_lengths is not None and bias4 is None:
        # Short-sequence fallback: the dense equivalent is tiny here.
        bias4 = _lengths_dense_bias(kv_lengths, T, S, causal)
    bias_arr = _broadcast_bias(bias4, B, T, S)
    bias_n = bias_arr.shape[1]

    rb = _pick_row_block(B, T, S, D, masked=dropout_on)
    pad_rows = (-B) % rb
    if pad_rows:
        qt = _pad_to(qt, 0, rb)
        kt = _pad_to(kt, 0, rb)
        vt = _pad_to(vt, 0, rb)
        bias_arr = _pad_to(bias_arr, 0, rb)
        if mask is not None:
            mask = _pad_to(mask, 0, rb)
    Bp = B + pad_rows
    grid = (Bp // rb, N)

    def qkv_spec(seq):
        return pl.BlockSpec(
            (rb, 1, seq, D), lambda i, n: (i, n, 0, 0), memory_space=pltpu.VMEM
        )

    def nts_spec(n_dim):
        # [rb, 1, T, S] block over a [B, n_dim, T, S] array (bias or mask);
        # head-collapsed reads when the array is head-invariant.
        if n_dim == 1:
            return pl.BlockSpec(
                (rb, 1, T, S), lambda i, n: (i, 0, 0, 0), memory_space=pltpu.VMEM
            )
        return pl.BlockSpec(
            (rb, 1, T, S), lambda i, n: (i, n, 0, 0), memory_space=pltpu.VMEM
        )

    in_specs = [qkv_spec(T), qkv_spec(S), qkv_spec(S), nts_spec(bias_n)]
    operands = [qt, kt, vt, bias_arr]
    prng = None
    if mask is not None:
        in_specs.append(nts_spec(mask.shape[1]))
        operands.append(mask)
    elif seed is not None:
        prng = (N, S, _dropout_thresh(dropout_rate))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.reshape(seed, (1,)).astype(jnp.uint32))

    out = pl.pallas_call(
        functools.partial(
            _fused_attn_kernel, scale=scale, dropout_scale=dropout_scale,
            prng=prng,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec(T),
        out_shape=jax.ShapeDtypeStruct((Bp, N, T, D), v.dtype),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return out[:B].transpose(0, 2, 1, 3), None


def _fused_backward(q, k, v, bias4, mask, seed, g, dropout_rate):
    """Short-sequence backward: one Pallas program per (row-block, head)
    computes dq/dk/dv with the [T, S] tile entirely in VMEM. q/g: [B, T, N,
    D]; k, v: [B, S, N, D]; returns (dq, dk, dv) in the same layout."""
    B, T, N, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    dropout_on = mask is not None or seed is not None
    dropout_scale = 1.0 / (1.0 - dropout_rate) if dropout_on else 0.0

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot_t = g.transpose(0, 2, 1, 3)
    bias_arr = _broadcast_bias(bias4, B, T, S)
    bias_n = bias_arr.shape[1]

    rb = _pick_row_block(B, T, S, D, masked=mask is not None, bwd=True)
    pad_rows = (-B) % rb
    if pad_rows:
        # Padded rows: bias 0 (finite softmax), dO 0 — their dq/dk/dv are
        # exact zeros and get sliced off anyway.
        qt = _pad_to(qt, 0, rb)
        kt = _pad_to(kt, 0, rb)
        vt = _pad_to(vt, 0, rb)
        dot_t = _pad_to(dot_t, 0, rb)
        bias_arr = _pad_to(bias_arr, 0, rb)
        if mask is not None:
            mask = _pad_to(mask, 0, rb)
    Bp = B + pad_rows
    grid = (Bp // rb, N)

    def qkv_spec(seq):
        return pl.BlockSpec(
            (rb, 1, seq, D), lambda i, n: (i, n, 0, 0), memory_space=pltpu.VMEM
        )

    def nts_spec(n_dim):
        if n_dim == 1:
            return pl.BlockSpec(
                (rb, 1, T, S), lambda i, n: (i, 0, 0, 0), memory_space=pltpu.VMEM
            )
        return pl.BlockSpec(
            (rb, 1, T, S), lambda i, n: (i, n, 0, 0), memory_space=pltpu.VMEM
        )

    in_specs = [qkv_spec(T), qkv_spec(S), qkv_spec(S), nts_spec(bias_n), qkv_spec(T)]
    operands = [qt, kt, vt, bias_arr, dot_t]
    prng = None
    if mask is not None:
        in_specs.append(nts_spec(mask.shape[1]))
        operands.append(mask)
    elif seed is not None:
        prng = (N, S, _dropout_thresh(dropout_rate))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.reshape(seed, (1,)).astype(jnp.uint32))

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, scale=scale, dropout_scale=dropout_scale,
            prng=prng,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(qkv_spec(T), qkv_spec(S), qkv_spec(S)),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, N, T, D), q.dtype),
            jax.ShapeDtypeStruct((Bp, N, S, D), k.dtype),
            jax.ShapeDtypeStruct((Bp, N, S, D), v.dtype),
        ),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return (
        dq[:B].transpose(0, 2, 1, 3),
        dk[:B].transpose(0, 2, 1, 3),
        dv[:B].transpose(0, 2, 1, 3),
    )


def _flash_fwd(dropout_rate, causal, q, k, v, bias4, mask, seed, kv_lengths):
    out, residual = _flash_forward(
        q, k, v, bias4, mask, dropout_rate, seed, causal, kv_lengths
    )
    return out, (q, k, v, bias4, mask, seed, kv_lengths, residual)


def _flash_bwd(dropout_rate, causal, residuals, g):
    q, k, v, bias4, mask, seed, kv_lengths, residual = residuals
    if residual is not None:
        # Blockwise-dispatched shape: KV-loop Pallas backward — the
        # [B, N, T, S] probability tensor stays out of HBM in training too.
        out_t, lse = residual
        B, T, N, D = q.shape
        S = k.shape[1]
        dropout_on = mask is not None or seed is not None
        dropout_scale = 1.0 / (1.0 - dropout_rate) if dropout_on else 0.0
        dq_t, dk_t, dv_t = _blockwise_backward(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            None if kv_lengths is not None else _broadcast_bias(bias4, B, T, S),
            mask,
            g.transpose(0, 2, 1, 3),
            out_t,
            lse,
            dropout_scale,
            seed,
            dropout_rate,
            causal,
            kv_lengths,
        )
        return (
            dq_t.transpose(0, 2, 1, 3).astype(q.dtype),
            dk_t.transpose(0, 2, 1, 3).astype(k.dtype),
            dv_t.transpose(0, 2, 1, 3).astype(v.dtype),
            None,
            None,
            None,
            None,
        )
    # Short sequences: fused recompute backward kernel — one program per
    # (row-block, head) recomputes softmax in VMEM and emits dq/dk/dv; the
    # [B, N, T, S] probability tensor (which the round-2 XLA recompute
    # materialized in HBM twice per layer) never exists. Dropout bits come
    # from the mask operand or are re-hashed in-kernel from the seed.
    if kv_lengths is not None and bias4 is None:
        bias4 = _lengths_dense_bias(kv_lengths, q.shape[1], k.shape[1], causal)
    dq, dk, dv = _fused_backward(q, k, v, bias4, mask, seed, g, dropout_rate)
    return dq, dk, dv, None, None, None, None


_flash_custom.defvjp(_flash_fwd, _flash_bwd)
