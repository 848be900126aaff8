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

Backward: ``custom_vjp`` recomputes through the XLA reference path (cheap at
these sizes and numerically identical); the kernel serves the
forward/serving path. Kernel-vs-reference numerics: tests/test_flash_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stlt_tpu.ops.attention import dot_product_attention_reference


def _fused_attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, *rest, scale: float, dropout_scale: float = 0.0
):
    # q_ref: [Rb, 1, T, D]; k_ref/v_ref: [Rb, 1, S, D]; bias_ref: [Rb, 1, T, S]
    # With dropout: rest = (mask_ref [Rb, N?, T, S], o_ref), else (o_ref,).
    if dropout_scale:
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
        probs = probs * (mask_ref[:, 0].astype(jnp.float32) * dropout_scale)
    out = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, 0] = out.astype(o_ref.dtype)


def _pick_row_block(rows: int, t: int, s: int, d: int, *, masked: bool = False) -> int:
    """Batch rows per program, sized by a VMEM target.

    Eval (no dropout mask): 4 MB. Measured on the spatial shape (17408 rows
    × 8 tokens, 12 heads): 1 MB → 7.89 ms, 2 MB → 7.34, 4 MB → 7.05, 8 MB →
    6.99; ×2 double-buffering still fits VMEM at every dispatched shape.
    Train (mask operand present): the bigger blocks REGRESS the real CLI
    loop (2560 vs 2926 clips/s at B=512), so the masked path keeps 1 MB.
    The residual eval cost is the per-row mini-matmul issue rate (B·N·2 MXU
    ops), which block-diagonal clip packing does NOT fix (measured 11.1 ms
    at every pack factor — see PERF_NOTES)."""
    bytes_per_row = (2 * t * d + 2 * s * d + 2 * t * s) * 4
    target = (1 if masked else 4) * 1024 * 1024
    rb = max(1, target // max(bytes_per_row, 1))
    rb = min(rb, rows)
    while rows % rb:
        rb -= 1
    return rb


# Sequences above this take the blockwise (KV-loop) kernel. Below it the
# fully-fused kernel wins: a [T, S] f32 probability tile still fits VMEM
# comfortably (513² x 4B ≈ 1 MB) and blockwise's pad-to-128 on BOTH axes
# wastes real compute at non-multiple lengths (e.g. 257→384 = 2.2x; measured
# 370 vs 509 clips/s on the 256-frame workload before this threshold).
_BLOCKWISE_MIN_SEQ = 513
_Q_BLOCK = 128
# KV-loop block: measured at the 512-frame workload (S=514): 128 → 176
# clips/s, 256 → 207, 384 → 228, 512 → 224. The KV-loop iteration overhead
# outweighs pad-waste here (384 pads 514→768 keys yet beats 128's 640), so
# prefer fewer, larger KV steps; 512 starts losing to its 1024-key padding.
_KV_BLOCK = 384
_NEG_INF = -1e30  # finite: exp(-1e30 - m) == 0 without inf-inf NaNs


def _blockwise_attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, *rest,
    scale: float, num_kv_blocks: int, dropout_scale: float = 0.0
):
    # q_ref: [Rb, 1, Tb, D]; k_ref/v_ref: [Rb, 1, Sb, D];
    # bias_ref: [Rb, 1, Tb, Sb]; scratch m/l: [Rb, Tb], acc: [Rb, Tb, D].
    # With dropout: rest = (mask_ref, o_ref, m, l, acc), else (o_ref, m, l, acc).
    if dropout_scale:
        mask_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    sb = pl.program_id(3)

    @pl.when(sb == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, _NEG_INF, m_ref.dtype)
        l_ref[...] = jnp.zeros(l_ref.shape, l_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    q = q_ref[:, 0].astype(jnp.float32)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale + bias_ref[:, 0].astype(jnp.float32)
    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    p = jnp.exp(logits - m_new[..., None])
    corr = jnp.exp(m_prev - m_new)
    # The softmax denominator accumulates UNDROPPED probabilities (dropout
    # applies after normalization); only the value contraction is dropped.
    l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=-1)
    pv = p
    if dropout_scale:
        pv = p * (mask_ref[:, 0].astype(jnp.float32) * dropout_scale)
    acc_ref[...] = acc_ref[...] * corr[..., None] + jax.lax.dot_general(
        pv, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = m_new

    @pl.when(sb == num_kv_blocks - 1)
    def _finish():
        o_ref[:, 0] = (acc_ref[...] / l_ref[...][..., None]).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _blockwise_forward(qt, kt, vt, bias_arr, mask=None, dropout_scale=0.0):
    """Long-context path. qt/kt/vt: [B, N, T/S, D]; bias_arr: [B, bn, T, S];
    mask (optional): [B, mn, T, S] 0/1 attention-dropout keep mask."""
    B, N, T, D = qt.shape
    S = kt.shape[2]
    scale = 1.0 / (D ** 0.5)
    out_dtype = vt.dtype

    # Q blocks need only sublane (x8) alignment, so pick the multiple-of-8
    # size minimizing row padding (largest such block on ties); KV blocks
    # are the lane dim of the bias/mask tiles and must stay x128.
    sb = min(_KV_BLOCK, S)
    tb = min(
        range(8, _Q_BLOCK + 1, 8),
        key=lambda t: (-(T // -t) * t - T, -t),  # (ceil-pad waste, prefer big)
    )
    # Pad to block multiples: padded KV columns get large-negative bias
    # (contribute exp(·)=0); padded Q rows get bias 0 (garbage rows, sliced
    # off after the call — never NaN because l ≥ exp(0) > 0).
    qt = _pad_to(qt, 2, tb)
    kt = _pad_to(kt, 2, sb)
    vt = _pad_to(vt, 2, sb)
    bias_arr = _pad_to(bias_arr, 3, sb, value=_NEG_INF)
    bias_arr = _pad_to(bias_arr, 2, tb, value=0.0)
    if mask is not None:
        mask = _pad_to(_pad_to(mask, 3, sb), 2, tb)
    Tp, Sp = qt.shape[2], kt.shape[2]
    bias_n = bias_arr.shape[1]

    rb = 1
    grid = (B // rb, N, Tp // tb, Sp // sb)

    q_spec = pl.BlockSpec(
        (rb, 1, tb, D), lambda i, n, t, s: (i, n, t, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (rb, 1, sb, D), lambda i, n, t, s: (i, n, s, 0), memory_space=pltpu.VMEM
    )

    def nts_spec(n_dim):
        if n_dim == 1:
            return pl.BlockSpec(
                (rb, 1, tb, sb), lambda i, n, t, s: (i, 0, t, s),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (rb, 1, tb, sb), lambda i, n, t, s: (i, n, t, s),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (rb, 1, tb, D), lambda i, n, t, s: (i, n, t, 0), memory_space=pltpu.VMEM
    )

    in_specs = [q_spec, kv_spec, kv_spec, nts_spec(bias_n)]
    operands = [qt, kt, vt, bias_arr]
    if mask is not None:
        in_specs.append(nts_spec(mask.shape[1]))
        operands.append(mask)

    out = pl.pallas_call(
        functools.partial(
            _blockwise_attn_kernel,
            scale=scale,
            num_kv_blocks=Sp // sb,
            dropout_scale=dropout_scale,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, Tp, D), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rb, tb), jnp.float32),
            pltpu.VMEM((rb, tb), jnp.float32),
            pltpu.VMEM((rb, tb, D), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return out[:, :, :T]


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dropout_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """q: [B, T, N, D]; k, v: [B, S, N, D]; bias broadcastable to
    [B, N, T, S] (given with leading dims of size 1 or matching).
    Returns [B, T, N, D].

    ``dropout_mask`` ([B, N, T, S], 0/1, sampled by the caller) fuses
    PyTorch-style attention-probability dropout into the kernel: the
    normalized probabilities are multiplied by mask/(1-rate) before PV, so
    the train path never materializes probabilities in HBM either (the mask
    read is 1-2 bytes/element vs an f32 write+read of probs).
    """
    bias4 = None
    if bias is not None:
        bias4 = jnp.asarray(bias, jnp.float32)
        while bias4.ndim < 4:
            bias4 = bias4[None]
    return _flash_custom(float(dropout_rate), q, k, v, bias4, dropout_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_custom(dropout_rate, q, k, v, bias4, mask):
    return _flash_forward(q, k, v, bias4, mask, dropout_rate)


def _flash_forward(q, k, v, bias4, mask, dropout_rate):
    B, T, N, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    dropout_scale = 1.0 / (1.0 - dropout_rate) if mask is not None else 0.0

    # [B, N, T/S, D]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if bias4 is None:
        bias_arr = jnp.zeros((1, 1, T, S), jnp.float32)
    else:
        bias_arr = bias4.astype(jnp.float32)
    bias_n = bias_arr.shape[1]
    # Materialize batch/query/key dims physically (cheap: T·S per batch row),
    # keep heads collapsed when head-invariant.
    bias_arr = jnp.broadcast_to(bias_arr, (B, bias_n, T, S))

    if max(T, S) >= _BLOCKWISE_MIN_SEQ:
        out = _blockwise_forward(qt, kt, vt, bias_arr, mask, dropout_scale)
        return out.transpose(0, 2, 1, 3)

    rb = _pick_row_block(B, T, S, D, masked=mask is not None)
    grid = (B // rb, N)

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
    if mask is not None:
        in_specs.append(nts_spec(mask.shape[1]))
        operands.append(mask)

    out = pl.pallas_call(
        functools.partial(
            _fused_attn_kernel, scale=scale, dropout_scale=dropout_scale
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec(T),
        out_shape=jax.ShapeDtypeStruct((B, N, T, D), v.dtype),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return out.transpose(0, 2, 1, 3)


def _flash_fwd(dropout_rate, q, k, v, bias4, mask):
    return _flash_forward(q, k, v, bias4, mask, dropout_rate), (q, k, v, bias4, mask)


def _flash_bwd(dropout_rate, residuals, g):
    q, k, v, bias4, mask = residuals
    # Recompute-based backward through the XLA reference (numerically the
    # same attention, including the dropout mask); cheap at these sizes.
    _, vjp = jax.vjp(
        lambda q_, k_, v_: dot_product_attention_reference(
            q_, k_, v_, bias4, mask, dropout_rate
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_custom.defvjp(_flash_fwd, _flash_bwd)
