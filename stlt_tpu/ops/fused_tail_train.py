"""Fused TRAIN layer tail: dropout -> residual+norm1 -> FFN(+dropout) ->
dropout -> residual+norm2, forward and backward in Pallas.

The reference builds every encoder from ``torch.nn.TransformerEncoderLayer``
(``/root/reference/src/modelling/models.py:42-81, 114-152`` via
``nn.TransformerEncoder``; the explicit tail recipe is its post-LN chain,
mirrored in ``models/layers.TransformerEncoderLayer``):

    u = norm1(x + dropout(attn_out))
    y = norm2(u + dropout2(linear2(dropout_mid(act(linear1(u))))))

On the XLA train path this chain materializes, per layer and step, the
4H-wide hidden TWICE (z1 for the gelu vjp, h1d for the dW2 GEMM), a
[tokens, 4H] dropout mask, and samples PRNG bits for every element — at the
spatial bench shape (B=512: ~70k folded rows x 8 tokens, H=768) that is
~1 GB of forward HBM writes per layer plus ~2.6e8 sampled bits. This module
keeps the whole tail in VMEM:

- **Forward** (``grid=(row_blocks, ff_chunks)``): the eval tail kernel
  (``ops/fused_encoder.fused_layer_tail``) extended with the three dropout
  sites as counter-hashed keep bits (same lowbias32 stream family as
  ``ops/flash.py``; stateless, so forward and backward agree by
  construction, and XLA-reconstructible via ``hash_keep_rows`` for tests).
  Tokens are flattened into rows of 8 (the tail has no cross-token op), so
  per-block VMEM does not scale with T and 512-frame shapes fit. Outputs
  ``y`` and the second residual stream ``r2 = u + h2d`` (one [tokens, H]
  save — the only residual beyond the layer inputs autograd keeps anyway).

- **Backward** = three kernels, all recomputing in VMEM (bit-identical to
  the forward's intermediates — same hashed bits, same chunked f32 GEMMs):
    B1  (rows)        LN2 backward from r2:   dr2, dn2s, dn2b, db2
    B2a (rows x ffc)  FFN input-side:         dx, dattn, dn1s, dn1b
                      (du accumulates across ff chunks in an f32 scratch;
                      the LAST chunk applies the LN1 backward)
    B2b (ffc x rows)  weight-side, chunk-resident f32 accumulators visited
                      consecutively over row blocks: dW1, db1, dW2
  The [H, FF] weight-grad accumulators never share VMEM with big row
  blocks (B2b's grid is chunk-major), and no [tokens, FF] buffer exists in
  the whole backward — jaxpr-assertable like the attention path.

- **Pad-frame compaction**: ``live`` ([tokens] bool, from ``rows_live`` /
  ``tokens_live`` — see ``fused_proj_attention`` for the exactness
  argument: dead rows are only ever consumed through -1e9-masked attention
  keys, so their outputs AND cotangents are exactly zero) lets dead
  row blocks skip all compute in all four kernels. The compute skip is
  ROW-BLOCK-granular (8-token groups only when row_block=1): a block with
  any live group computes fully. The dead-row CONTRACT is per-token
  regardless: outputs (y, r2) and input cotangents (g on entry; dx/dattn
  on exit) are masked by ``live`` at the XLA seam, where the multiply
  fuses into the surrounding reshape/slice for free. Masking g is the
  exact VJP of the masked forward, and it makes every weight-grad
  contribution from dead rows inside mixed blocks exactly zero
  (dr2 = ln_bwd(0) = 0 row-locally, so dh2/dh1/dW terms vanish). This is
  what makes ragged long-context TRAINING scale with the live fraction:
  the attention kernels already skip dead blocks; the XLA tail chain
  cannot.

Kill-switch: ``STLT_FUSED_TAIL_TRAIN=0`` routes dispatch back to the XLA
chain (hardware A/B attribution, tools/ab_fused_hw.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stlt_tpu.ops.flash import _dropout_thresh, _lowbias32, _pad_to
from stlt_tpu.ops.fused_encoder import _best_row_block, _block_live, _const_spec

FUSED_TAIL_TRAIN_ENABLED = os.environ.get("STLT_FUSED_TAIL_TRAIN", "1") != "0"

# Measurement-only switch: STLT_HASH_TAIL_DROP=0 reverts the XLA tail
# chain's three dropout sites to plain nn.Dropout. Default ON — the hashed
# streams keep use_pallas=True/False bit-identical in train mode AND are
# 15.7% faster on hardware than threefry-sampled nn.Dropout at the train
# headline (3517.6 vs 3040.9 clips/s, round-5 A/B in docs/PERF_NOTES.md):
# three lowbias32 rounds fuse into the surrounding elementwise ops where
# threefry's block generation cannot.
HASH_TAIL_DROP = os.environ.get("STLT_HASH_TAIL_DROP", "1") != "0"

# Stream tags folded into the seed, one per dropout site (the attention
# kernel's probability dropout uses a *different* seed drawn from the same
# flax "dropout" RNG, so no cross-site collision is possible either way).
TAG_ATTN_DROP = 0x9E3779B9
TAG_MID_DROP = 0x85EBCA6B
TAG_OUT_DROP = 0xC2B2AE35

_VMEM_BUDGET = 12 * 1024 * 1024


def _keep_rows(seed, tag: int, r0, f0: int, shape, width: int, thresh: int):
    """Keep-mask tile [rows, fw] (f32 0/1) for global token rows starting at
    ``r0`` and feature offset ``f0`` in a stream of ``width`` features.
    Element counter is ``token * width + feature`` — identical in forward
    and backward kernels and in ``hash_keep_rows`` by construction."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(r0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(f0)
    lane = _lowbias32(seed ^ jnp.uint32(tag))
    h = _lowbias32((rows * jnp.uint32(width) + cols) ^ lane)
    return (h >= jnp.uint32(thresh)).astype(jnp.float32)


def hash_keep_rows(seed, tag: int, rows: int, width: int, rate: float):
    """XLA reconstruction of one in-kernel dropout stream: [rows, width]
    f32 0/1. Parity tests build the mask-matched XLA chain from these."""
    seed = jnp.asarray(seed, jnp.uint32)
    thresh = _dropout_thresh(rate)
    r = jnp.arange(rows, dtype=jnp.uint32)[:, None]
    c = jnp.arange(width, dtype=jnp.uint32)[None, :]
    lane = _lowbias32(seed ^ jnp.uint32(tag))
    h = _lowbias32((r * jnp.uint32(width) + c) ^ lane)
    return (h >= jnp.uint32(thresh)).astype(jnp.float32)


def _act_cd(z_cd, activation: str, approximate: bool):
    """Forward activation on the compute dtype (same as the XLA chain's
    ``activation_fn`` and the eval tail kernel)."""
    if activation == "gelu":
        return jax.nn.gelu(z_cd, approximate=approximate)
    if activation == "relu":
        return jax.nn.relu(z_cd)
    raise ValueError(activation)


def _act_grad32(z32, activation: str, approximate: bool):
    """d act / d z in f32 from the pre-activation (recomputed in VMEM)."""
    if activation == "relu":
        return (z32 > 0.0).astype(jnp.float32)
    if activation != "gelu":
        raise ValueError(activation)
    if approximate:
        c = 0.7978845608028654  # sqrt(2/pi)
        k = 0.044715
        t = jnp.tanh(c * (z32 + k * z32 * z32 * z32))
        return 0.5 * (1.0 + t) + 0.5 * z32 * (1.0 - t * t) * c * (
            1.0 + 3.0 * k * z32 * z32
        )
    cdf = 0.5 * (1.0 + jax.lax.erf(z32 * 0.7071067811865476))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * z32 * z32)
    return cdf + z32 * pdf


def _ln_fwd32(r32, eps: float):
    """flax-LayerNorm statistics: (xhat, rstd) in f32."""
    mu = jnp.mean(r32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(r32 * r32, axis=-1, keepdims=True) - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    return (r32 - mu) * rstd, rstd


def _ln_bwd32(g32, xhat, rstd, scale32):
    """dL/dr for y = xhat * scale + bias (per-row LN backward)."""
    dxhat = g32 * scale32
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rstd * (dxhat - m1 - xhat * m2)


def _recompute_u32(x_ref, a_ref, n1s_ref, n1b_ref, seed_ref, r0, *,
                   eps: float, compute_dtype, thresh: Optional[int],
                   drop_scale: float):
    """Recompute the norm1 output (f32) + its LN intermediates and the
    attn-dropout keep tile, bit-identical to the forward kernel (same cast
    points, same hashed bits). Returns (u32, xhat1, rstd1, keep1|None)."""
    rb, t, h = x_ref.shape
    x32 = x_ref[...].astype(jnp.float32).reshape(rb * t, h)
    a32 = a_ref[...].astype(jnp.float32).reshape(rb * t, h)
    keep1 = None
    if thresh is not None:
        keep1 = _keep_rows(
            seed_ref[0], TAG_ATTN_DROP, r0, 0, (rb * t, h), h, thresh
        )
        a32 = (a32 * keep1 * drop_scale).astype(compute_dtype).astype(jnp.float32)
    r32 = (
        x32.astype(compute_dtype) + a32.astype(compute_dtype)
    ).astype(jnp.float32)
    xhat1, rstd1 = _ln_fwd32(r32, eps)
    u32 = xhat1 * n1s_ref[0].astype(jnp.float32) + n1b_ref[0].astype(jnp.float32)
    return u32, xhat1, rstd1, keep1


# --- forward ------------------------------------------------------------------


def _tail_train_fwd_kernel(
    x_ref, y_ref, n1s_ref, n1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    n2s_ref, n2b_ref, *rest,
    eps: float, compute_dtype, gelu_approximate: bool, activation: str,
    ff_chunks: int, ffb: int, ff_total: int,
    thresh: Optional[int], drop_scale: float, has_live: bool,
):
    rest = list(rest)
    live_ref = rest.pop(0) if has_live else None
    seed_ref = rest.pop(0) if thresh is not None else None
    o_ref, r2_ref, u_scr, acc_scr = rest
    rb, t, h = x_ref.shape
    i_row = pl.program_id(0)  # hoisted: no pl.program_id under pl.when
    c = pl.program_id(1)
    r0 = i_row * rb * t
    live = live_ref[i_row] != 0 if live_ref is not None else None

    def _body():
        @pl.when(c == 0)
        def _compute_u():
            u32, _, _, _ = _recompute_u32(
                x_ref, y_ref, n1s_ref, n1b_ref, seed_ref, r0,
                eps=eps, compute_dtype=compute_dtype, thresh=thresh,
                drop_scale=drop_scale,
            )
            u_scr[...] = u32.astype(compute_dtype)

        u = u_scr[...]
        z1 = jax.lax.dot_general(
            u, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0].astype(jnp.float32)
        h1 = _act_cd(z1.astype(compute_dtype), activation, gelu_approximate)
        if thresh is not None:
            keepm = _keep_rows(
                seed_ref[0], TAG_MID_DROP, r0, c * ffb,
                (rb * t, ffb), ff_total, thresh,
            )
            h1 = (
                h1.astype(jnp.float32) * keepm * drop_scale
            ).astype(compute_dtype)
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
            h2 = (acc_scr[...] + b2_ref[0].astype(jnp.float32)).astype(
                compute_dtype
            )
            if thresh is not None:
                keep2 = _keep_rows(
                    seed_ref[0], TAG_OUT_DROP, r0, 0, (rb * t, h), h, thresh
                )
                h2 = (
                    h2.astype(jnp.float32) * keep2 * drop_scale
                ).astype(compute_dtype)
            r2 = u_scr[...] + h2  # compute-dtype residual, as unfused
            r232 = r2.astype(jnp.float32)
            # rank-changing reshape on the f32 vector only (Mosaic sublane
            # rule); bf16<->f32 round trips are exact
            r2_ref[...] = r232.reshape(rb, t, h).astype(r2_ref.dtype)
            xhat2, _ = _ln_fwd32(r232, eps)
            y32 = xhat2 * n2s_ref[0].astype(jnp.float32) + n2b_ref[0].astype(
                jnp.float32
            )
            o_ref[...] = y32.reshape(rb, t, h).astype(o_ref.dtype)

    if live is None:
        _body()
    else:
        pl.when(live)(_body)

        @pl.when(jnp.logical_not(live) & (c == ff_chunks - 1))
        def _dead():
            o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
            r2_ref[...] = jnp.zeros(r2_ref.shape, r2_ref.dtype)


# --- backward kernel B1: LN2 + out-dropout (rows only) -------------------------


def _tail_train_bwd_row_kernel(
    r2_ref, g_ref, n2s_ref, *rest,
    eps: float, compute_dtype,
    thresh: Optional[int], drop_scale: float, has_live: bool,
):
    rest = list(rest)
    live_ref = rest.pop(0) if has_live else None
    seed_ref = rest.pop(0) if thresh is not None else None
    dr2_ref, dn2s_ref, dn2b_ref, db2_ref = rest
    rb, t, h = r2_ref.shape
    i_row = pl.program_id(0)
    r0 = i_row * rb * t
    live = live_ref[i_row] != 0 if live_ref is not None else None

    if live is not None:
        @pl.when(i_row == 0)
        def _init_acc():
            dn2s_ref[...] = jnp.zeros(dn2s_ref.shape, dn2s_ref.dtype)
            dn2b_ref[...] = jnp.zeros(dn2b_ref.shape, dn2b_ref.dtype)
            db2_ref[...] = jnp.zeros(db2_ref.shape, db2_ref.dtype)

    def _body():
        r232 = r2_ref[...].astype(jnp.float32).reshape(rb * t, h)
        g32 = g_ref[...].astype(jnp.float32).reshape(rb * t, h)
        xhat2, rstd2 = _ln_fwd32(r232, eps)
        dn2s_p = jnp.sum(g32 * xhat2, axis=0, keepdims=True)
        dn2b_p = jnp.sum(g32, axis=0, keepdims=True)
        dr2 = _ln_bwd32(g32, xhat2, rstd2, n2s_ref[0].astype(jnp.float32))
        dh2 = dr2
        if thresh is not None:
            keep2 = _keep_rows(
                seed_ref[0], TAG_OUT_DROP, r0, 0, (rb * t, h), h, thresh
            )
            dh2 = dr2 * keep2 * drop_scale
        db2_p = jnp.sum(dh2, axis=0, keepdims=True)
        dr2_ref[...] = dr2.reshape(rb, t, h).astype(dr2_ref.dtype)
        if live is None:
            @pl.when(i_row == 0)
            def _init():
                dn2s_ref[...] = dn2s_p
                dn2b_ref[...] = dn2b_p
                db2_ref[...] = db2_p

            @pl.when(i_row > 0)
            def _accum():
                dn2s_ref[...] = dn2s_ref[...] + dn2s_p
                dn2b_ref[...] = dn2b_ref[...] + dn2b_p
                db2_ref[...] = db2_ref[...] + db2_p
        else:
            dn2s_ref[...] = dn2s_ref[...] + dn2s_p
            dn2b_ref[...] = dn2b_ref[...] + dn2b_p
            db2_ref[...] = db2_ref[...] + db2_p

    if live is None:
        _body()
    else:
        pl.when(live)(_body)

        @pl.when(jnp.logical_not(live))
        def _dead():
            dr2_ref[...] = jnp.zeros(dr2_ref.shape, dr2_ref.dtype)


# --- backward kernel B2a: FFN input-side + LN1 (rows x ff chunks) --------------


def _tail_train_bwd_input_kernel(
    x_ref, a_ref, dr2_ref, n1s_ref, n1b_ref, w1_ref, b1_ref, w2_ref, *rest,
    eps: float, compute_dtype, gelu_approximate: bool, activation: str,
    ff_chunks: int, ffb: int, ff_total: int,
    thresh: Optional[int], drop_scale: float, has_live: bool,
):
    rest = list(rest)
    live_ref = rest.pop(0) if has_live else None
    seed_ref = rest.pop(0) if thresh is not None else None
    dx_ref, da_ref, dn1s_ref, dn1b_ref, u_scr, dh2_scr, du_scr = rest
    rb, t, h = x_ref.shape
    i_row = pl.program_id(0)
    c = pl.program_id(1)
    r0 = i_row * rb * t
    live = live_ref[i_row] != 0 if live_ref is not None else None
    is_first = (i_row == 0) & (c == 0)

    if live is not None:
        @pl.when(is_first)
        def _init_acc():
            dn1s_ref[...] = jnp.zeros(dn1s_ref.shape, dn1s_ref.dtype)
            dn1b_ref[...] = jnp.zeros(dn1b_ref.shape, dn1b_ref.dtype)

    def _body():
        @pl.when(c == 0)
        def _row_setup():
            u32, _, _, _ = _recompute_u32(
                x_ref, a_ref, n1s_ref, n1b_ref, seed_ref, r0,
                eps=eps, compute_dtype=compute_dtype, thresh=thresh,
                drop_scale=drop_scale,
            )
            u_scr[...] = u32.astype(compute_dtype)
            dr2 = dr2_ref[...].astype(jnp.float32).reshape(rb * t, h)
            dh2 = dr2
            if thresh is not None:
                keep2 = _keep_rows(
                    seed_ref[0], TAG_OUT_DROP, r0, 0, (rb * t, h), h, thresh
                )
                dh2 = dr2 * keep2 * drop_scale
            dh2_scr[...] = dh2
            du_scr[...] = dr2  # residual path of r2 = u + h2d

        u = u_scr[...]
        z1 = jax.lax.dot_general(
            u, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0].astype(jnp.float32)
        dh2_cd = dh2_scr[...].astype(compute_dtype)
        dh1d = jax.lax.dot_general(
            dh2_cd, w2_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if thresh is not None:
            keepm = _keep_rows(
                seed_ref[0], TAG_MID_DROP, r0, c * ffb,
                (rb * t, ffb), ff_total, thresh,
            )
            dh1d = dh1d * keepm * drop_scale
        dh1 = dh1d * _act_grad32(z1, activation, gelu_approximate)
        du_scr[...] = du_scr[...] + jax.lax.dot_general(
            dh1.astype(compute_dtype), w1_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(c == ff_chunks - 1)
        def _ln1_backward():
            _, xhat1, rstd1, keep1 = _recompute_u32(
                x_ref, a_ref, n1s_ref, n1b_ref, seed_ref, r0,
                eps=eps, compute_dtype=compute_dtype, thresh=thresh,
                drop_scale=drop_scale,
            )
            du = du_scr[...]
            dn1s_p = jnp.sum(du * xhat1, axis=0, keepdims=True)
            dn1b_p = jnp.sum(du, axis=0, keepdims=True)
            dr1 = _ln_bwd32(du, xhat1, rstd1, n1s_ref[0].astype(jnp.float32))
            dx_ref[...] = dr1.reshape(rb, t, h).astype(dx_ref.dtype)
            da = dr1 if keep1 is None else dr1 * keep1 * drop_scale
            da_ref[...] = da.reshape(rb, t, h).astype(da_ref.dtype)
            if live is None:
                @pl.when(i_row == 0)
                def _init():
                    dn1s_ref[...] = dn1s_p
                    dn1b_ref[...] = dn1b_p

                @pl.when(i_row > 0)
                def _accum():
                    dn1s_ref[...] = dn1s_ref[...] + dn1s_p
                    dn1b_ref[...] = dn1b_ref[...] + dn1b_p
            else:
                dn1s_ref[...] = dn1s_ref[...] + dn1s_p
                dn1b_ref[...] = dn1b_ref[...] + dn1b_p

    if live is None:
        _body()
    else:
        pl.when(live)(_body)

        @pl.when(jnp.logical_not(live) & (c == ff_chunks - 1))
        def _dead():
            dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)
            da_ref[...] = jnp.zeros(da_ref.shape, da_ref.dtype)


# --- backward kernel B2b: weight-side (ff chunks x rows) -----------------------


def _tail_train_bwd_weight_kernel(
    x_ref, a_ref, dr2_ref, n1s_ref, n1b_ref, w1_ref, b1_ref, w2_ref, *rest,
    eps: float, compute_dtype, gelu_approximate: bool, activation: str,
    ffb: int, ff_total: int,
    thresh: Optional[int], drop_scale: float, has_live: bool,
):
    rest = list(rest)
    live_ref = rest.pop(0) if has_live else None
    seed_ref = rest.pop(0) if thresh is not None else None
    dw1_ref, db1_ref, dw2_ref = rest
    rb, t, h = x_ref.shape
    c = pl.program_id(0)  # chunk-major: dW accumulators are chunk-resident
    i_row = pl.program_id(1)
    r0 = i_row * rb * t
    live = live_ref[i_row] != 0 if live_ref is not None else None

    if live is not None:
        @pl.when(i_row == 0)
        def _init_acc():
            dw1_ref[...] = jnp.zeros(dw1_ref.shape, dw1_ref.dtype)
            db1_ref[...] = jnp.zeros(db1_ref.shape, db1_ref.dtype)
            dw2_ref[...] = jnp.zeros(dw2_ref.shape, dw2_ref.dtype)

    def _body():
        u32, _, _, _ = _recompute_u32(
            x_ref, a_ref, n1s_ref, n1b_ref, seed_ref, r0,
            eps=eps, compute_dtype=compute_dtype, thresh=thresh,
            drop_scale=drop_scale,
        )
        u = u32.astype(compute_dtype)
        dr2 = dr2_ref[...].astype(jnp.float32).reshape(rb * t, h)
        dh2 = dr2
        if thresh is not None:
            keep2 = _keep_rows(
                seed_ref[0], TAG_OUT_DROP, r0, 0, (rb * t, h), h, thresh
            )
            dh2 = dr2 * keep2 * drop_scale
        dh2_cd = dh2.astype(compute_dtype)
        z1 = jax.lax.dot_general(
            u, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0].astype(jnp.float32)
        h1 = _act_cd(z1.astype(compute_dtype), activation, gelu_approximate)
        keepm = None
        if thresh is not None:
            keepm = _keep_rows(
                seed_ref[0], TAG_MID_DROP, r0, c * ffb,
                (rb * t, ffb), ff_total, thresh,
            )
            h1 = (
                h1.astype(jnp.float32) * keepm * drop_scale
            ).astype(compute_dtype)
        dh1d = jax.lax.dot_general(
            dh2_cd, w2_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if keepm is not None:
            dh1d = dh1d * keepm * drop_scale
        dh1 = dh1d * _act_grad32(z1, activation, gelu_approximate)
        dh1_cd = dh1.astype(compute_dtype)
        dw1_p = jax.lax.dot_general(
            u, dh1_cd,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1_p = jnp.sum(dh1, axis=0, keepdims=True)
        dw2_p = jax.lax.dot_general(
            h1, dh2_cd,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if live is None:
            @pl.when(i_row == 0)
            def _init():
                dw1_ref[...] = dw1_p
                db1_ref[...] = db1_p
                dw2_ref[...] = dw2_p

            @pl.when(i_row > 0)
            def _accum():
                dw1_ref[...] = dw1_ref[...] + dw1_p
                db1_ref[...] = db1_ref[...] + db1_p
                dw2_ref[...] = dw2_ref[...] + dw2_p
        else:
            dw1_ref[...] = dw1_ref[...] + dw1_p
            db1_ref[...] = db1_ref[...] + db1_p
            dw2_ref[...] = dw2_ref[...] + dw2_p

    if live is None:
        _body()
    else:
        pl.when(live)(_body)


# --- block pickers --------------------------------------------------------
#
# Round-5 VMEM model. The round-4 pickers modeled NOMINAL bytes against a
# 12 MB budget and OOM'd scoped VMEM on real lowering at 512-frame train
# shapes (over by up to 0.9 MB of the 16 MB limit) because two real effects
# were unaccounted:
#   1. Mosaic DOUBLE-BUFFERS every block whose index map varies over the
#      grid (inputs, outputs, and the ff-chunked weight slices) — x2.
#   2. Tile padding: a [rb, 8, H] block pads the 8-sublane dim to the
#      dtype's sublane tile — 16 for bf16, so bf16 row blocks really cost
#      f32 bytes.
# With both modeled, the predicted footprint of the failing config
# (B2a, rb=19, ffb=1536, bf16) is 16.9 MB — matching the compiler's
# reported 16.88 MB. Budget is capped at 13 MB (3 MB slack for Mosaic
# stack scheduling), tunable via STLT_TAIL_TRAIN_VMEM_MB for hardware
# working-set sweeps (round-3 found train kernels prefer SMALL sets).

_VMEM_LIMIT = 13 * 1024 * 1024


def _budget() -> int:
    mb = os.environ.get("STLT_TAIL_TRAIN_VMEM_MB")
    if mb:
        return min(int(float(mb) * 1024 * 1024), _VMEM_LIMIT)
    return _VMEM_BUDGET if _VMEM_BUDGET < _VMEM_LIMIT else _VMEM_LIMIT


def _tiled3(rb: int, t: int, h: int, itemsize: int) -> int:
    """Tiled bytes of one [rb, t, h] row block: lane dim pads to 128, the
    t (sublane) dim to the dtype tile (f32 8, bf16 16)."""
    sub = 16 if itemsize == 2 else 8
    return rb * (-(t // -sub) * sub) * (-(h // -128) * 128) * itemsize


def _pick_fwd_blocks(rows: int, t: int, h: int, ff: int, itemsize: int):
    """(row_block, ff_chunk) for the forward, maximizing rb*ffb under the
    double-buffered + tile-padded footprint."""
    best = None
    for ffb in (ff, ff // 2, ff // 4, ff // 8, ff // 16):
        if not ffb or ff % ffb:
            continue
        # w1/w2 chunks stream over the ff grid dim: x2 buffers each
        fixed = (
            2 * 2 * h * ffb * itemsize
            + 2 * (5 * 8 * h + 8 * ffb) * 4   # f32 vec blocks, x2 buffers
        )
        per_row = (
            4 * 2 * _tiled3(1, t, h, itemsize)  # x, attn in + y, r2 out, x2
            + t * h * (itemsize + 4)            # u (cd) + acc (f32) scratch
            # stack: recompute/finish f32 temps + z1/h1/keep chunk tiles
            + t * (5 * h * 4 + ffb * (8 + itemsize))
        )
        budget = _budget() - fixed
        if budget <= per_row:
            continue
        rb0 = min(budget // per_row, rows)
        if rb0 < 1:
            continue
        rb = _best_row_block(rows, rb0)
        if best is None or rb * ffb > best[0] * best[1]:
            best = (rb, ffb)
    return best


def _pick_b1_rows(rows: int, t: int, h: int, itemsize: int):
    per_row = (
        3 * 2 * _tiled3(1, t, h, itemsize)  # r2, g in + dr2 out, x2 buffers
        + 6 * t * h * 4        # f32 stack (r232, g32, xhat, dr2, dh2, keep2)
    )
    fixed = 8 * 8 * h * 4
    rb0 = min((_budget() - fixed) // per_row, rows)
    if rb0 < 1:
        return None
    return _best_row_block(rows, rb0)


def _pick_b2a_blocks(rows: int, t: int, h: int, ff: int, itemsize: int):
    best = None
    for ffb in (ff, ff // 2, ff // 4, ff // 8, ff // 16):
        if not ffb or ff % ffb:
            continue
        fixed = (
            2 * 2 * h * ffb * itemsize          # w1/w2 chunks, x2 buffers
            + 2 * (6 * 8 * h + 8 * ffb) * 4     # vec blocks
        )
        per_row = (
            5 * 2 * _tiled3(1, t, h, itemsize)  # x, attn, dr2 + dx, da, x2
            + t * h * (itemsize + 2 * 4)        # u (cd) + dh2/du (f32) scratch
            # stack: recompute f32 temps, dh2 cd copy, z1/dh1d/keep/dh1 tiles
            + t * (4 * h * 4 + h * itemsize + ffb * (16 + itemsize))
        )
        budget = _budget() - fixed
        if budget <= per_row:
            continue
        rb0 = min(budget // per_row, rows)
        if rb0 < 1:
            continue
        rb = _best_row_block(rows, rb0)
        if best is None or rb * ffb > best[0] * best[1]:
            best = (rb, ffb)
    return best


def _pick_b2b_blocks(rows: int, t: int, h: int, ff: int, itemsize: int):
    """Chunk-major: the f32 dW1/dW2 chunk accumulators are revisited across
    the row grid dim but still swap (and so double-buffer) per chunk.
    Prefer the LARGEST ff chunk that still leaves a useful row block (fewer
    passes over the token stream — each chunk re-reads x/attn/dr2)."""
    for ffb in (ff, ff // 2, ff // 4, ff // 8, ff // 16):
        if not ffb or ff % ffb:
            continue
        fixed = (
            2 * 2 * h * ffb * itemsize          # w1/w2 chunks, x2 buffers
            + 2 * (2 * h * ffb * 4 + 8 * ffb * 4)  # dW1/db1/dW2 accs, x2
            + 2 * 4 * 8 * h * 4                 # vec blocks
        )
        per_row = (
            3 * 2 * _tiled3(1, t, h, itemsize)  # x, attn, dr2 in, x2 buffers
            # stack: recompute f32 temps + u/dh2 copies + chunk tiles
            + t * (5 * h * 4 + 2 * h * itemsize + ffb * (20 + 2 * itemsize))
        )
        budget = _budget() - fixed
        if budget <= per_row:
            continue
        rb0 = min(budget // per_row, rows)
        # too-small row blocks: per-program overhead dominates (unless the
        # whole input is that small)
        if rb0 < min(8, rows):
            continue
        return _best_row_block(rows, rb0), ffb
    return None


def tail_train_fits(rows: int, t: int, h: int, ff: int, itemsize: int) -> bool:
    """Dispatch predicate: every kernel in the fwd+bwd family must fit
    scoped VMEM at the flattened-token shape."""
    total = rows * t
    r = -(total // -8)
    return (
        _pick_fwd_blocks(r, 8, h, ff, itemsize) is not None
        and _pick_b1_rows(r, 8, h, itemsize) is not None
        and _pick_b2a_blocks(r, 8, h, ff, itemsize) is not None
        and _pick_b2b_blocks(r, 8, h, ff, itemsize) is not None
    )


# Long-context gate (round-5 hardware A/B, docs/PERF_NOTES.md): at the
# headline 17-frame workload the fused train tail LOSES 26% to the XLA
# chain (2596.6 vs 3517.6 clips/s — the step is MXU-bound there and the
# kernel's in-block recompute + chunked dW accumulation can't beat two big
# XLA GEMMs). At 512 frames the picture splits on raggedness: full-length
# batches lose too (71.2 vs 84.1 — no dead blocks to skip, pure kernel
# overhead) while SSv2-fill ragged batches WIN (112.5 vs 106.4 — the
# dead-block compute skip the XLA chain cannot do). Raggedness is not a
# static property (rows_live is a traced array whenever compaction is on),
# so the gate keys on the MODEL's clip length: a ≥256-frame model exists
# precisely because real clips are long-tailed and batches are ragged
# (fill ~28% at 512, docs/PERF_NOTES.md) — the expected-case win. Token
# counts are nearly identical in both regimes (~66-70k), so the regime is
# a property of the model, not the layer shape — encoders advertise it via
# ``clip_frames``. Full-length synthetic sweeps can flip the gate via env
# (=100000 disables, =0 forces) or by monkeypatching this attribute.
TAIL_TRAIN_MIN_FRAMES = int(os.environ.get("STLT_TAIL_TRAIN_MIN_FRAMES", "256"))


def tail_train_wants(
    rows: int, t: int, h: int, ff: int, itemsize: int, clip_frames: int
) -> bool:
    """True when the fused train tail WOULD dispatch under use_pallas=True:
    enabled, long-context per the gate above, and VMEM-fits. The XLA chain
    needs no twin of this predicate: its dropout sites always use the
    hashed streams (HASH_TAIL_DROP above — faster than nn.Dropout on
    hardware AND bit-identical to the kernel), so use_pallas=True/False
    agree whichever way this gate resolves."""
    return (
        FUSED_TAIL_TRAIN_ENABLED
        and clip_frames >= TAIL_TRAIN_MIN_FRAMES
        and tail_train_fits(rows, t, h, ff, itemsize)
    )


# --- launchers ------------------------------------------------------------


def _flatten_tokens(arrs, live, tokens: int):
    """[tokens(+pad), H] arrays -> [R, 8, H]; live [tokens] -> per-8-group
    int32 (max), both padded so R divides the row block later."""
    pad_tok = (-tokens) % 8
    out = []
    for a in arrs:
        if pad_tok:
            a = jnp.pad(a, ((0, pad_tok), (0, 0)))
        out.append(a.reshape((tokens + pad_tok) // 8, 8, a.shape[-1]))
    group_live = None
    if live is not None:
        lv = jnp.asarray(live, jnp.int32)
        if pad_tok:
            lv = jnp.pad(lv, (0, pad_tok))
        group_live = jnp.max(lv.reshape(-1, 8), axis=1)
    return out, group_live, (tokens + pad_tok) // 8


def _row_spec(rb, h, two_d_grid: bool, chunk_major: bool = False):
    if not two_d_grid:
        return pl.BlockSpec((rb, 8, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if chunk_major:
        return pl.BlockSpec(
            (rb, 8, h), lambda c, i: (i, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.BlockSpec((rb, 8, h), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM)


def _vec_spec(width, two_d_grid: bool, chunked: bool = False,
              chunk_major: bool = False):
    if not two_d_grid:
        return pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM)
    if chunk_major:
        idx = (lambda c, i: (0, c)) if chunked else (lambda c, i: (0, 0))
    else:
        idx = (lambda i, c: (0, c)) if chunked else (lambda i, c: (0, 0))
    return pl.BlockSpec((1, width), idx, memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _tail_train(statics, eps, activation, gelu_approximate,
                x, attn_out, n1s, n1b, w1, b1, w2, b2, n2s, n2b, seed, live):
    """statics = (dropout_rate, fwd_blocks|None). x/attn_out: [tokens, H] in the compute
    dtype (pre-flattened by the public wrapper); live: [tokens] int/bool or
    None; seed: uint32 scalar or None. Returns y [tokens, H]."""
    y, _ = _tail_train_fwd(
        statics, eps, activation, gelu_approximate,
        x, attn_out, n1s, n1b, w1, b1, w2, b2, n2s, n2b, seed, live,
    )
    return y


def _prep(statics, x, seed):
    rate = statics[0]
    cdtype = x.dtype
    dropout_on = seed is not None and rate > 0.0
    thresh = _dropout_thresh(rate) if dropout_on else None
    drop_scale = 1.0 / (1.0 - rate) if dropout_on else 0.0
    return cdtype, thresh, drop_scale


def _tail_train_fwd(statics, eps, activation, gelu_approximate,
                    x, attn_out, n1s, n1b, w1, b1, w2, b2, n2s, n2b,
                    seed, live):
    cdtype, thresh, drop_scale = _prep(statics, x, seed)
    tokens, H = x.shape
    FF = w1.shape[1]
    (xf, af), glive, R = _flatten_tokens([x, attn_out], live, tokens)

    blocks = (statics[1] if len(statics) > 1 else None) or _pick_fwd_blocks(
        R, 8, H, FF, jnp.dtype(cdtype).itemsize
    )
    if blocks is None:
        raise RuntimeError(
            "no fused-tail-train forward block configuration fits scoped "
            f"VMEM at (H={H}, FF={FF}, {cdtype}); the dispatch gate "
            "(tail_train_fits) should have kept this shape on the XLA chain"
        )
    rb, ffb = blocks
    pad_rows = (-R) % rb
    if pad_rows:
        xf = _pad_to(xf, 0, rb)
        af = _pad_to(af, 0, rb)
    Rp = R + pad_rows
    grid = (Rp // rb, FF // ffb)

    in_specs = [
        _row_spec(rb, H, True), _row_spec(rb, H, True),
        _vec_spec(H, True), _vec_spec(H, True),
        pl.BlockSpec((H, ffb), lambda i, c: (0, c), memory_space=pltpu.VMEM),
        _vec_spec(ffb, True, chunked=True),
        pl.BlockSpec((ffb, H), lambda i, c: (c, 0), memory_space=pltpu.VMEM),
        _vec_spec(H, True), _vec_spec(H, True), _vec_spec(H, True),
    ]
    operands = [
        xf, af,
        jnp.reshape(n1s, (1, H)).astype(jnp.float32),
        jnp.reshape(n1b, (1, H)).astype(jnp.float32),
        w1.astype(cdtype),
        jnp.reshape(b1, (1, FF)).astype(jnp.float32),
        w2.astype(cdtype),
        jnp.reshape(b2, (1, H)).astype(jnp.float32),
        jnp.reshape(n2s, (1, H)).astype(jnp.float32),
        jnp.reshape(n2b, (1, H)).astype(jnp.float32),
    ]
    has_live = glive is not None
    if has_live:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(_block_live(glive, pad_rows, rb))
    if thresh is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.reshape(seed, (1,)).astype(jnp.uint32))

    y, r2 = pl.pallas_call(
        functools.partial(
            _tail_train_fwd_kernel,
            eps=float(eps), compute_dtype=jnp.dtype(cdtype),
            gelu_approximate=bool(gelu_approximate), activation=activation,
            ff_chunks=FF // ffb, ffb=ffb, ff_total=FF,
            thresh=thresh, drop_scale=drop_scale, has_live=has_live,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(_row_spec(rb, H, True), _row_spec(rb, H, True)),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, 8, H), cdtype),
            jax.ShapeDtypeStruct((Rp, 8, H), cdtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb * 8, H), cdtype),
            pltpu.VMEM((rb * 8, H), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    y = y.reshape(Rp * 8, H)[:tokens]
    r2 = r2.reshape(Rp * 8, H)[:tokens]
    if live is not None:
        # Per-token dead-row contract: the kernel's skip is row-block-
        # granular, so dead tokens inside a mixed block carry computed
        # values — zero them here (fuses into the slice above).
        keep = live[:, None]
        y = jnp.where(keep, y, jnp.zeros((), y.dtype))
        r2 = jnp.where(keep, r2, jnp.zeros((), r2.dtype))
    return y, (x, attn_out, n1s, n1b, w1, b1, w2, n2s, seed, live, r2)


def _tail_train_bwd(statics, eps, activation, gelu_approximate, residuals, g):
    x, attn_out, n1s, n1b, w1, b1, w2, n2s, seed, live, r2 = residuals
    cdtype, thresh, drop_scale = _prep(statics, x, seed)
    tokens, H = x.shape
    FF = w1.shape[1]
    itemsize = jnp.dtype(cdtype).itemsize

    g = g.astype(cdtype)
    if live is not None:
        # Exact VJP of the masked forward (dead outputs are constants), and
        # the per-token guarantee for every accumulated grad: with g zeroed
        # on dead rows, dr2 = ln_bwd(0) = 0 there (row-local), so dead rows
        # inside mixed blocks contribute exactly zero to dW/db/dn sums and
        # dx/dattn come out exactly zero.
        g = jnp.where(live[:, None], g, jnp.zeros((), g.dtype))
    (xf, af, dr2f_in, gf), glive, R = _flatten_tokens(
        [x, attn_out, r2, g], live, tokens
    )
    r2f = dr2f_in  # naming: flattened r2

    seed_ops, seed_specs_smem = [], []
    if thresh is not None:
        seed_ops = [jnp.reshape(seed, (1,)).astype(jnp.uint32)]
        seed_specs_smem = [pl.BlockSpec(memory_space=pltpu.SMEM)]

    # --- B1: rows-only LN2 backward -> dr2 + (dn2s, dn2b, db2) ---
    rb1 = _pick_b1_rows(R, 8, H, itemsize)
    if rb1 is None:
        raise RuntimeError("fused-tail-train B1 does not fit scoped VMEM")
    pad1 = (-R) % rb1
    r2p = _pad_to(r2f, 0, rb1) if pad1 else r2f
    gp = _pad_to(gf, 0, rb1) if pad1 else gf
    has_live = glive is not None
    live_ops1 = [_block_live(glive, pad1, rb1)] if has_live else []
    live_specs1 = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] if has_live else []
    )
    dr2, dn2s, dn2b, db2 = pl.pallas_call(
        functools.partial(
            _tail_train_bwd_row_kernel,
            eps=float(eps), compute_dtype=jnp.dtype(cdtype),
            thresh=thresh, drop_scale=drop_scale, has_live=has_live,
        ),
        grid=((R + pad1) // rb1,),
        in_specs=[
            _row_spec(rb1, H, False), _row_spec(rb1, H, False),
            _vec_spec(H, False),
            *live_specs1, *seed_specs_smem,
        ],
        out_specs=(
            _row_spec(rb1, H, False),
            _vec_spec(H, False), _vec_spec(H, False), _vec_spec(H, False),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R + pad1, 8, H), cdtype),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        r2p, gp, jnp.reshape(n2s, (1, H)).astype(jnp.float32),
        *live_ops1, *seed_ops,
    )
    dr2 = dr2[:R]

    # --- B2a: input-side -> dx, dattn + (dn1s, dn1b) ---
    blocks = _pick_b2a_blocks(R, 8, H, FF, itemsize)
    if blocks is None:
        raise RuntimeError("fused-tail-train B2a does not fit scoped VMEM")
    rb2, ffb2 = blocks
    pad2 = (-R) % rb2
    xp = _pad_to(xf, 0, rb2) if pad2 else xf
    ap = _pad_to(af, 0, rb2) if pad2 else af
    dr2p = _pad_to(dr2, 0, rb2) if pad2 else dr2
    live_ops2 = [_block_live(glive, pad2, rb2)] if has_live else []
    w1_cd = w1.astype(cdtype)
    w2_cd = w2.astype(cdtype)
    n1s_r = jnp.reshape(n1s, (1, H)).astype(jnp.float32)
    n1b_r = jnp.reshape(n1b, (1, H)).astype(jnp.float32)
    b1_r = jnp.reshape(b1, (1, FF)).astype(jnp.float32)
    dx, dattn, dn1s, dn1b = pl.pallas_call(
        functools.partial(
            _tail_train_bwd_input_kernel,
            eps=float(eps), compute_dtype=jnp.dtype(cdtype),
            gelu_approximate=bool(gelu_approximate), activation=activation,
            ff_chunks=FF // ffb2, ffb=ffb2, ff_total=FF,
            thresh=thresh, drop_scale=drop_scale, has_live=has_live,
        ),
        grid=((R + pad2) // rb2, FF // ffb2),
        in_specs=[
            _row_spec(rb2, H, True), _row_spec(rb2, H, True),
            _row_spec(rb2, H, True),
            _vec_spec(H, True), _vec_spec(H, True),
            pl.BlockSpec((H, ffb2), lambda i, c: (0, c), memory_space=pltpu.VMEM),
            _vec_spec(ffb2, True, chunked=True),
            pl.BlockSpec((ffb2, H), lambda i, c: (c, 0), memory_space=pltpu.VMEM),
            *(live_specs1 if has_live else []), *seed_specs_smem,
        ],
        out_specs=(
            _row_spec(rb2, H, True), _row_spec(rb2, H, True),
            _vec_spec(H, True), _vec_spec(H, True),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R + pad2, 8, H), cdtype),
            jax.ShapeDtypeStruct((R + pad2, 8, H), cdtype),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb2 * 8, H), cdtype),
            pltpu.VMEM((rb2 * 8, H), jnp.float32),
            pltpu.VMEM((rb2 * 8, H), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(
        xp, ap, dr2p, n1s_r, n1b_r, w1_cd, b1_r, w2_cd,
        *live_ops2, *seed_ops,
    )
    dx = dx[:R]
    dattn = dattn[:R]

    # --- B2b: weight-side (chunk-major) -> dW1, db1, dW2 ---
    blocks = _pick_b2b_blocks(R, 8, H, FF, itemsize)
    if blocks is None:
        raise RuntimeError("fused-tail-train B2b does not fit scoped VMEM")
    rb3, ffb3 = blocks
    pad3 = (-R) % rb3
    xp = _pad_to(xf, 0, rb3) if pad3 else xf
    ap = _pad_to(af, 0, rb3) if pad3 else af
    dr2p = _pad_to(dr2, 0, rb3) if pad3 else dr2
    live_ops3 = [_block_live(glive, pad3, rb3)] if has_live else []
    dw1, db1, dw2 = pl.pallas_call(
        functools.partial(
            _tail_train_bwd_weight_kernel,
            eps=float(eps), compute_dtype=jnp.dtype(cdtype),
            gelu_approximate=bool(gelu_approximate), activation=activation,
            ffb=ffb3, ff_total=FF,
            thresh=thresh, drop_scale=drop_scale, has_live=has_live,
        ),
        grid=(FF // ffb3, (R + pad3) // rb3),
        in_specs=[
            _row_spec(rb3, H, True, chunk_major=True),
            _row_spec(rb3, H, True, chunk_major=True),
            _row_spec(rb3, H, True, chunk_major=True),
            _vec_spec(H, True, chunk_major=True),
            _vec_spec(H, True, chunk_major=True),
            pl.BlockSpec((H, ffb3), lambda c, i: (0, c), memory_space=pltpu.VMEM),
            _vec_spec(ffb3, True, chunked=True, chunk_major=True),
            pl.BlockSpec((ffb3, H), lambda c, i: (c, 0), memory_space=pltpu.VMEM),
            *(live_specs1 if has_live else []), *seed_specs_smem,
        ],
        out_specs=(
            pl.BlockSpec((H, ffb3), lambda c, i: (0, c), memory_space=pltpu.VMEM),
            _vec_spec(ffb3, True, chunked=True, chunk_major=True),
            pl.BlockSpec((ffb3, H), lambda c, i: (c, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, FF), jnp.float32),
            jax.ShapeDtypeStruct((1, FF), jnp.float32),
            jax.ShapeDtypeStruct((FF, H), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        xp, ap, dr2p, n1s_r, n1b_r, w1_cd, b1_r, w2_cd,
        *live_ops3, *seed_ops,
    )

    def unflat(a):
        a = a.reshape(R * 8, H)[:tokens]
        if live is not None:
            # analytically already zero at dead rows (see g masking above);
            # pinned here so the contract survives any kernel refactor
            a = jnp.where(live[:, None], a, jnp.zeros((), a.dtype))
        return a

    return (
        unflat(dx), unflat(dattn),
        dn1s[0], dn1b[0],
        dw1, db1[0], dw2, db2[0],
        dn2s[0], dn2b[0],
        None, None,
    )


_tail_train.defvjp(_tail_train_fwd, _tail_train_bwd)


def fused_layer_tail_train(
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
    dropout_rate: float = 0.0,
    seed: Optional[jnp.ndarray] = None,
    rows_live: Optional[jnp.ndarray] = None,
    tokens_live: Optional[jnp.ndarray] = None,
    fwd_blocks: Optional[tuple] = None,
) -> jnp.ndarray:
    """Differentiable fused train tail. x/attn_out: [B, T, H]; returns
    [B, T, H] in the compute dtype. ``seed``: uint32 scalar (one per layer
    instance, drawn from the flax "dropout" RNG) or None for no dropout.
    ``fwd_blocks``: (row_block, ff_chunk) override for the forward picker
    (tests exercise the 8-token skip granularity with row_block=1)."""
    B, T, H = x.shape
    cdtype = jnp.dtype(compute_dtype)
    live = None
    if tokens_live is not None:
        live = jnp.asarray(tokens_live, bool).reshape(B * T)
    elif rows_live is not None:
        live = jnp.repeat(jnp.asarray(rows_live, bool), T)
    y = _tail_train(
        (float(dropout_rate), fwd_blocks), float(eps), activation,
        bool(gelu_approximate),
        x.astype(cdtype).reshape(B * T, H),
        attn_out.astype(cdtype).reshape(B * T, H),
        n1_scale, n1_bias, w1, b1, w2, b2, n2_scale, n2_bias,
        seed, live,
    )
    return y.reshape(B, T, H)
