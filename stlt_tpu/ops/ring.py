"""Ring attention over the ``context`` (sequence-parallel) mesh axis.

With plain GSPMD, sharding the frame axis buys input/FFN sharding but XLA
all-gathers the full K/V sequence for temporal attention — every context
shard then holds (and attends over) the whole sequence. Ring attention keeps
attention state sharded (SURVEY.md §5 long-context row; the capability the
reference's 256-entry position table hints at, reference configs.py:109):

- queries stay resident: each device owns its ``T/C`` frame rows;
- K/V chunks rotate around the ring via ``ppermute`` (C steps, each
  overlapping the previous step's compute);
- each ring step IS a blockwise-attention call: the per-chunk math runs
  through the SAME Pallas kernels as single-device long-context attention
  (``ops.flash._blockwise_forward`` / ``_blockwise_backward``), so no
  [b, n, t, s] probability block is ever materialized in HBM — per-step
  partials are merged by the standard normalized-segment rule
  (lse' = logaddexp, outputs reweighted by exp(lse_i − lse')).

v2 (round 3): the whole per-device ring is wrapped in a ``custom_vjp``. The
round-2 version let autodiff trace through the fori_loop, which saved every
ROTATED K/V chunk as a residual — each device effectively stored the full
K/V sequence for backward, collapsing the memory story to a measured −9%.
Now the residuals are only the device's OWN shards (q, k₀, v₀, bias rows,
out, lse — all 1/C-sized), and the backward re-runs the ring: K/V chunks
rotate again, each step reuses the blockwise backward kernels with the saved
GLOBAL logsumexp (p = exp(z − lse) is the globally-normalized probability,
so per-chunk dq/dk/dv contributions sum exactly); dk/dv accumulators travel
the ring WITH their chunk and arrive home after C steps.

Causal + key-padding semantics match the reference
(``utils/model_utils.py:4-7``). Two bias forms: a dense ``[B, 1, T, S]``
additive bias (each device keeps its query rows' bias and slices the column
block matching the K/V chunk it currently holds — O(T²/C) per device), or —
the production long-context form — ``kv_lengths`` [B] + ``causal``, where
each ring step GENERATES its bias tile in-kernel from the lengths and the
step's global [row, col] offsets, so no sequence²-sized buffer exists
anywhere under sequence parallelism (round 4; the SP counterpart of the
round-3 single-device lengths mode). Attention-probability dropout composes:
the caller's keep-mask columns are sliced the same way, the denominator
accumulates undropped probabilities (PyTorch drops after normalization).

Numerics: f32 logits/softmax state regardless of compute dtype; masked-out
terms use finite large-negative bias so ``exp`` underflows to 0 without
inf−inf NaNs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from stlt_tpu.ops.flash import _blockwise_backward, _blockwise_forward, _lowbias32
from stlt_tpu.parallel.mesh import CONTEXT_AXIS, DATA_AXIS, MODEL_AXIS

_NEG_INF = -1e30


class _RingStatics(NamedTuple):
    """Hashable per-call configuration (a custom_vjp nondiff argument)."""

    axis_name: str
    mesh_axes: tuple
    num_chunks: int
    dropout_rate: float
    dropout_mode: str  # "none" | "mask" | "seed"
    model_size: int = 1
    # Lengths mode (round 4): the caller passes per-clip kv lengths instead
    # of a dense bias; each ring step generates its causal+padding bias tile
    # IN-KERNEL from the lengths plus this step's global [row, col] offsets —
    # no O(T²/C) bias slice ships to (or lives on) any device.
    causal: bool = False
    lengths: bool = False


def _device_seed(statics: _RingStatics, seed):
    """Per-device base seed: fold every mesh coordinate in so no two devices
    share a hash lane (local (b, n, t) indices repeat across shards)."""
    data_ax, model_ax, ctx_ax = statics.mesh_axes
    dev = (
        jax.lax.axis_index(data_ax) * statics.model_size
        + jax.lax.axis_index(model_ax)
    ) * statics.num_chunks + jax.lax.axis_index(ctx_ax)
    return _lowbias32(jnp.uint32(seed) ^ jnp.uint32(dev))


def _step_seed(seed_dev, chunk):
    """Per-ring-step seed: each K/V chunk gets independent bits (the
    blockwise kernels hash LOCAL coordinates, which repeat per chunk)."""
    return _lowbias32(seed_dev ^ jnp.uint32(chunk))


def _varying(x, mesh_axes):
    # The ring's shard_maps run with check_vma=False (pallas_call out_shapes
    # carry no VMA type, which the checker rejects), so carries need no
    # pcast-to-varying; kept as a seam in case VMA support lands in pallas.
    del mesh_axes
    return x


def _chunk_cols(arr, chunk, s):
    return jax.lax.dynamic_slice_in_dim(arr, chunk * s, s, axis=3)


def _ring_forward(statics: _RingStatics, q, k0, v0, bias_rows, mask_rows,
                  seed, kv_len=None):
    """Per-device forward. q: [b, t, n, d]; k0/v0: [b, s, n, d] (home chunk);
    bias_rows: [b, 1, t, S] (dense mode) or None (lengths mode, with
    ``kv_len`` [b] int32 — the kernels generate each step's bias tile from
    the lengths + this device's global row offset + the held chunk's global
    column offset); mask_rows: [b, n|1, t, S] or None; seed: uint32
    scalar or None (in-kernel hashed dropout — the sequence-parallel
    counterpart of the single-device seed path: no O(T²/C) mask per device).
    Returns (out [b, t, n, d], lse [b, n, t])."""
    b, t, n, d = q.shape
    s = k0.shape[1]
    C = statics.num_chunks
    dropout_scale = (
        1.0 / (1.0 - statics.dropout_rate)
        if statics.dropout_mode != "none"
        else 0.0
    )
    idx = jax.lax.axis_index(statics.axis_name)
    seed_dev = (
        _device_seed(statics, seed) if statics.dropout_mode == "seed" else None
    )
    qt = q.transpose(0, 2, 1, 3)  # [b, n, t, d]
    perm = [(i, (i + 1) % C) for i in range(C)]

    row0 = idx * t

    def step(j, carry):
        k_c, v_c, o_r, lse_r = carry
        chunk = (idx - j) % C
        cols_b = None if statics.lengths else _chunk_cols(bias_rows, chunk, s)
        cols_m = (
            _chunk_cols(mask_rows, chunk, s)
            if statics.dropout_mode == "mask"
            else None
        )
        # The Pallas blockwise kernel: per-chunk normalized output + lse.
        o_j, lse_j = _blockwise_forward(
            qt,
            k_c.transpose(0, 2, 1, 3),
            v_c.transpose(0, 2, 1, 3),
            cols_b,
            cols_m,
            dropout_scale,
            seed=_step_seed(seed_dev, chunk) if seed_dev is not None else None,
            dropout_rate=statics.dropout_rate,
            causal=statics.causal and statics.lengths,
            kv_lengths=kv_len if statics.lengths else None,
            offsets=jnp.stack([row0, chunk * s]) if statics.lengths else None,
        )
        # Normalized-segment merge (exact online softmax across chunks).
        lse_new = jnp.logaddexp(lse_r, lse_j)
        o_new = (
            o_r * jnp.exp(lse_r - lse_new)[..., None]
            + o_j.astype(jnp.float32) * jnp.exp(lse_j - lse_new)[..., None]
        )
        # Rotate even on the last step: K/V land back home, and the permute
        # overlaps the final merge.
        k_c = jax.lax.ppermute(k_c, statics.axis_name, perm)
        v_c = jax.lax.ppermute(v_c, statics.axis_name, perm)
        return k_c, v_c, o_new, lse_new

    init = (
        k0,
        v0,
        _varying(jnp.zeros((b, n, t, d), jnp.float32), statics.mesh_axes),
        _varying(jnp.full((b, n, t), _NEG_INF, jnp.float32), statics.mesh_axes),
    )
    *_, o, lse = jax.lax.fori_loop(0, C, step, init)
    return o.transpose(0, 2, 1, 3).astype(v0.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_attn(statics: _RingStatics, q, k0, v0, bias_rows, mask_rows, seed,
               kv_len):
    return _ring_forward(
        statics, q, k0, v0, bias_rows, mask_rows, seed, kv_len
    )[0]


def _ring_attn_fwd(statics, q, k0, v0, bias_rows, mask_rows, seed, kv_len):
    out, lse = _ring_forward(
        statics, q, k0, v0, bias_rows, mask_rows, seed, kv_len
    )
    # Residuals are the device's OWN shards only — every entry is 1/C of the
    # global sequence. No rotated chunk is saved.
    return out, (q, k0, v0, bias_rows, mask_rows, seed, kv_len, out, lse)


def _ring_attn_bwd(statics, res, g):
    q, k0, v0, bias_rows, mask_rows, seed, kv_len, out, lse = res
    b, t, n, d = q.shape
    s = k0.shape[1]
    C = statics.num_chunks
    dropout_scale = (
        1.0 / (1.0 - statics.dropout_rate)
        if statics.dropout_mode != "none"
        else 0.0
    )
    idx = jax.lax.axis_index(statics.axis_name)
    seed_dev = (
        _device_seed(statics, seed) if statics.dropout_mode == "seed" else None
    )
    perm = [(i, (i + 1) % C) for i in range(C)]
    qt = q.transpose(0, 2, 1, 3)
    gt = g.transpose(0, 2, 1, 3)
    out_t = out.transpose(0, 2, 1, 3)

    row0 = idx * t

    def step(j, carry):
        k_c, v_c, dk_c, dv_c, dq_acc = carry
        chunk = (idx - j) % C
        cols_b = None if statics.lengths else _chunk_cols(bias_rows, chunk, s)
        cols_m = (
            _chunk_cols(mask_rows, chunk, s)
            if statics.dropout_mode == "mask"
            else None
        )
        # Blockwise backward kernels with the GLOBAL lse: p = exp(z − lse)
        # is the globally-normalized probability block, so the per-chunk
        # dq contributions sum to the exact total and (dk_j, dv_j) is the
        # exact gradient slice for the chunk currently held.
        dq_j, dk_j, dv_j = _blockwise_backward(
            qt,
            k_c.transpose(0, 2, 1, 3),
            v_c.transpose(0, 2, 1, 3),
            cols_b,
            cols_m,
            gt,
            out_t,
            lse,
            dropout_scale,
            seed=_step_seed(seed_dev, chunk) if seed_dev is not None else None,
            dropout_rate=statics.dropout_rate,
            causal=statics.causal and statics.lengths,
            kv_lengths=kv_len if statics.lengths else None,
            offsets=jnp.stack([row0, chunk * s]) if statics.lengths else None,
        )
        dq_acc = dq_acc + dq_j.astype(jnp.float32)
        dk_c = dk_c + dk_j.transpose(0, 2, 1, 3).astype(jnp.float32)
        dv_c = dv_c + dv_j.transpose(0, 2, 1, 3).astype(jnp.float32)
        # dk/dv accumulators travel WITH their chunk; after C rotations each
        # chunk's gradient lands back on its home device fully accumulated.
        k_c = jax.lax.ppermute(k_c, statics.axis_name, perm)
        v_c = jax.lax.ppermute(v_c, statics.axis_name, perm)
        dk_c = jax.lax.ppermute(dk_c, statics.axis_name, perm)
        dv_c = jax.lax.ppermute(dv_c, statics.axis_name, perm)
        return k_c, v_c, dk_c, dv_c, dq_acc

    init = (
        k0,
        v0,
        _varying(jnp.zeros((b, s, n, d), jnp.float32), statics.mesh_axes),
        _varying(jnp.zeros((b, s, n, d), jnp.float32), statics.mesh_axes),
        _varying(jnp.zeros((b, n, t, d), jnp.float32), statics.mesh_axes),
    )
    *_, dk, dv, dq = jax.lax.fori_loop(0, C, step, init)
    return (
        dq.transpose(0, 2, 1, 3).astype(q.dtype),
        dk.astype(k0.dtype),
        dv.astype(v0.dtype),
        None,
        None,
        None,
        None,
    )


_ring_attn.defvjp(_ring_attn_fwd, _ring_attn_bwd)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    mesh: Mesh,
    *,
    dropout_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    kv_lengths: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel self-attention. q/k/v: [B, T, N, D] (global view,
    T sharded over the ``context`` mesh axis, N over ``model``). The
    attention bias comes in ONE of two forms:

    - ``bias`` broadcastable to [B, 1, T, S] (head-invariant — the
      causal+padding form every model here uses): each device keeps its
      query rows' slice and slices the column block matching the K/V chunk
      it currently holds — an O(T²/C) buffer per device;
    - ``kv_lengths`` [B] int32 (+ ``causal``), matching the single-device
      blockwise kernels (reference mask semantics utils/model_utils.py:4-7:
      key s of clip b attends iff s < kv_lengths[b], and s <= t when
      causal): the bias tile is GENERATED inside each ring step's kernel
      from the lengths and the step's global [row, col] offsets — no
      sequence²-sized buffer exists anywhere under sequence parallelism
      (the production long-context train path).

    Returns [B, T, N, D] with the same shardings.

    Dropout: pass at most one of ``dropout_mask`` (a global [B, N, T, S]
    keep mask, sharded by the in_specs — exact-stream tests) or
    ``dropout_seed`` (uint32 scalar: keep bits hash in-kernel from a seed
    folded with every mesh coordinate and the ring-step chunk id, so no
    O(T²/C) mask buffer exists per device — the production train path)."""
    assert dropout_mask is None or dropout_seed is None
    assert bias is None or kv_lengths is None, (
        "pass a dense bias OR kv_lengths (+ causal), not both"
    )
    B, T, N, D = q.shape
    C = mesh.shape[CONTEXT_AXIS]
    assert T % C == 0, f"frame axis {T} must divide context axis {C}"
    lengths_mode = kv_lengths is not None
    if not lengths_mode:
        if bias is None:
            bias = jnp.zeros((1, 1, T, T), jnp.float32)
        while bias.ndim < 4:
            bias = bias[None]
        assert bias.shape[1] == 1, "ring attention expects head-invariant bias"
        bias = jnp.broadcast_to(bias.astype(jnp.float32), (B, 1, T, T))

    qkv_spec = P(DATA_AXIS, CONTEXT_AXIS, MODEL_AXIS, None)
    bias_spec = P(DATA_AXIS, None, CONTEXT_AXIS, None)
    mask_spec = P(DATA_AXIS, MODEL_AXIS, CONTEXT_AXIS, None)

    mode = "none"
    if dropout_mask is not None:
        mode = "mask"
    elif dropout_seed is not None:
        mode = "seed"
    statics = _RingStatics(
        axis_name=CONTEXT_AXIS,
        mesh_axes=tuple(mesh.axis_names),
        num_chunks=C,
        dropout_rate=float(dropout_rate),
        dropout_mode=mode,
        model_size=mesh.shape[MODEL_AXIS],
        causal=bool(causal),
        lengths=lengths_mode,
    )

    # One operand slot carries the bias form: the dense rows slice (dense
    # mode) or the [B] lengths vector (lengths mode, batch-sharded like the
    # clips it describes).
    operands = [q, k, v]
    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    if lengths_mode:
        operands.append(jnp.asarray(kv_lengths, jnp.int32))
        in_specs.append(P(DATA_AXIS))
    else:
        operands.append(bias)
        in_specs.append(bias_spec)
    if mode == "mask":
        operands.append(dropout_mask)
        in_specs.append(mask_spec)
    elif mode == "seed":
        operands.append(jnp.asarray(dropout_seed, jnp.uint32))
        in_specs.append(P())

    def shard_fn(q_, k_, v_, b_, *extra):
        mask_ = extra[0] if mode == "mask" else None
        seed_ = extra[0] if mode == "seed" else None
        bias_rows = None if lengths_mode else b_
        kv_len = b_ if lengths_mode else None
        return _ring_attn(
            statics, q_, k_, v_, bias_rows, mask_, seed_, kv_len
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return fn(*operands)
