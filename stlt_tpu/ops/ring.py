"""Ring attention over the ``context`` (sequence-parallel) mesh axis.

With plain GSPMD, sharding the frame axis buys input/FFN sharding but XLA
all-gathers the full K/V sequence for temporal attention — every context
shard then holds (and attends over) the whole sequence. Ring attention keeps
attention state sharded (SURVEY.md §5 long-context row; the capability the
reference's 256-entry position table hints at, reference configs.py:109):

- queries stay resident: each device owns its ``T/C`` frame rows;
- K/V chunks rotate around the ring via ``ppermute`` (C steps, each overlapping
  the previous step's compute);
- softmax is accumulated online (running max / sum / accumulator), exactly the
  blockwise flash decomposition — the ring step IS a KV block step whose
  "block" lives on another device.

Causal + key-padding semantics match the reference
(``utils/model_utils.py:4-7``): the caller passes the full additive bias
``[B, 1, T, S]``; each device keeps its query rows' bias and slices the
column block matching the K/V chunk it currently holds. Attention-probability
dropout composes: the caller's keep-mask columns are sliced the same way, the
denominator accumulates undropped probabilities (PyTorch drops after
normalization).

Numerics: f32 logits/softmax state regardless of compute dtype; masked-out
terms use finite large-negative bias so ``exp`` underflows to 0 without
inf−inf NaNs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from stlt_tpu.parallel.mesh import CONTEXT_AXIS, DATA_AXIS, MODEL_AXIS

_NEG_INF = -1e30


def _ring_body(q, k0, v0, bias_rows, mask_rows, *, axis_name: str,
               mesh_axes: tuple, num_chunks: int, scale: float,
               dropout_scale: float):
    """Per-device function under shard_map.

    q: [b, t, n, d] (local rows); k0/v0: [b, s, n, d] (local chunk);
    bias_rows: [b, 1, t, S_global]; mask_rows: [b, n, t, S_global] or None.
    """
    b, t, n, d = q.shape
    s = k0.shape[1]
    idx = jax.lax.axis_index(axis_name)
    qf = q.astype(jnp.float32)

    perm = [(i, (i + 1) % num_chunks) for i in range(num_chunks)]

    def step(j, carry):
        k_c, v_c, m, l, acc = carry
        chunk = (idx - j) % num_chunks  # global chunk id currently held
        cols = jax.lax.dynamic_slice_in_dim(bias_rows, chunk * s, s, axis=3)
        logits = (
            jnp.einsum(
                "btnd,bsnd->bnts", qf, k_c.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            * scale
            + cols.astype(jnp.float32)
        )
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        pv = p
        if mask_rows is not None:
            keep = jax.lax.dynamic_slice_in_dim(mask_rows, chunk * s, s, axis=3)
            pv = p * (keep.astype(jnp.float32) * dropout_scale)
        acc = acc * corr[..., None] + jnp.einsum(
            "bnts,bsnd->bntd", pv, v_c.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        # Rotate even on the last step: K/V land back home, and the permute
        # overlaps the final accumulation.
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        return k_c, v_c, m_new, l, acc

    # pcast-to-varying: loop-carry inits must carry the same varying-manual-axes type
    # as the body outputs (jax >= 0.9 shard_map VMA checking).
    init = (
        k0,
        v0,
        jax.lax.pcast(jnp.full((b, n, t), _NEG_INF, jnp.float32), mesh_axes, to="varying"),
        jax.lax.pcast(jnp.zeros((b, n, t), jnp.float32), mesh_axes, to="varying"),
        jax.lax.pcast(jnp.zeros((b, n, t, d), jnp.float32), mesh_axes, to="varying"),
    )
    *_, m, l, acc = jax.lax.fori_loop(0, num_chunks, step, init)
    out = acc / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(v0.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    mesh: Mesh,
    *,
    dropout_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """Sequence-parallel self-attention. q/k/v: [B, T, N, D] (global view,
    T sharded over the ``context`` mesh axis, N over ``model``); bias
    broadcastable to [B, 1, T, S] (head-invariant — the causal+padding form
    every model here uses). Returns [B, T, N, D] with the same shardings."""
    B, T, N, D = q.shape
    C = mesh.shape[CONTEXT_AXIS]
    assert T % C == 0, f"frame axis {T} must divide context axis {C}"
    if bias is None:
        bias = jnp.zeros((1, 1, T, T), jnp.float32)
    while bias.ndim < 4:
        bias = bias[None]
    assert bias.shape[1] == 1, "ring attention expects head-invariant bias"
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (B, 1, T, T))

    qkv_spec = P(DATA_AXIS, CONTEXT_AXIS, MODEL_AXIS, None)
    bias_spec = P(DATA_AXIS, None, CONTEXT_AXIS, None)
    mask_spec = P(DATA_AXIS, MODEL_AXIS, CONTEXT_AXIS, None)

    body = functools.partial(
        _ring_body,
        axis_name=CONTEXT_AXIS,
        mesh_axes=tuple(mesh.axis_names),
        num_chunks=C,
        scale=1.0 / (D ** 0.5),
        dropout_scale=1.0 / (1.0 - dropout_rate),
    )
    if dropout_mask is None:
        fn = jax.shard_map(
            lambda q_, k_, v_, b_: body(q_, k_, v_, b_, None),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
            out_specs=qkv_spec,
        )
        return fn(q, k, v, bias)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec),
        out_specs=qkv_spec,
    )
    return fn(q, k, v, bias, dropout_mask)
