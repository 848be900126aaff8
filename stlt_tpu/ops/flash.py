"""Fused attention Pallas kernel for TPU.

The TPU-native replacement for the attention math inside
``torch.nn.MultiheadAttention`` (reference models.py passim). The model
family's sequence lengths are tiny — 8 box tokens/frame (spatial), 17 frames
(temporal), 33 appearance tokens — so the classic KV-blocked flash loop is
pointless; the profitable structure is a **row-blocked fully-fused kernel**:

- grid over (batch-blocks × heads); each program loads a ``[Rb, T, D]`` q
  block plus the matching k/v blocks into VMEM, computes QKᵀ·scale + bias →
  softmax → PV entirely on-chip (f32 accumulation), and writes only the
  output block. The ``[*, T, S]`` probability tensor never touches HBM —
  that's the bandwidth the XLA path spends at these shapes.
- bias stays collapsed over heads when it is head-invariant (``[B, 1, T, S]``,
  how the models combine causal + key-padding masks), read once per program.

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


def _fused_attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # q_ref: [Rb, 1, T, D]; k_ref/v_ref: [Rb, 1, S, D]; bias_ref: [Rb, 1, T, S]
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
    out = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, 0] = out.astype(o_ref.dtype)


def _pick_row_block(rows: int, t: int, s: int, d: int) -> int:
    """Batch rows per program: target ~1 MB of q+k+v+o+probs in VMEM."""
    bytes_per_row = (2 * t * d + 2 * s * d + 2 * t * s) * 4
    target = 1024 * 1024
    rb = max(1, target // max(bytes_per_row, 1))
    rb = min(rb, rows)
    while rows % rb:
        rb -= 1
    return rb


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q: [B, T, N, D]; k, v: [B, S, N, D]; bias broadcastable to
    [B, N, T, S] (given with leading dims of size 1 or matching).
    Returns [B, T, N, D]."""
    B, T, N, D = q.shape
    S = k.shape[1]
    bias4 = None
    if bias is not None:
        bias4 = jnp.asarray(bias, jnp.float32)
        while bias4.ndim < 4:
            bias4 = bias4[None]
    return _flash_custom(q, k, v, bias4)


@jax.custom_vjp
def _flash_custom(q, k, v, bias4):
    return _flash_forward(q, k, v, bias4)


def _flash_forward(q, k, v, bias4):
    B, T, N, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D ** 0.5)

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

    rb = _pick_row_block(B, T, S, D)
    grid = (B // rb, N)

    def qkv_spec(seq):
        return pl.BlockSpec(
            (rb, 1, seq, D), lambda i, n: (i, n, 0, 0), memory_space=pltpu.VMEM
        )

    if bias_n == 1:
        bias_spec = pl.BlockSpec(
            (rb, 1, T, S), lambda i, n: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        bias_spec = pl.BlockSpec(
            (rb, 1, T, S), lambda i, n: (i, n, 0, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_fused_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[qkv_spec(T), qkv_spec(S), qkv_spec(S), bias_spec],
        out_specs=qkv_spec(T),
        out_shape=jax.ShapeDtypeStruct((B, N, T, D), v.dtype),
        interpret=jax.default_backend() == "cpu",
    )(qt, kt, vt, bias_arr)
    return out.transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, bias4):
    return _flash_forward(q, k, v, bias4), (q, k, v, bias4)


def _flash_bwd(residuals, g):
    q, k, v, bias4 = residuals
    # Recompute-based backward through the XLA reference (numerically the
    # same attention); cheap at these sequence lengths.
    _, vjp = jax.vjp(
        lambda q_, k_, v_: dot_product_attention_reference(q_, k_, v_, bias4), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_custom.defvjp(_flash_fwd, _flash_bwd)
