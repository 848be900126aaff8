"""Scaled-dot-product attention core with a pluggable Pallas fast path.

The reference delegates attention to ``torch.nn.MultiheadAttention`` (cuDNN);
the TPU-native equivalent is this module: an XLA einsum reference path plus a
fused Pallas flash-attention kernel (``stlt_tpu.ops.flash``) selected by
``use_pallas``. Numerics: logits and softmax are computed in float32 regardless
of the compute dtype (bf16 inputs are fine — the MXU accumulates in f32 via
``preferred_element_type``), matching PyTorch's f32 attention math closely
enough for checkpoint parity.

Shapes follow the JAX convention ``[batch, seq, heads, head_dim]``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dropout_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """Plain XLA attention. q: [B, T, N, D]; k, v: [B, S, N, D];
    bias: broadcastable to [B, N, T, S]. Returns [B, T, N, D].

    ``dropout_mask`` ([B, N, T, S], 0/1) implements PyTorch MHA's
    attention-probability dropout: the normalized probabilities are
    multiplied by mask/(1-rate) before the value contraction. The mask is
    sampled by the caller so the Pallas and XLA paths share one stream.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
    logits = jnp.einsum(
        "btnd,bsnd->bnts", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_mask is not None:
        probs = probs * (dropout_mask.astype(jnp.float32) / (1.0 - dropout_rate))
    out = jnp.einsum(
        "bnts,bsnd->btnd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


def attention_probs(
    q: jnp.ndarray,
    k: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax attention probabilities in f32 ([B, N, T, S]); exposed so the
    modules can apply attention-probability dropout (PyTorch MHA semantics)
    before the value contraction."""
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
    logits = jnp.einsum(
        "btnd,bsnd->bnts", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    use_pallas: bool = False,
    dropout_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    causal: bool = False,
    kv_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatch between the fused Pallas kernel and the XLA reference path.

    ``dropout_seed`` hashes the keep bits in-kernel on the Pallas path —
    no [B, N, T, S] mask buffer anywhere; see flash.flash_attention. On the
    XLA path the identical bits are materialized via ``hash_keep_mask``, so
    the two paths stay on one stream (model-level parity is asserted by
    tests/test_flash_kernel.py::test_train_mode_pallas_matches_xla_exactly)."""
    if use_pallas:
        from stlt_tpu.ops.flash import flash_attention

        return flash_attention(
            q, k, v, bias=bias, dropout_mask=dropout_mask,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
            causal=causal, kv_lengths=kv_lengths,
        )
    if dropout_seed is not None and dropout_mask is None:
        from stlt_tpu.ops.flash import hash_keep_mask

        B, T, N, _ = q.shape
        dropout_mask = hash_keep_mask(
            dropout_seed, B, N, T, k.shape[1], dropout_rate
        )
    return dot_product_attention_reference(q, k, v, bias, dropout_mask, dropout_rate)
