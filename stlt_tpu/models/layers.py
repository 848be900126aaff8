"""Core transformer building blocks (flax.linen) with PyTorch-parity semantics.

The reference builds everything from ``torch.nn.TransformerEncoder`` /
``nn.MultiheadAttention`` (e.g. ``src/modelling/models.py:42-81, 114-152,
342-388``). PyTorch 1.10 encoder layers are **post-LN**:

    x = norm1(x + dropout(self_attn(x)))
    x = norm2(x + dropout2(linear2(dropout(act(linear1(x))))))

These modules reproduce that exactly (including attention-probability dropout
inside MHA) so converted checkpoints are drop-in. Initializers match the
PyTorch defaults so from-scratch training follows the same distributions:
``nn.Linear`` → U(±1/sqrt(fan_in)) for kernel and bias; MHA in-projections →
Xavier-uniform with zero bias; ``nn.Embedding`` → N(0, 1) with a zeroed
padding row.

All modules are batch-first ``[B, T, H]`` (the seq-first layout of the
reference is a torch convention with no XLA benefit).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.nn import initializers

from stlt_tpu.ops.attention import dot_product_attention

# PyTorch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).
torch_linear_kernel_init = initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def padded_embedding_init(padding_idx: Optional[int] = None) -> Callable:
    """torch.nn.Embedding default init: N(0,1), with the padding row zeroed."""
    def init(key, shape, dtype=jnp.float32):
        table = jax.random.normal(key, shape, dtype)
        if padding_idx is not None:
            table = table.at[padding_idx].set(0.0)
        return table
    return init


def torch_dense(features: int, fan_in: int, dtype=jnp.float32, name: Optional[str] = None) -> nn.Dense:
    """nn.Dense with PyTorch nn.Linear default initialization."""
    return nn.Dense(
        features=features,
        dtype=dtype,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_linear_bias_init(fan_in),
        name=name,
    )


class DenseParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense``: declares the same
    ``kernel``/``bias`` under the same scope name, returns the raw arrays.

    MultiHeadAttention owns its projection math (instead of calling
    ``nn.Dense``) so the eval path can hand the raw weights to the fused
    projection+attention kernel (``ops/fused_encoder``) — the param tree,
    names and initializers are byte-identical to the nn.Dense version, so
    checkpoint conversion in both directions is unaffected
    (tests/test_torch_export.py round-trips strict=True)."""

    features: int
    in_features: int
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features)
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        return kernel, bias


class LayerNormParams(nn.Module):
    """Parameter-only stand-in for ``nn.LayerNorm`` (same scope name, same
    ``scale``/``bias`` params and initializers) — lets the encoder layer hand
    raw norm weights to the fused layer-tail kernel while ``apply_layer_norm``
    reproduces flax's math bit-for-bit on the unfused path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", initializers.ones, (self.features,))
        bias = self.param("bias", initializers.zeros, (self.features,))
        return scale, bias


def apply_layer_norm(x, scale, bias, eps, dtype):
    """flax.linen.LayerNorm semantics, step for step (promote to f32,
    fast variance clipped at 0, scale folded into rsqrt, output cast)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1)
    var = jnp.maximum(0.0, jnp.mean(x32 * x32, axis=-1) - mu * mu)
    y = x32 - jnp.expand_dims(mu, -1)
    mul = jax.lax.rsqrt(jnp.expand_dims(var, -1) + eps)
    mul = mul * scale.astype(jnp.float32)
    y = y * mul
    y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def apply_dense_params(x, w, b, dtype):
    """nn.Dense(dtype=dtype) semantics on raw params: promote everything to
    the compute dtype, contract the last axis, add bias."""
    x = x.astype(dtype)
    y = jax.lax.dot_general(
        x, w.astype(dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
    )
    return y + b.astype(dtype)


class MultiHeadAttention(nn.Module):
    """PyTorch ``nn.MultiheadAttention`` semantics (batch-first).

    Separate q/k/v projections (the converter splits torch's stacked
    ``in_proj_weight`` into thirds), attention-probability dropout, f32
    softmax, and an output projection.
    """

    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # Sequence-parallel self-attention: when True AND a mesh with a >1
    # context axis is active (parallel.mesh.set_active_mesh), attention runs
    # as a ppermute ring over frame shards (ops/ring.py) instead of letting
    # XLA all-gather the K/V sequence. Set only on encoders whose token axis
    # is the frame axis.
    seq_shard: bool = False
    # Declares that the bias this attention receives is causal (it still
    # must contain the causal terms): the blockwise Pallas kernels then SKIP
    # block pairs above the diagonal (ops/flash.py _causal_live). Set on the
    # temporal encoders only.
    causal: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        kv_lengths: Optional[jnp.ndarray] = None,
        rows_live: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        H, N = self.hidden_size, self.num_heads
        assert H % N == 0
        D = H // N
        # torch MHA in-projections: xavier_uniform over the STACKED
        # [3H, H] in_proj_weight → bound sqrt(6/(H+3H)), narrower by sqrt(2)
        # than per-matrix xavier on [H, H]. Matching the distribution keeps
        # from-scratch training faithful (checkpoint loads are unaffected).
        in_proj_bound = (6.0 / (4.0 * H)) ** 0.5

        def stacked_xavier(key, shape, dtype=jnp.float32):
            return jax.random.uniform(
                key, shape, dtype, minval=-in_proj_bound, maxval=in_proj_bound
            )

        proj_params = lambda name: DenseParams(
            features=H,
            in_features=H,
            kernel_init=stacked_xavier,
            bias_init=initializers.zeros,
            name=name,
        )()
        wq, bq = proj_params("q_proj")
        wk, bk = proj_params("k_proj")
        wv, bv = proj_params("v_proj")
        wo, bo = DenseParams(
            features=H,
            in_features=H,
            kernel_init=torch_linear_kernel_init,
            bias_init=initializers.zeros,
            name="out_proj",
        )()

        def apply_dense(x, w, b):
            return apply_dense_params(x, w, b, self.dtype)

        B, T = query.shape[0], query.shape[1]
        S = key.shape[1]

        from stlt_tpu.parallel.mesh import active_context_mesh

        ring_mesh = active_context_mesh() if self.seq_shard else None
        # kv_lengths (+ causal) replaces the dense [B, 1, T, S] bias on the
        # blockwise-dispatched pallas path: the kernels generate the
        # key-padding/causal bias in place and the dense array is DCE'd —
        # the last O(T²) buffer gone from long-context training.
        from stlt_tpu.ops.flash import _BLOCKWISE_MIN_SEQ

        use_lengths = (
            kv_lengths is not None
            and self.use_pallas
            and ring_mesh is None
            and max(query.shape[1], key.shape[1]) >= _BLOCKWISE_MIN_SEQ
        )
        attn_bias = None if use_lengths else bias
        attn_lengths = kv_lengths if use_lengths else None

        from stlt_tpu.ops.fused_encoder import (
            FUSED_PROJ_ENABLED,
            FUSED_PROJ_MAX_SEQ,
            FUSED_TRAIN_ENABLED,
            fused_cross_fits,
            fused_proj_attention,
            fused_proj_fits,
            fused_train_fits,
        )

        itemsize = jnp.dtype(self.dtype).itemsize
        bias_head_invariant = (
            bias is None or bias.ndim < 3 or bias.shape[-3] == 1
        )

        if (
            FUSED_PROJ_ENABLED
            and self.use_pallas
            and deterministic
            and ring_mesh is None
            and query is key
            and key is value
            and T <= FUSED_PROJ_MAX_SEQ
            and bias_head_invariant
            and fused_proj_fits(B, T, H, N, itemsize)
        ):
            # Eval fast path: projections + attention + out-projection in ONE
            # Pallas kernel (ops/fused_encoder) — q/k/v and the attention
            # output never round-trip HBM, and the head-split transposes
            # disappear. Gated to self-attention with a head-invariant bias
            # (every encoder here). The TRAIN path has its own fused kernel
            # pair below; cross-attention its own two branches down.
            wqkv = jnp.concatenate([wq, wk, wv], axis=1)
            bqkv = jnp.concatenate([bq, bk, bv])
            return fused_proj_attention(
                query.astype(self.dtype), wqkv, bqkv, wo, bo, bias,
                num_heads=N, compute_dtype=self.dtype, rows_live=rows_live,
            )

        if (
            FUSED_PROJ_ENABLED
            and self.use_pallas
            and deterministic
            and ring_mesh is None
            and query is not key
            and key is value
            and max(T, S) <= FUSED_PROJ_MAX_SEQ
            and bias_head_invariant
            and fused_cross_fits(B, T, S, H, N, itemsize)
        ):
            # Cross-attention eval fast path (fusion models): q projects
            # from the inputs, k/v from the context, all in one kernel —
            # with this, every attention in every model is fused on eval.
            from stlt_tpu.ops.fused_encoder import fused_cross_attention

            wkv = jnp.concatenate([wk, wv], axis=1)
            bkv = jnp.concatenate([bk, bv])
            return fused_cross_attention(
                query.astype(self.dtype), key.astype(self.dtype),
                wq, bq, wkv, bkv, wo, bo, bias,
                num_heads=N, compute_dtype=self.dtype,
            )

        if (
            FUSED_TRAIN_ENABLED
            and self.use_pallas
            and not deterministic
            and ring_mesh is None
            and query is key
            and key is value
            and T <= FUSED_PROJ_MAX_SEQ
            and bias_head_invariant
            and fused_train_fits(B, T, H, N, itemsize)
        ):
            # TRAIN fast path: the same fused projection+attention kernel
            # with in-kernel hashed dropout, plus a custom backward that
            # recomputes qkv/probs in VMEM and emits dqkv + accumulated
            # dWo/dbo (ops/fused_encoder). One make_rng call — the same
            # stream position and hash bits as the XLA fallback below.
            from stlt_tpu.ops.fused_encoder import fused_proj_attention_train

            seed = None
            if self.dropout_rate > 0.0:
                seed = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
            wqkv = jnp.concatenate([wq, wk, wv], axis=1)
            bqkv = jnp.concatenate([bq, bk, bv])
            return fused_proj_attention_train(
                N, float(self.dropout_rate), query.astype(self.dtype),
                wqkv, bqkv, wo, bo, bias, seed, rows_live,
            )

        q = apply_dense(query, wq, bq).reshape(B, T, N, D)
        k = apply_dense(key, wk, bk).reshape(B, S, N, D)
        v = apply_dense(value, wv, bv).reshape(B, S, N, D)

        apply_prob_dropout = self.dropout_rate > 0.0 and not deterministic
        if apply_prob_dropout:
            # PyTorch MHA applies dropout to the normalized softmax weights.
            if ring_mesh is not None:
                # Sequence-parallel ring: keep bits hash in-kernel from a
                # seed folded with mesh coordinates + ring-step chunk id
                # (ops/ring.py) — no O(T²/C) mask buffer per device. With
                # kv_lengths, the dense bias is dropped too: each ring step
                # generates its causal+padding tile in-kernel, so NOTHING
                # sequence²-sized exists under context-parallel training.
                from stlt_tpu.ops.ring import ring_attention

                seed = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
                out = ring_attention(
                    q, k, v, None if kv_lengths is not None else bias,
                    ring_mesh,
                    dropout_seed=seed, dropout_rate=self.dropout_rate,
                    kv_lengths=kv_lengths, causal=self.causal,
                )
            else:
                # ONE hash-bit stream on every non-ring path: the Pallas
                # kernels hash keep bits IN PLACE from a per-call seed (fwd
                # and both backwards regenerate identical bits — stateless
                # counter hash, ops/flash.py), and the XLA fallback
                # reconstructs the same bits via hash_keep_mask. No
                # [B, N, T, S] mask is ever sampled or shipped through HBM —
                # at long context that buffer is O(T²); at short sequences
                # dropping it removes the per-step mask sampling and the
                # mask-operand DMA from every attention call (round-2 shipped
                # a host-sampled mask operand here).
                seed = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
                out = dot_product_attention(
                    q, k, v, attn_bias,
                    use_pallas=self.use_pallas,
                    dropout_seed=seed,
                    dropout_rate=self.dropout_rate,
                    causal=self.causal,
                    kv_lengths=attn_lengths,
                )
        elif ring_mesh is not None:
            from stlt_tpu.ops.ring import ring_attention

            out = ring_attention(
                q, k, v, None if kv_lengths is not None else bias, ring_mesh,
                kv_lengths=kv_lengths, causal=self.causal,
            )
        else:
            out = dot_product_attention(
                q, k, v, attn_bias, use_pallas=self.use_pallas,
                causal=self.causal, kv_lengths=attn_lengths,
            )

        out = out.reshape(B, T, H)
        # torch MHA out_proj: NonDynamicallyQuantizableLinear == nn.Linear
        # (kaiming-uniform default init, zero bias at construction).
        return apply_dense(out, wo, bo)


def activation_fn(name: str, dtype=jnp.float32) -> Callable:
    if name == "gelu":
        # torch F.gelu default is the exact erf formulation — used verbatim in
        # f32 (checkpoint parity). In bf16 compute the tanh approximation is
        # within bf16 rounding noise and ~2.6x cheaper on the VPU (the erf
        # chain in f32 was costing as much as the FFN GEMMs themselves).
        approximate = jnp.dtype(dtype) == jnp.bfloat16
        return lambda x: jax.nn.gelu(x, approximate=approximate)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name}")


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer matching torch.nn.TransformerEncoderLayer (1.10)."""

    hidden_size: int
    num_heads: int
    ff_size: int
    dropout_rate: float = 0.1
    activation: str = "relu"  # torch default; STLT passes "gelu"
    layer_norm_eps: float = 1e-5  # torch default; configs pass 1e-12
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    seq_shard: bool = False
    causal: bool = False
    # Clip length (frames) of the MODEL this encoder serves — the static
    # long-context signal for the fused train-tail gate
    # (ops/fused_tail_train.tail_train_wants). 0 = short-context/unknown:
    # the train tail stays on the XLA chain, which hardware A/B showed is
    # 26% faster at headline shapes (docs/PERF_NOTES.md round 5).
    clip_frames: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,  # positional: nn.remat static_argnums=(3,)
        kv_lengths: Optional[jnp.ndarray] = None,
        rows_live: Optional[jnp.ndarray] = None,
        tokens_live: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        attn_out = MultiHeadAttention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            seq_shard=self.seq_shard,
            causal=self.causal,
            name="self_attn",
        )(x, x, x, bias, deterministic=deterministic, kv_lengths=kv_lengths,
          rows_live=rows_live)

        H, FF = self.hidden_size, self.ff_size
        n1_scale, n1_bias = LayerNormParams(H, name="norm1")()
        w1, b1 = DenseParams(
            features=FF, in_features=H,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(H),
            name="linear1",
        )()
        w2, b2 = DenseParams(
            features=H, in_features=FF,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(FF),
            name="linear2",
        )()
        n2_scale, n2_bias = LayerNormParams(H, name="norm2")()

        from stlt_tpu.ops.fused_encoder import (
            FUSED_TAIL_ENABLED,
            tail_blocks_fit,
        )

        if (
            FUSED_TAIL_ENABLED
            and self.use_pallas
            and deterministic
            and tail_blocks_fit(
                x.shape[0], x.shape[1], H, FF,
                jnp.dtype(self.dtype).itemsize,
            )
        ):
            # Eval fast path: residual+norm1, the FFN (whose 4H-wide hidden
            # is the model's largest activation) and residual+norm2 in ONE
            # Pallas kernel (ops/fused_encoder.fused_layer_tail) — none of
            # u/h1/h2 visit HBM. Deterministic only: dropouts are identity
            # and the kernel has no backward; train keeps the XLA chain.
            from stlt_tpu.ops.fused_encoder import fused_layer_tail

            return fused_layer_tail(
                x, attn_out, n1_scale, n1_bias, w1, b1, w2, b2,
                n2_scale, n2_bias,
                eps=self.layer_norm_eps,
                compute_dtype=self.dtype,
                activation=self.activation,
                gelu_approximate=jnp.dtype(self.dtype) == jnp.bfloat16,
                rows_live=rows_live,
                tokens_live=tokens_live,
            )

        import stlt_tpu.ops.fused_tail_train as ftt

        # Static dispatch predicate: enabled + long-context model
        # (clip_frames gate — the kernel loses at MXU-bound headline shapes,
        # wins on ragged long-context; rationale at
        # ops/fused_tail_train.TAIL_TRAIN_MIN_FRAMES) + VMEM-fits.
        tail_kernel_wants = ftt.tail_train_wants(
            x.shape[0], x.shape[1], H, FF,
            jnp.dtype(self.dtype).itemsize, self.clip_frames,
        )

        if tail_kernel_wants and self.use_pallas and not deterministic:
            # Train fast path: the whole tail (three dropout sites included,
            # as counter-hashed bits) forward AND backward in Pallas — no
            # 4H hidden, no sampled masks, and dead-token groups skip all
            # compute in both directions (ops/fused_tail_train.py).
            seed = None
            if self.dropout_rate > 0.0:
                seed = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
            return ftt.fused_layer_tail_train(
                x, attn_out, n1_scale, n1_bias, w1, b1, w2, b2,
                n2_scale, n2_bias,
                eps=self.layer_norm_eps,
                compute_dtype=self.dtype,
                activation=self.activation,
                gelu_approximate=jnp.dtype(self.dtype) == jnp.bfloat16,
                dropout_rate=self.dropout_rate,
                seed=seed,
                rows_live=rows_live,
                tokens_live=tokens_live,
            )

        # XLA tail chain. Its three dropout sites use the SAME single-draw
        # seed + counter-hashed keep bits as the fused train-tail kernel
        # (one make_rng("dropout") at this layer scope, tags per site, the
        # element counter is token*width+feature) — so use_pallas=True/False
        # agree exactly in train mode wherever a kernel twin exists
        # (tests/test_flash_kernel.py::test_train_mode_pallas_matches_xla_exactly
        # pins this; mirrors round 3's hash_keep_mask reconstruction for
        # attention-prob dropout in ops/flash.py). The hash is kept even
        # where no kernel twin dispatches: round-5 hardware A/B measured it
        # 15.7% FASTER than threefry nn.Dropout at the train headline
        # (ops/fused_tail_train.HASH_TAIL_DROP; STLT_HASH_TAIL_DROP=0
        # reverts, measurement only).
        drop_on = self.dropout_rate > 0.0 and not deterministic
        if drop_on:
            if not ftt.HASH_TAIL_DROP:
                def hdrop(v, tag):
                    return nn.Dropout(rate=self.dropout_rate)(
                        v, deterministic=False, rng=self.make_rng("dropout")
                    )
            else:
                seed = jax.random.bits(
                    self.make_rng("dropout"), dtype=jnp.uint32
                )
                scale = 1.0 / (1.0 - self.dropout_rate)
                tokens = x.shape[0] * x.shape[1]

                def hdrop(v, tag):
                    width = v.shape[-1]
                    keep = ftt.hash_keep_rows(
                        seed, tag, tokens, width, self.dropout_rate
                    ).reshape(v.shape)
                    return (
                        v.astype(jnp.float32) * keep * scale
                    ).astype(self.dtype)

        if drop_on:
            attn_out = hdrop(attn_out, ftt.TAG_ATTN_DROP)
        x = apply_layer_norm(
            x + attn_out, n1_scale, n1_bias, self.layer_norm_eps, self.dtype
        )
        h = apply_dense_params(x, w1, b1, self.dtype)
        h = activation_fn(self.activation, self.dtype)(h)
        if drop_on:
            h = hdrop(h, ftt.TAG_MID_DROP)
        h = apply_dense_params(h, w2, b2, self.dtype)
        if drop_on:
            h = hdrop(h, ftt.TAG_OUT_DROP)
        return apply_layer_norm(
            x + h, n2_scale, n2_bias, self.layer_norm_eps, self.dtype
        )


class TransformerEncoder(nn.Module):
    """Stack of post-LN encoder layers (torch.nn.TransformerEncoder).

    With ``remat``, each layer is wrapped in nn.remat (activation
    rematerialization): the backward pass recomputes the layer forward
    instead of storing its intermediates — trades ~1/3 more FLOPs for a
    large activation-memory reduction (enables 4x larger train batches).
    """

    num_layers: int
    hidden_size: int
    num_heads: int
    ff_size: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    seq_shard: bool = False
    causal: bool = False
    # Threaded to every layer: see TransformerEncoderLayer.clip_frames.
    clip_frames: int = 0
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        kv_lengths: Optional[jnp.ndarray] = None,
        rows_live: Optional[jnp.ndarray] = None,
        tokens_live: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        layer_cls = TransformerEncoderLayer
        if self.remat:
            # args: (self, x, bias, deterministic, kv_lengths, rows_live,
            # tokens_live) — deterministic (index 3) is the only static one
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,))
        for i in range(self.num_layers):
            x = layer_cls(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                ff_size=self.ff_size,
                dropout_rate=self.dropout_rate,
                activation=self.activation,
                layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                seq_shard=self.seq_shard,
                causal=self.causal,
                clip_frames=self.clip_frames,
                name=f"layers_{i}",
            )(x, bias, deterministic, kv_lengths, rows_live, tokens_live)
        return x
