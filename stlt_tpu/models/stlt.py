"""STLT — Spatial-Temporal Layout Transformer (flax.linen, batch-first).

Reference architecture: ``src/modelling/models.py:16-195``.

- ``CategoryBoxEmbeddings`` (models.py:16-39): category embedding (+ box
  linear, + optional score linear iff scores present) → LayerNorm → dropout.
- ``SpatialTransformer`` (models.py:42-81): per-frame self-attention over box
  tokens; frames fold into the batch axis; only token 0 (the frame-CLS) is
  kept.
- ``FramesEmbeddings`` (models.py:84-111): + learned position embeddings
  (table of size ``config.layout_num_frames`` = 256, sliced to the actual
  frame count) + frame-type embeddings (5 types, padding_idx 0).
- ``StltBackbone`` (models.py:114-152): temporal causal encoder over frame
  embeddings with the causal + frame-padding mask.
- ``Stlt`` (models.py:166-195): backbone → gather the hidden state at
  ``lengths - 1`` (the EXTRACT frame) → ``ClassificationHead`` →
  ``{"stlt": logits}``.

TPU-first notes: everything is ``[B, ...]`` batch-first with static shapes;
padding masks are derived in-model from ``categories == 0`` /
``frame_types == 0`` (the reference collater's rules) so the host pipeline
ships only raw integer/float tensors.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn
from jax.nn import initializers

from stlt_tpu.configs import StltModelConfig
from stlt_tpu.models.layers import (
    TransformerEncoder,
    activation_fn,
    padded_embedding_init,
    torch_dense,
)
from stlt_tpu.ops import masks

NUM_FRAME_TYPES = 5  # reference models.py:91 — fixed table of 5 frame types

# Per-frame streams of a layout batch (the keys apply_frame_capacity slices;
# appearance streams — "videos" etc. — are untouched).
_PER_FRAME_KEYS = ("categories", "boxes", "scores", "frame_types")


def apply_frame_capacity(cfg: StltModelConfig, batch: Dict[str, jnp.ndarray]):
    """Truncate the layout frame axis to ``cfg.temporal_frame_capacity``.

    Ragged serving lever (no reference counterpart): the datasets pad frames
    TAIL-contiguously (reference datasets.py:247-286) and the host loop can
    bound every clip's live slots (``configs.frame_capacity_for`` /
    ``ops.fused_encoder.frame_capacity``), so slicing ``[:, :cap]`` drops
    only all-dead slots. Exact for every consumed output: the spatial stage
    is row-independent, the temporal encoder is CAUSAL (live frames never
    attend to later pad slots, and pad keys before ``cap`` are -1e9-masked
    to exactly-0 softmax weight), and pooling reads ``lengths - 1 < cap``.
    CONTRACT: ``cap >= every clip's live slot count``. Under a
    context-sharded mesh leave the capacity ``None`` — the frame axis is
    padded to the context multiple there (train.py guards this)."""
    cap = cfg.temporal_frame_capacity
    num_frames = batch["frame_types"].shape[1]
    if cap is None or cap >= num_frames:
        return batch
    out = dict(batch)
    for key in _PER_FRAME_KEYS:
        if key in out:
            out[key] = out[key][:, :cap]
    return out


class CategoryBoxEmbeddings(nn.Module):
    config: StltModelConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        embeddings = nn.Embed(
            num_embeddings=cfg.unique_categories,
            features=cfg.hidden_size,
            dtype=dtype,
            embedding_init=padded_embedding_init(padding_idx=0),
            name="category_embeddings",
        )(batch["categories"])
        embeddings += torch_dense(cfg.hidden_size, 4, dtype, "box_embedding")(
            batch["boxes"].astype(dtype)
        )
        if "scores" in batch:
            # Conditional score path: only Action Genome batches carry scores
            # (reference models.py:33-35 + collater datasets.py:252-260).
            embeddings += torch_dense(cfg.hidden_size, 1, dtype, "score_embeddings")(
                batch["scores"].astype(dtype)[..., None]
            )
        embeddings = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="layer_norm"
        )(embeddings)
        return nn.Dropout(rate=cfg.hidden_dropout_prob)(
            embeddings, deterministic=deterministic
        )


class SpatialTransformer(nn.Module):
    config: StltModelConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True):
        cfg = self.config
        # [B, F, O, H]
        tokens = CategoryBoxEmbeddings(cfg, name="category_box_embeddings")(
            batch, deterministic=deterministic
        )
        B, F, O, H = tokens.shape
        from stlt_tpu.parallel.mesh import constrain_folded_rows

        # Fold frames into batch. Under a context mesh, pin the merged
        # (data×context) row sharding — GSPMD loses it through the reshape,
        # leaving the whole spatial stage frame-replicated (see
        # parallel.mesh.constrain_folded_rows).
        tokens = constrain_folded_rows(tokens.reshape(B * F, O, H))
        pad_bias = constrain_folded_rows(
            masks.key_padding_bias(
                masks.boxes_padding_mask(batch["categories"]).reshape(B * F, O)
            )
        )
        # Pad-frame compaction: folded rows of PAD frames (frame_types == 0;
        # tail-contiguous per clip) are dead downstream — their spatial-CLS
        # outputs only ever feed the temporal attention as -1e9-masked keys
        # whose softmax weight underflows to exactly 0 (and therefore carry
        # exactly-zero cotangents in training). The fused kernels skip whole
        # dead row blocks and write zeros (ops/fused_encoder). At realistic
        # long-context fill (SSv2 clips average ~40-60 frames against a
        # 256/512-frame table) most of the spatial stage — the measured
        # bound at 512 frames (docs/PERF_NOTES.md) — is dead rows.
        from stlt_tpu.ops.fused_encoder import COMPACTION_ENABLED

        rows_live = None
        if cfg.use_pallas and COMPACTION_ENABLED:
            rows_live = (batch["frame_types"] != 0).reshape(B * F)
        # Live-prefix capacity (ragged serving): block-granular skipping
        # still pays the per-program floor and the block DMA for every DEAD
        # block — at realistic fill that is most of the grid. With a static
        # per-bucket capacity from the host loop (the loader knows every
        # clip's length), gather live rows to a global prefix, run the whole
        # spatial stage on the first `cap` rows only — the grid, the DMA and
        # the FLOPs all shrink by ~fill — and scatter the per-frame CLS
        # vectors back. Exact: the stage is row-independent (per-frame
        # attention over boxes, per-token FFN/LN), so a permutation commutes
        # bitwise with it, and rows left out are the same rows the compaction
        # contract already defines as zeros. CONTRACT: cap >= live row count
        # (ops.fused_encoder.live_prefix_capacity derives it from host
        # lengths); under a context-sharded mesh leave this None — the
        # gather would cross shard boundaries.
        cap = cfg.spatial_live_capacity
        encoder = TransformerEncoder(
            num_layers=cfg.num_spatial_layers,
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_attention_heads,
            ff_size=cfg.hidden_size * 4,
            dropout_rate=cfg.hidden_dropout_prob,
            activation="gelu",
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=jnp.dtype(cfg.compute_dtype),
            use_pallas=cfg.use_pallas,
            # Long-context signal for the fused train-tail gate
            # (ops/fused_tail_train.tail_train_wants): the kernel only wins
            # when the MODEL's clip length makes the step HBM-bound.
            clip_frames=F,
            remat=cfg.remat,
            name="transformer",
        )
        if rows_live is not None and cap is not None and cap < B * F:
            dead = (rows_live == 0).astype(jnp.int32)
            perm = jnp.argsort(dead, stable=True)
            idx = perm[:cap]
            compact = encoder(
                jnp.take(tokens, idx, axis=0),
                jnp.take(pad_bias, idx, axis=0),
                deterministic=deterministic,
                rows_live=jnp.take(rows_live, idx),
            )
            cls = jnp.zeros((B * F, H), compact.dtype).at[idx].set(
                compact[:, 0, :]
            )
            return cls.reshape(B, F, H)
        tokens = encoder(
            tokens, pad_bias, deterministic=deterministic, rows_live=rows_live
        )
        # Keep the frame-CLS token (slot 0) per frame: [B, F, H].
        return tokens[:, 0, :].reshape(B, F, H)


class FramesEmbeddings(nn.Module):
    config: StltModelConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        frames = SpatialTransformer(cfg, name="layout_embedding")(
            batch, deterministic=deterministic
        )
        num_frames = frames.shape[1]
        if num_frames > cfg.layout_num_frames:
            raise ValueError(
                f"clip has {num_frames} frames but the position table holds "
                f"{cfg.layout_num_frames}; size the model config with "
                f"configs.position_table_rows(data_config)"
            )
        position_table = self.param(
            "position_embeddings",
            initializers.normal(1.0),  # torch nn.Embedding default N(0,1)
            (cfg.layout_num_frames, cfg.hidden_size),
        )
        frame_type_embeddings = nn.Embed(
            num_embeddings=NUM_FRAME_TYPES,
            features=cfg.hidden_size,
            dtype=dtype,
            embedding_init=padded_embedding_init(padding_idx=0),
            name="frame_type_embedding",
        )(batch["frame_types"])
        embeddings = (
            frames
            + position_table[None, :num_frames].astype(dtype)
            + frame_type_embeddings
        )
        embeddings = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="layer_norm"
        )(embeddings)
        return nn.Dropout(rate=cfg.hidden_dropout_prob)(
            embeddings, deterministic=deterministic
        )


class StltBackbone(nn.Module):
    config: StltModelConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True):
        cfg = self.config
        # Ragged frame-capacity truncation: the whole layout branch (spatial
        # fold included) runs on the sliced frame axis; the output is
        # [B, cap, H] and every consumer pools at ``lengths - 1 < cap``
        # (Stlt / gather_extract_frame) or slices its masks to the same cap
        # (fusion.CrossAttentionFusionBackbone).
        batch = apply_frame_capacity(cfg, batch)
        embeddings = FramesEmbeddings(cfg, name="frames_embeddings")(
            batch, deterministic=deterministic
        )
        num_frames = embeddings.shape[1]
        bias = masks.causal_bias(num_frames) + masks.key_padding_bias(
            masks.frames_padding_mask(batch["frame_types"])
        )
        # Per-clip frame count (pad frames are tail-contiguous — the static-
        # shape datasets' invariant): at blockwise-dispatched lengths the
        # pallas kernels regenerate this bias from kv_lengths in place and
        # the dense [B, 1, F, F] array above is dead-code-eliminated.
        kv_lengths = jnp.sum(
            batch["frame_types"] != 0, axis=1, dtype=jnp.int32
        )
        # Temporal-stage pad-frame compaction (eval): dead frame tokens skip
        # the fused layer tail's FFN (ops/fused_encoder token flattening);
        # the blockwise attention kernels already skip dead q blocks from
        # kv_lengths. Same exactness argument as the spatial stage.
        from stlt_tpu.ops.fused_encoder import COMPACTION_ENABLED

        tokens_live = None
        if cfg.use_pallas and COMPACTION_ENABLED:
            tokens_live = batch["frame_types"] != 0
        return TransformerEncoder(
            num_layers=cfg.num_temporal_layers,
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_attention_heads,
            ff_size=cfg.hidden_size * 4,
            dropout_rate=cfg.hidden_dropout_prob,
            activation="gelu",
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=jnp.dtype(cfg.compute_dtype),
            use_pallas=cfg.use_pallas,
            # Token axis = frame axis: ring attention applies when a
            # context-parallel mesh is active (ops/ring.py).
            seq_shard=True,
            # The temporal bias is causal (+frame padding): the blockwise
            # kernels skip whole above-diagonal blocks at long context.
            causal=True,
            clip_frames=num_frames,
            remat=cfg.remat,
            name="transformer",
        )(embeddings, bias, deterministic=deterministic,
          kv_lengths=kv_lengths, tokens_live=tokens_live)  # [B, F, H]


class ClassificationHead(nn.Module):
    """fc1 → GELU → LayerNorm → fc2 (reference models.py:155-163)."""

    hidden_size: int
    num_classes: int
    layer_norm_eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_state: jnp.ndarray) -> jnp.ndarray:
        h = torch_dense(self.hidden_size, self.hidden_size, self.dtype, "fc1")(
            hidden_state
        )
        h = activation_fn("gelu", self.dtype)(h)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="layer_norm")(h)
        return torch_dense(self.num_classes, self.hidden_size, self.dtype, "fc2")(h)


def gather_extract_frame(hidden_states: jnp.ndarray, lengths: jnp.ndarray):
    """Pool the hidden state at frame index ``lengths - 1`` — the appended
    EXTRACT frame (reference models.py:189-192). [B, F, H] → [B, H]."""
    idx = (lengths - 1).astype(jnp.int32)[:, None, None]
    return jnp.take_along_axis(hidden_states, idx, axis=1)[:, 0, :]


class Stlt(nn.Module):
    config: StltModelConfig
    logit_names = ("stlt",)

    @nn.compact
    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        # A frozen backbone runs in eval mode — only when it was actually
        # loaded+frozen (reference gates on load_backbone_path, models.py:170-183).
        backbone_deterministic = deterministic or bool(
            cfg.load_backbone_path and cfg.freeze_backbone
        )
        hidden = StltBackbone(cfg, name="backbone")(
            batch, deterministic=backbone_deterministic
        )
        pooled = gather_extract_frame(hidden, batch["lengths"])
        logits = ClassificationHead(
            hidden_size=cfg.hidden_size,
            num_classes=cfg.num_classes,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=jnp.dtype(cfg.compute_dtype),
            name="prediction_head",
        )(pooled)
        return {"stlt": logits.astype(jnp.float32)}
