"""Multimodal fusion models: LCF, CAF, CACNF.

Reference: ``src/modelling/models.py:286-549``. Reference quirks reproduced
deliberately (they are baked into the released checkpoints):

- ``CrossModalModule`` applies ONE shared ``cross_attn`` in both directions
  (layout←appearance, then appearance←layout), and the layout padding mask is
  passed only in the appearance←layout direction (models.py:411-419);
- ``appearance_ffn`` is a ``SelfAttentionLayer``, **not** a feed-forward
  module (models.py:401);
- CACNF's ensemble head is the mean of the three logits and receives loss
  like the others (models.py:547 + train_inference_utils.py:74-76);
- the temporal causal mask inside fusion is rebuilt from the *layout frame
  count* (models.py:447-449).

Reference divergence: CACNF's ``load_backbone_path`` calls
``CrossAttentionFusionBackbone.from_pretrained`` which does not exist in the
reference (models.py:509-512 — a latent AttributeError). Here backbone
loading actually works (train CLI loads the ``backbone`` param subtree).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from stlt_tpu.configs import MultimodalModelConfig
from stlt_tpu.models.appearance import TransformerResnet
from stlt_tpu.models.layers import MultiHeadAttention, activation_fn, torch_dense
from stlt_tpu.models.stlt import (
    ClassificationHead,
    StltBackbone,
    apply_frame_capacity,
    gather_extract_frame,
)
from stlt_tpu.ops import masks


class FusionHead(nn.Module):
    """Linear(2H→H) → GELU → LayerNorm → Linear(H→C) (models.py:286-294)."""

    config: MultimodalModelConfig

    @nn.compact
    def __call__(self, hidden_state: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        h = torch_dense(cfg.hidden_size, cfg.hidden_size * 2, dtype, "fc1")(hidden_state)
        h = activation_fn("gelu", dtype)(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="layer_norm")(h)
        return torch_dense(cfg.num_classes, cfg.hidden_size, dtype, "fc2")(h)


class FeedforwardModule(nn.Module):
    """Post-LN residual FFN (models.py:328-339)."""

    config: MultimodalModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        h = torch_dense(cfg.hidden_size * 4, cfg.hidden_size, dtype, "linear1")(x)
        h = activation_fn("gelu", dtype)(h)
        h = torch_dense(cfg.hidden_size, cfg.hidden_size * 4, dtype, "linear2")(h)
        h = nn.Dropout(rate=cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="ln")(h + x)


class SelfAttentionLayer(nn.Module):
    """Post-LN residual self-attention (models.py:342-364)."""

    config: MultimodalModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        h = MultiHeadAttention(
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_attention_heads,
            dropout_rate=cfg.hidden_dropout_prob,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
            name="attn",
        )(x, x, x, bias, deterministic=deterministic)
        h = nn.Dropout(rate=cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="ln")(h + x)


class CrossAttentionLayer(nn.Module):
    """Post-LN residual cross-attention (models.py:367-388)."""

    config: MultimodalModelConfig

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,
        context: jnp.ndarray,
        context_bias: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        h = MultiHeadAttention(
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_attention_heads,
            dropout_rate=cfg.hidden_dropout_prob,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
            name="attn",
        )(inputs, context, context, context_bias, deterministic=deterministic)
        h = nn.Dropout(rate=cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="ln")(h + inputs)


class CrossModalModule(nn.Module):
    """One fusion block (models.py:391-431)."""

    config: MultimodalModelConfig

    def setup(self):
        cfg = self.config
        self.cross_attn = CrossAttentionLayer(cfg)  # shared, both directions
        self.layout_attn = SelfAttentionLayer(cfg)
        self.layout_ffn = FeedforwardModule(cfg)
        self.appearance_attn = SelfAttentionLayer(cfg)
        self.appearance_ffn = SelfAttentionLayer(cfg)  # quirk: self-attn, not FFN

    def __call__(
        self,
        layout_hidden,
        appearance_hidden,
        layout_causal_pad_bias,
        layout_pad_bias,
        *,
        deterministic: bool = True,
    ):
        layout_out = self.cross_attn(
            layout_hidden, appearance_hidden, deterministic=deterministic
        )
        appearance_out = self.cross_attn(
            appearance_hidden, layout_hidden, layout_pad_bias,
            deterministic=deterministic,
        )
        layout_out = self.layout_attn(
            layout_out, layout_causal_pad_bias, deterministic=deterministic
        )
        appearance_out = self.appearance_attn(
            appearance_out, deterministic=deterministic
        )
        layout_out = self.layout_ffn(layout_out, deterministic=deterministic)
        appearance_out = self.appearance_ffn(
            appearance_out, deterministic=deterministic
        )
        return layout_out, appearance_out


class LateConcatenationFusion(nn.Module):
    """LCF (models.py:297-322)."""

    config: MultimodalModelConfig
    logit_names = ("lcf",)

    def setup(self):
        cfg = self.config
        self.layout_branch = StltBackbone(cfg.stlt_config)
        self.appearance_branch = TransformerResnet(cfg.appearance_config)
        self.classifier = FusionHead(cfg)

    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        layout_hidden = self.layout_branch(batch, deterministic=deterministic)
        layout_pooled = gather_extract_frame(layout_hidden, batch["lengths"])
        appearance_hidden = self.appearance_branch.forward_features(
            batch, deterministic=deterministic
        )
        appearance_pooled = appearance_hidden[:, 0, :]
        fused = jnp.concatenate([layout_pooled, appearance_pooled], axis=-1)
        return {"lcf": self.classifier(fused).astype(jnp.float32)}


class CrossAttentionFusionBackbone(nn.Module):
    """Backbone for CAF and CACNF (models.py:434-483)."""

    config: MultimodalModelConfig

    def setup(self):
        cfg = self.config
        self.layout_branch = StltBackbone(cfg.stlt_config)
        self.appearance_branch = TransformerResnet(cfg.appearance_config)
        self.mm_fusion = [
            CrossModalModule(cfg, name=f"mm_fusion.{i}")
            for i in range(cfg.num_fusion_layers)
        ]

    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        # Frame-capacity truncation (apply_frame_capacity): the layout branch
        # returns [B, cap, H], so the fusion masks derive from the SAME
        # sliced frame axis — mm_fusion's layout queries/keys shrink with it.
        lbatch = apply_frame_capacity(self.config.stlt_config, batch)
        num_frames = lbatch["categories"].shape[1]
        layout_pad = masks.frames_padding_mask(lbatch["frame_types"])
        layout_pad_bias = masks.key_padding_bias(layout_pad)
        layout_causal_pad_bias = masks.causal_bias(num_frames) + layout_pad_bias

        layout_hidden = self.layout_branch(batch, deterministic=deterministic)
        appearance_hidden = self.appearance_branch.forward_features(
            batch, deterministic=deterministic
        )
        # Pre-fusion pooled states (models.py:454-460).
        layout_state = gather_extract_frame(layout_hidden, batch["lengths"])
        appearance_state = appearance_hidden[:, 0, :]
        for layer in self.mm_fusion:
            layout_hidden, appearance_hidden = layer(
                layout_hidden,
                appearance_hidden,
                layout_causal_pad_bias,
                layout_pad_bias,
                deterministic=deterministic,
            )
        last_fused_state = jnp.concatenate(
            [
                gather_extract_frame(layout_hidden, batch["lengths"]),
                appearance_hidden[:, 0, :],
            ],
            axis=-1,
        )
        return {
            "layout_hidden_state": layout_state,
            "appearance_hidden_state": appearance_state,
            "last_fused_state": last_fused_state,
        }


class CrossAttentionFusion(nn.Module):
    """CAF (models.py:486-501)."""

    config: MultimodalModelConfig
    logit_names = ("caf",)

    def setup(self):
        self.caf_backbone = CrossAttentionFusionBackbone(self.config)
        self.classifier = FusionHead(self.config)

    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        states = self.caf_backbone(batch, deterministic=deterministic)
        logits = self.classifier(states["last_fused_state"])
        return {"caf": logits.astype(jnp.float32)}


class CrossAttentionCentralNetFusion(nn.Module):
    """CACNF (models.py:504-549)."""

    config: MultimodalModelConfig
    logit_names = ("stlt", "resnet3d", "caf", "ensemble")

    def setup(self):
        cfg = self.config
        self.backbone = CrossAttentionFusionBackbone(cfg)
        head = lambda: ClassificationHead(
            hidden_size=cfg.hidden_size,
            num_classes=cfg.num_classes,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=jnp.dtype(cfg.compute_dtype),
        )
        self.layout_classifier = head()
        self.appearance_classifier = head()
        self.fusion_classifier = FusionHead(cfg)

    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        # A frozen backbone runs in eval mode (reference models.py:521-524).
        backbone_deterministic = deterministic or bool(
            cfg.load_backbone_path and cfg.freeze_backbone
        )
        states = self.backbone(batch, deterministic=backbone_deterministic)
        stlt_logits = self.layout_classifier(states["layout_hidden_state"]).astype(
            jnp.float32
        )
        resnet_logits = self.appearance_classifier(
            states["appearance_hidden_state"]
        ).astype(jnp.float32)
        caf_logits = self.fusion_classifier(states["last_fused_state"]).astype(
            jnp.float32
        )
        ensemble = (stlt_logits + resnet_logits + caf_logits) / 3.0
        return {
            "stlt": stlt_logits,
            "resnet3d": resnet_logits,
            "caf": caf_logits,
            "ensemble": ensemble,
        }
