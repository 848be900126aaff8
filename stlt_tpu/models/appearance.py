"""Appearance branch: frozen-BN R3D-50 features + transformer head.

Reference: ``src/modelling/models.py:198-283``.

- ``Resnet3D`` (models.py:198-229): R3D-50 built for the 1139-class Kinetics
  checkpoint, avgpool+fc stripped; returns ``{"resnet3d": logits}`` when used
  standalone (avgpool + linear classifier).
- ``TransformerResnet`` (models.py:232-283): R3D features → 1×1×1 Conv
  projector → flattened spatio-temporal tokens (T-major, matching torch's
  ``flatten(2)`` on [B,C,T,H,W]) → prepend learned CLS → add learned
  ``pos_embed`` (size ``appearance_num_frames + 1``; with 32 frames @112px the
  R3D output is 2×4×4 = 32 tokens, so the table fits exactly) →
  TransformerEncoder with **torch defaults: ReLU activation, dropout 0.1,
  LayerNorm eps 1e-5** (the reference passes no overrides at models.py:239-243
  — unlike the GELU/1e-12 STLT encoders; this asymmetry is baked into the
  released checkpoints) → classifier on CLS. ``no_weight_decay`` =
  {pos_embed, cls_token} (models.py:282-283).

Input convention: ``batch["video_frames"]`` is channel-last
``[B, T, H, W, 3]`` (TPU-native; the host pipeline emits this directly).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn
from jax.nn import initializers

from stlt_tpu.configs import AppearanceModelConfig
from stlt_tpu.models.layers import (
    TransformerEncoder,
    torch_dense,
    torch_linear_bias_init,
)
from stlt_tpu.models.resnet3d import ResNet3D

KINETICS_CLASSES = 1139  # reference models.py:201

# torch.nn.TransformerEncoderLayer defaults (reference models.py:239-243
# passes none of these explicitly).
TORCH_ENCODER_DROPOUT = 0.1
TORCH_ENCODER_ACTIVATION = "relu"
TORCH_ENCODER_LN_EPS = 1e-5


class Resnet3D(nn.Module):
    """R3D-50 feature extractor (+ standalone classifier when called)."""

    config: AppearanceModelConfig
    logit_names = ("resnet3d",)

    def setup(self):
        self.resnet = ResNet3D(
            model_depth=self.config.resnet_depth,
            dtype=jnp.dtype(self.config.compute_dtype),
        )
        # Lazily materialized: params exist only if __call__ runs (matching
        # the converter's view of feature-only checkpoints).
        self.classifier = torch_dense(
            self.config.num_classes,
            self.resnet.out_features,
            jnp.dtype(self.config.compute_dtype),
        )

    def forward_features(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        frames = batch["video_frames"]
        if frames.dtype == jnp.uint8:
            # Host shipped raw uint8 crops (DataConfig.device_normalize —
            # 4× less host→device bandwidth than f32); apply the pipeline's
            # mean/std-0.5 normalization on device with the SAME constants and
            # f32 op order as the host path (transforms.normalize_to_array,
            # reference datasets.py:196-197).
            from stlt_tpu.data.transforms import NORM_DIVISOR, NORM_OFFSET

            frames = frames.astype(jnp.float32) / NORM_DIVISOR + NORM_OFFSET
        # [B, T', H', W', 2048]
        return self.resnet(frames)

    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        features = self.forward_features(batch)
        pooled = features.mean(axis=(1, 2, 3))  # AdaptiveAvgPool3d((1,1,1))
        return {"resnet3d": self.classifier(pooled).astype(jnp.float32)}


class TransformerResnet(nn.Module):
    config: AppearanceModelConfig
    logit_names = ("resnet3d",)

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        self.resnet = Resnet3D(cfg)
        # 1×1×1 Conv projector (torch Conv3d with bias).
        self.projector = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(1, 1, 1),
            use_bias=True,
            dtype=dtype,
            kernel_init=initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            # torch Conv3d default bias: U(±1/sqrt(fan_in)), fan_in = 2048·1·1·1
            bias_init=torch_linear_bias_init(2048),
        )
        self.cls_token = self.param(
            "cls_token", initializers.zeros, (1, 1, cfg.hidden_size)
        )
        self.pos_embed = self.param(
            "pos_embed",
            initializers.zeros,
            (cfg.appearance_num_frames + 1, 1, cfg.hidden_size),
        )
        self.transformer = TransformerEncoder(
            num_layers=cfg.num_appearance_layers,
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_attention_heads,
            ff_size=cfg.hidden_size * 4,
            dropout_rate=TORCH_ENCODER_DROPOUT,
            activation=TORCH_ENCODER_ACTIVATION,
            layer_norm_eps=TORCH_ENCODER_LN_EPS,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
            remat=cfg.remat,
        )
        self.classifier = torch_dense(cfg.num_classes, cfg.hidden_size, dtype)

    def forward_features(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        # [B, T', H', W', 2048]
        feats = self.resnet.forward_features(batch)
        B = feats.shape[0]
        feats = self.projector(feats)
        # [B, S, H] with S = T'·H'·W' (T-major — same token order as torch).
        tokens = feats.reshape(B, -1, cfg.hidden_size)
        if tokens.shape[1] != cfg.appearance_num_frames:
            raise ValueError(
                f"R3D emitted {tokens.shape[1]} tokens but the pos_embed table "
                f"holds appearance_num_frames={cfg.appearance_num_frames}; "
                "they must match (reference models.py:248-250 — e.g. 32 frames "
                "@112px → 2·4·4 = 32 tokens). Adjust --appearance_num_frames "
                "or --spatial_size."
            )
        cls = jnp.broadcast_to(self.cls_token, (B, 1, cfg.hidden_size)).astype(dtype)
        tokens = jnp.concatenate([cls, tokens], axis=1)
        # torch pos_embed is [S+1, 1, H] (seq-first); ours is [B, S+1, H].
        tokens = tokens + self.pos_embed[:, 0, :][None].astype(dtype)
        return self.transformer(tokens, deterministic=deterministic)  # [B, S+1, H]

    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        features = self.forward_features(batch, deterministic=deterministic)
        cls_state = features[:, 0, :]
        return {"resnet3d": self.classifier(cls_state).astype(jnp.float32)}

    @staticmethod
    def no_weight_decay():
        return {"pos_embed", "cls_token"}
