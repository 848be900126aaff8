"""PyTorch parity oracle.

A behaviorally-equivalent torch reconstruction of the reference models
(``/root/reference/src/modelling/models.py``), used ONLY in tests to
(a) validate the torch→flax checkpoint converter and (b) assert numeric parity
of the flax models against genuine PyTorch semantics. Attribute names match
the reference module tree exactly so state_dicts have the same keys as the
released checkpoints.
"""

from typing import Dict

import torch
from torch import nn
from torch.nn import functional as F


def causal_mask(size: int) -> torch.Tensor:
    # bool mask, True = masked (reference model_utils.py:4-7)
    return ~(torch.triu(torch.ones(size, size)) == 1).transpose(0, 1)


def _encoder(hidden, heads, layers, dropout, activation="gelu", **kw):
    layer = nn.TransformerEncoderLayer(
        d_model=hidden,
        nhead=heads,
        dim_feedforward=hidden * 4,
        dropout=dropout,
        activation=activation,
        **kw,
    )
    return layer, nn.TransformerEncoder(layer, num_layers=layers)


class TorchCategoryBoxEmbeddings(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.category_embeddings = nn.Embedding(
            num_embeddings=cfg.unique_categories,
            embedding_dim=cfg.hidden_size,
            padding_idx=0,
        )
        self.box_embedding = nn.Linear(4, cfg.hidden_size)
        self.score_embeddings = nn.Linear(1, cfg.hidden_size)
        self.layer_norm = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def forward(self, batch):
        emb = self.category_embeddings(batch["categories"]) + self.box_embedding(
            batch["boxes"]
        )
        if "scores" in batch:
            emb = emb + self.score_embeddings(batch["scores"].unsqueeze(-1))
        return self.dropout(self.layer_norm(emb))


class TorchSpatialTransformer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.category_box_embeddings = TorchCategoryBoxEmbeddings(cfg)
        # NOTE: the prototype layer is an attribute in the reference
        # (models.py:46-52), so its (unused) params appear in state_dicts.
        self.encoder_layer, self.transformer = _encoder(
            cfg.hidden_size,
            cfg.num_attention_heads,
            cfg.num_spatial_layers,
            cfg.hidden_dropout_prob,
        )

    def forward(self, batch):
        emb = self.category_box_embeddings(batch)  # [B, F, O, H]
        B, Fr, O, H = emb.shape
        emb = emb.flatten(0, 1).transpose(0, 1)  # [O, B*F, H]
        pad = batch["src_key_padding_mask_boxes"].flatten(0, 1)  # [B*F, O]
        out = self.transformer(src=emb, src_key_padding_mask=pad)
        return out.transpose(0, 1).view(B, Fr, O, H)[:, :, 0, :]


class TorchFramesEmbeddings(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.layout_embedding = TorchSpatialTransformer(cfg)
        self.position_embeddings = nn.Embedding(cfg.layout_num_frames, cfg.hidden_size)
        self.frame_type_embedding = nn.Embedding(5, cfg.hidden_size, padding_idx=0)
        self.layer_norm = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.register_buffer(
            "position_ids", torch.arange(cfg.layout_num_frames).expand((1, -1))
        )

    def forward(self, batch):
        layouts = self.layout_embedding(batch)
        types = self.frame_type_embedding(batch["frame_types"])
        pos = self.position_embeddings(self.position_ids[:, : types.size(1)])
        return self.dropout(self.layer_norm(layouts + pos + types))


class TorchStltBackbone(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.frames_embeddings = TorchFramesEmbeddings(cfg)
        _, self.transformer = _encoder(
            cfg.hidden_size,
            cfg.num_attention_heads,
            cfg.num_temporal_layers,
            cfg.hidden_dropout_prob,
        )

    def forward(self, batch):
        emb = self.frames_embeddings(batch).transpose(0, 1)  # [F, B, H]
        mask = causal_mask(emb.size(0)).to(emb.device)
        return self.transformer(
            src=emb,
            mask=mask,
            src_key_padding_mask=batch["src_key_padding_mask_frames"],
        )


class TorchClassificationHead(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.fc1 = nn.Linear(cfg.hidden_size, cfg.hidden_size)
        self.layer_norm = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.fc2 = nn.Linear(cfg.hidden_size, cfg.num_classes)

    def forward(self, h):
        return self.fc2(self.layer_norm(F.gelu(self.fc1(h))))


class TorchStlt(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.backbone = TorchStltBackbone(cfg)
        self.prediction_head = TorchClassificationHead(cfg)

    def forward(self, batch: Dict[str, torch.Tensor]):
        out = self.backbone(batch)  # [F, B, H]
        rows = torch.arange(batch["categories"].size(0))
        pooled = out[batch["lengths"] - 1, rows, :]
        return {"stlt": self.prediction_head(pooled)}


def torch_batch_from_numpy(batch_np):
    """numpy batch (our collate_layout output) → torch batch with the masks
    the reference collater would add (datasets.py:273-286)."""
    out = {}
    for k, v in batch_np.items():
        if k == "video_id":
            continue
        t = torch.from_numpy(v)
        if k in ("categories", "frame_types", "lengths"):
            t = t.long()
        out[k] = t
    out["src_key_padding_mask_boxes"] = out["categories"] == 0
    out["src_key_padding_mask_frames"] = out["frame_types"] == 0
    return out
