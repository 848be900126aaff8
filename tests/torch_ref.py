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


# --- fusion oracle (reference models.py:286-549) ---------------------------

from tests.torch_ref_appearance import TorchTransformerResnet  # noqa: E402


class TorchFusionHead(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.fc1 = nn.Linear(cfg.hidden_size * 2, cfg.hidden_size)
        self.layer_norm = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.fc2 = nn.Linear(cfg.hidden_size, cfg.num_classes)

    def forward(self, h):
        return self.fc2(self.layer_norm(F.gelu(self.fc1(h))))


class TorchFeedforward(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.linear1 = nn.Linear(cfg.hidden_size, cfg.hidden_size * 4)
        self.linear2 = nn.Linear(cfg.hidden_size * 4, cfg.hidden_size)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.ln = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)

    def forward(self, x):
        return self.ln(self.dropout(self.linear2(F.gelu(self.linear1(x)))) + x)


class TorchSelfAttention(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.attn = nn.MultiheadAttention(
            cfg.hidden_size, cfg.num_attention_heads, dropout=cfg.hidden_dropout_prob
        )
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.ln = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)

    def forward(self, x, causal_mask=None, key_padding_mask=None):
        h = self.attn(x, x, x, key_padding_mask=key_padding_mask, attn_mask=causal_mask)[0]
        return self.ln(self.dropout(h) + x)


class TorchCrossAttention(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.attn = nn.MultiheadAttention(
            cfg.hidden_size, cfg.num_attention_heads, dropout=cfg.hidden_dropout_prob
        )
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.ln = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)

    def forward(self, inputs, context, context_padding_mask=None):
        h = self.attn(inputs, context, context, key_padding_mask=context_padding_mask)[0]
        return self.ln(self.dropout(h) + inputs)


class TorchCrossModal(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cross_attn = TorchCrossAttention(cfg)
        self.layout_attn = TorchSelfAttention(cfg)
        self.layout_ffn = TorchFeedforward(cfg)
        self.appearance_attn = TorchSelfAttention(cfg)
        self.appearance_ffn = TorchSelfAttention(cfg)  # reference quirk

    def forward(self, lay, app, causal, lay_pad):
        lay_o = self.cross_attn(lay, app)
        app_o = self.cross_attn(app, lay, lay_pad)
        lay_o = self.layout_attn(lay_o, causal_mask=causal, key_padding_mask=lay_pad)
        app_o = self.appearance_attn(app_o)
        return self.layout_ffn(lay_o), self.appearance_ffn(app_o)


class TorchCafBackbone(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.layout_branch = TorchStltBackbone(cfg.stlt_config)
        self.appearance_branch = TorchTransformerResnet(cfg.appearance_config)
        self.mm_fusion = nn.ModuleList(
            [TorchCrossModal(cfg) for _ in range(cfg.num_fusion_layers)]
        )

    def forward(self, batch):
        causal = causal_mask(batch["categories"].size(1))
        lay = self.layout_branch(batch)                      # [F, B, H]
        app = self.appearance_branch.forward_features(batch)  # [S+1, B, H]
        rows = torch.arange(batch["categories"].size(0))
        lay_state = lay[batch["lengths"] - 1, rows, :]
        app_state = app[0, :, :]
        for layer in self.mm_fusion:
            lay, app = layer(lay, app, causal, batch["src_key_padding_mask_frames"])
        fused = torch.cat((lay[batch["lengths"] - 1, rows, :], app[0, :, :]), dim=-1)
        return {
            "layout_hidden_state": lay_state,
            "appearance_hidden_state": app_state,
            "last_fused_state": fused,
        }


class TorchLCF(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.layout_branch = TorchStltBackbone(cfg.stlt_config)
        self.appearance_branch = TorchTransformerResnet(cfg.appearance_config)
        self.classifier = TorchFusionHead(cfg)

    def forward(self, batch):
        lay = self.layout_branch(batch)
        rows = torch.arange(batch["categories"].size(0))
        lay = lay[batch["lengths"] - 1, rows, :]
        app = self.appearance_branch.forward_features(batch)[0, :, :]
        return {"lcf": self.classifier(torch.cat((lay, app), dim=-1))}


class TorchCAF(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.caf_backbone = TorchCafBackbone(cfg)
        self.classifier = TorchFusionHead(cfg)

    def forward(self, batch):
        return {"caf": self.classifier(self.caf_backbone(batch)["last_fused_state"])}


class TorchCACNF(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.backbone = TorchCafBackbone(cfg)
        self.layout_classifier = TorchClassificationHead(cfg)
        self.appearance_classifier = TorchClassificationHead(cfg)
        self.fusion_classifier = TorchFusionHead(cfg)

    def forward(self, batch):
        s = self.backbone(batch)
        a = self.layout_classifier(s["layout_hidden_state"])
        b = self.appearance_classifier(s["appearance_hidden_state"])
        c = self.fusion_classifier(s["last_fused_state"])
        return {"stlt": a, "resnet3d": b, "caf": c, "ensemble": (a + b + c) / 3}
