"""Model factory (reference: src/modelling/models.py:552-559)."""

from stlt_tpu.models.appearance import Resnet3D, TransformerResnet
from stlt_tpu.models.fusion import (
    CrossAttentionCentralNetFusion,
    CrossAttentionFusion,
    CrossAttentionFusionBackbone,
    LateConcatenationFusion,
)
from stlt_tpu.models.stlt import ClassificationHead, Stlt, StltBackbone

models_factory = {
    "stlt": Stlt,
    "resnet3d": Resnet3D,
    "resnet3d-transformer": TransformerResnet,
    "lcf": LateConcatenationFusion,
    "caf": CrossAttentionFusion,
    "cacnf": CrossAttentionCentralNetFusion,
}
