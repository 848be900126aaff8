"""Configuration dataclasses for the TPU-native STLT framework.

Mirrors the reference configuration surface (flag names, defaults, and the
hard-coded vocabularies) while being a clean dataclass design:

- reference: ``src/modelling/configs.py:4-89`` (DataConfig),
  ``:92-99`` (GeneralModelConfig), ``:102-126`` (StltModelConfig),
  ``:129-147`` (AppearanceModelConfig), ``:150-175`` (MultimodalModelConfig),
  ``:178-185`` (model_configs_factory).

TPU-specific additions (not present in the reference, which is single-GPU
PyTorch): ``compute_dtype`` for bf16 matmuls, ``use_pallas`` to enable fused
attention kernels, and mesh axis sizes for data/tensor parallelism.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

# ---------------------------------------------------------------------------
# Hard-coded vocabularies (reference: src/modelling/configs.py:30-89).
# Kept as data so they can be swapped per dataset.
# ---------------------------------------------------------------------------

SOMETHING_CATEGORY2ID: Dict[str, int] = {
    "pad": 0,
    "hand": 1,
    "object": 2,
    "cls": 3,
}

ACTION_GENOME_CATEGORY2ID: Dict[str, int] = {
    "pad": 0,
    "cls": 1,
    "chair": 2,
    "book": 3,
    "medicine": 4,
    "vacuum": 5,
    "food": 6,
    "groceries": 7,
    "floor": 8,
    "mirror": 9,
    "closet/cabinet": 10,
    "doorway": 11,
    "paper/notebook": 12,
    "picture": 13,
    "phone/camera": 14,
    "sofa/couch": 15,
    "sandwich": 16,
    "cup/glass/bottle": 17,
    "towel": 18,
    "box": 19,
    "blanket": 20,
    "television": 21,
    "bag": 22,
    "refrigerator": 23,
    "table": 24,
    "light": 25,
    "broom": 26,
    "shoe": 27,
    "doorknob": 28,
    "bed": 29,
    "window": 30,
    "shelf": 31,
    "door": 32,
    "pillow": 33,
    "laptop": 34,
    "dish": 35,
    "clothes": 36,
    "person": 37,
}

SOMETHING_FRAME2TYPE: Dict[str, int] = {
    "pad": 0,
    "start": 1,
    "regular": 2,
    "empty": 3,
    "extract": 4,
}

ACTION_GENOME_FRAME2TYPE: Dict[str, int] = {
    "pad": 0,
    "regular": 1,
    "extract": 2,
    "empty": 3,
}

DATASET_NAMES = ("something", "action_genome")


def category2id_for(dataset_name: str) -> Dict[str, int]:
    if dataset_name == "something":
        return SOMETHING_CATEGORY2ID
    if dataset_name == "action_genome":
        return ACTION_GENOME_CATEGORY2ID
    raise ValueError(f"{dataset_name} does not exist!")


def frame2type_for(dataset_name: str) -> Dict[str, int]:
    if dataset_name == "something":
        return SOMETHING_FRAME2TYPE
    if dataset_name == "action_genome":
        return ACTION_GENOME_FRAME2TYPE
    raise ValueError(f"{dataset_name} does not exist!")


# ---------------------------------------------------------------------------
# Data configuration (reference: src/modelling/configs.py:4-89).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DataConfig:
    dataset_name: str
    dataset_path: Optional[str] = None
    labels_path: Optional[str] = None
    videoid2size_path: Optional[str] = None
    videos_path: Optional[str] = None
    train: bool = False
    layout_num_frames: int = 16
    max_num_objects: int = 7
    score_threshold: float = 0.5
    appearance_num_frames: int = 32
    spatial_size: int = 112
    # TPU extension: round the static frame axis up to a multiple (so the
    # sequence-parallel `context` mesh axis divides it). Pad frames are
    # mask-carrying and semantically inert.
    frames_multiple: int = 1
    # TPU extension: JPEG DCT-scaled decode (PIL draft mode) — ~3x faster
    # host decode; pixels differ slightly from full decode + resize, so it
    # is opt-in (training-safe; keep off for strict eval parity).
    fast_decode: bool = False
    # TPU extension: C++ decode/resize/jitter stage (native/jpeg_pipeline.cpp)
    # — resize + color jitter are bit-identical to the PIL path (asserted in
    # tests/test_native_jpeg.py); decode matches whenever PIL's bundled
    # libjpeg matches the system one. Falls back to PIL when unbuildable.
    native_decode: bool = False
    # TPU extension: ship uint8 crops and normalize on device (4× less
    # host→device transfer for RGB batches); numerically identical — the
    # model applies the same f32 mean/std-0.5 math the host would.
    device_normalize: bool = False

    def __post_init__(self):
        if self.dataset_name not in DATASET_NAMES:
            raise ValueError(f"{self.dataset_name} does not exist!")

    @property
    def category2id(self) -> Dict[str, int]:
        return category2id_for(self.dataset_name)

    @property
    def frame2type(self) -> Dict[str, int]:
        return frame2type_for(self.dataset_name)

    @property
    def num_total_frames(self) -> int:
        """Static frame axis: sampled frames + the appended EXTRACT frame.

        The reference pads to the *batch max* length at collate time
        (``src/utils/data_utils.py:93-102``); we pad every clip to this static
        length instead so every batch has the same XLA-compiled shape. Masks
        make the two semantically identical.
        """
        base = self.layout_num_frames + 1
        m = max(self.frames_multiple, 1)
        return ((base + m - 1) // m) * m

    @property
    def num_total_boxes(self) -> int:
        """Static box axis: CLS pseudo-box + max_num_objects real boxes."""
        return self.max_num_objects + 1


# ---------------------------------------------------------------------------
# Model configurations (reference: src/modelling/configs.py:92-185).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GeneralModelConfig:
    num_classes: int = 0
    hidden_size: int = 768
    hidden_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    num_attention_heads: int = 12
    # --- TPU-native extensions (no reference counterpart) ---
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    use_pallas: bool = False  # fused attention kernels on TPU
    remat: bool = False  # per-encoder-layer activation checkpointing
    # Ragged live-prefix capacity for the spatial fold (static row count the
    # spatial encoder runs at after gathering live rows to a global prefix;
    # None = full B*F rows). Set per batch-bucket by the serving/bench loop
    # via dataclasses.replace — the param tree is capacity-invariant, so one
    # set of weights serves every bucket (models/stlt.py SpatialTransformer).
    spatial_live_capacity: Optional[int] = None
    # Ragged frame-capacity truncation: static frame-axis length the layout
    # branch runs at when every clip's live slots (pads are tail-contiguous)
    # fit a prefix of it; None = the full padded frame axis. Exact because
    # the temporal encoder is causal and pooling reads ``lengths - 1 < cap``
    # (models/stlt.py apply_frame_capacity). Param tree is capacity-invariant
    # (the position table keeps its full ``layout_num_frames`` rows).
    temporal_frame_capacity: Optional[int] = None

    def __post_init__(self):
        assert self.num_classes, "num_classes must not be None!"


@dataclasses.dataclass
class StltModelConfig(GeneralModelConfig):
    unique_categories: int = 0
    num_spatial_layers: int = 4
    num_temporal_layers: int = 8
    # NOTE: model default is 256 (position table size) while the data default
    # is 16 sampled frames — the reference never passes this through train.py,
    # so the table is always 256 (reference configs.py:109). Preserved.
    layout_num_frames: int = 256
    load_backbone_path: Optional[str] = None
    freeze_backbone: bool = False

    def __post_init__(self):
        super().__post_init__()
        assert self.unique_categories, "unique_categories must not be None!"


@dataclasses.dataclass
class AppearanceModelConfig(GeneralModelConfig):
    appearance_num_frames: int = 0
    resnet_model_path: Optional[str] = None
    num_appearance_layers: int = 4
    # TPU extension: R3D depth (reference generate_model supports 10-200 but
    # hardcodes 50 in Resnet3D, models.py:201).
    resnet_depth: int = 50

    def __post_init__(self):
        super().__post_init__()
        assert self.appearance_num_frames, "appearance_num_frames must not be None!"


@dataclasses.dataclass
class MultimodalModelConfig(GeneralModelConfig):
    unique_categories: int = 0
    num_spatial_layers: int = 4
    num_temporal_layers: int = 8
    layout_num_frames: int = 256
    appearance_num_frames: int = 0
    resnet_model_path: Optional[str] = None
    num_appearance_layers: int = 4
    resnet_depth: int = 50
    num_fusion_layers: int = 4
    load_backbone_path: Optional[str] = None
    freeze_backbone: bool = False

    def __post_init__(self):
        super().__post_init__()

    @property
    def stlt_config(self) -> StltModelConfig:
        return StltModelConfig(
            num_classes=self.num_classes,
            hidden_size=self.hidden_size,
            hidden_dropout_prob=self.hidden_dropout_prob,
            layer_norm_eps=self.layer_norm_eps,
            num_attention_heads=self.num_attention_heads,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            remat=self.remat,
            unique_categories=self.unique_categories,
            num_spatial_layers=self.num_spatial_layers,
            num_temporal_layers=self.num_temporal_layers,
            layout_num_frames=self.layout_num_frames,
            spatial_live_capacity=self.spatial_live_capacity,
            temporal_frame_capacity=self.temporal_frame_capacity,
        )

    @property
    def appearance_config(self) -> AppearanceModelConfig:
        return AppearanceModelConfig(
            num_classes=self.num_classes,
            hidden_size=self.hidden_size,
            hidden_dropout_prob=self.hidden_dropout_prob,
            layer_norm_eps=self.layer_norm_eps,
            num_attention_heads=self.num_attention_heads,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            remat=self.remat,
            appearance_num_frames=self.appearance_num_frames,
            resnet_model_path=self.resnet_model_path,
            num_appearance_layers=self.num_appearance_layers,
            resnet_depth=self.resnet_depth,
        )


def _pick(kwargs, names):
    return {k: v for k, v in kwargs.items() if k in names and v is not None}


def position_table_rows(data_config: DataConfig) -> int:
    """Frame-position-table rows for a model driven by ``data_config``.

    The reference hard-codes 256 (``src/modelling/configs.py:109`` — train.py
    never passes it through) and breaks beyond 255 layout frames. We keep the
    256 floor for drop-in checkpoint compatibility and GROW the table with the
    padded frame axis when clips are longer — a TPU-native extension; loading
    a 256-row checkpoint into a grown table resamples it
    (``utils.convert.resize_position_table``).
    """
    return max(StltModelConfig.layout_num_frames, data_config.num_total_frames)


def spatial_live_capacity_for(dataset, data_config: DataConfig, batch_size: int,
                              frame_axis: Optional[int] = None):
    """Safe-by-construction live-prefix capacity for a whole dataset
    (``--live_prefix``): each clip's live frame rows are bounded by
    ``min(its frame count, layout_num_frames) + 1`` (the extract slot), so
    ``batch_size x dataset max`` bounds every batch's live rows — the
    capacity contract in models/stlt.py holds for all batches with no
    per-batch recompiles. Returns ``None`` when the fold would not shrink
    (the data fills the frame axis — the common short-table configs) or the
    feature is off (``STLT_LIVE_PREFIX=0``); only long-context configs
    (grown position tables, ragged clips) benefit. ``frame_axis`` overrides
    the padded frame count the model actually runs at (the
    ``temporal_frame_capacity`` truncation shrinks it below
    ``num_total_frames`` — both levers compose)."""
    from stlt_tpu.ops.fused_encoder import LIVE_PREFIX_ENABLED

    if not LIVE_PREFIX_ENABLED:
        return None
    scan = getattr(dataset, "max_video_frames", None)
    if scan is None:
        return None
    max_frames = scan()
    if max_frames <= 0:
        return None
    max_live = min(max_frames, data_config.layout_num_frames) + 1
    total = batch_size * (frame_axis or data_config.num_total_frames)
    cap = min(total, ((batch_size * max_live + 7) // 8) * 8)
    return None if cap >= total else cap


def frame_capacity_for(dataset, data_config: DataConfig):
    """Safe-by-construction temporal frame capacity for a whole dataset
    (``--live_prefix``): every clip's live slots are bounded by
    ``min(its frame count, layout_num_frames) + 1`` (the extract slot) and
    pads are tail-contiguous, so truncating the frame axis to the dataset
    max drops only all-dead slots in every batch — no per-batch recompiles.
    Returns ``None`` when truncation would not shrink or the scan can't
    prove a bound (``models/stlt.py apply_frame_capacity`` contract)."""
    from stlt_tpu.ops.fused_encoder import FRAME_CAP_ENABLED

    if not FRAME_CAP_ENABLED:
        return None
    scan = getattr(dataset, "max_video_frames", None)
    if scan is None:
        return None
    max_frames = scan()
    if max_frames <= 0:
        return None
    max_live = min(max_frames, data_config.layout_num_frames) + 1
    total = data_config.num_total_frames
    cap = min(total, ((max_live + 7) // 8) * 8)
    return None if cap >= total else cap


def make_model_config(model_name: str, **kwargs):
    """Build the right config from a flat kwargs dict (reference
    model_configs_factory, src/modelling/configs.py:178-185)."""
    cls = model_configs_factory[model_name]
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**_pick(kwargs, fields))


model_configs_factory = {
    "stlt": StltModelConfig,
    "resnet3d": AppearanceModelConfig,
    "resnet3d-transformer": AppearanceModelConfig,
    "lcf": MultimodalModelConfig,
    "caf": MultimodalModelConfig,
    "cacnf": MultimodalModelConfig,
}
