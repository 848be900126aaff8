"""Dataset/collate factories (reference: src/modelling/datasets.py:232-236, 322-326)."""

from __future__ import annotations

import functools
import os

from stlt_tpu.data.layout import LayoutDataset, collate_layout


def _layout_dataset(config, json_file=None):
    """Prefer the native C++ tokenizer (bit-identical, ~4x faster host path);
    set STLT_NATIVE=0 to force the pure-Python dataset."""
    if json_file is None and os.environ.get("STLT_NATIVE", "auto") != "0":
        try:
            from stlt_tpu.data.native import NativeLayoutDataset, native_available

            if native_available():
                return NativeLayoutDataset(config)
        except Exception:
            pass
    return LayoutDataset(config, json_file)


def _layout_collate(config):
    return functools.partial(collate_layout, dataset_name=config.dataset_name)


def _appearance_dataset(config, json_file=None):
    from stlt_tpu.data.appearance import AppearanceDataset

    return AppearanceDataset(config, json_file)


def _appearance_collate(config):
    from stlt_tpu.data.appearance import collate_appearance

    return collate_appearance


def _multimodal_dataset(config, json_file=None):
    from stlt_tpu.data.multimodal import MultimodalDataset

    return MultimodalDataset(config)


def _multimodal_collate(config):
    from stlt_tpu.data.multimodal import make_collate_multimodal

    return make_collate_multimodal(config)


datasets_factory = {
    "layout": _layout_dataset,
    "appearance": _appearance_dataset,
    "multimodal": _multimodal_dataset,
}

collaters_factory = {
    "layout": _layout_collate,
    "appearance": _appearance_collate,
    "multimodal": _multimodal_collate,
}
