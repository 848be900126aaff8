"""ctypes bridge to the native C++ layout tokenizer (native/layout_tokenizer.cpp).

Auto-builds the shared library with g++ on first use (cached next to the
source); falls back cleanly when no compiler is available. The native dataset
produces bit-identical outputs to the Python ``LayoutDataset`` (asserted in
tests/test_native_tokenizer.py) — it exists because JSON parsing plus
per-clip Python loops are the host-side bottleneck at production scale
(the reference burns a full Python pass over the dataset at startup alone,
datasets.py:38-47).
"""

from __future__ import annotations

import ctypes
import json
import os
import re
from typing import Dict, List, Optional

import numpy as np

from stlt_tpu.configs import DataConfig

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "layout_tokenizer.cpp",
)
_LIB = os.path.join(os.path.dirname(_SRC), "layout_tokenizer.so")
_TEMPLATE_BRACKETS = re.compile(r"[\[\]]")


def build_library(force: bool = False) -> Optional[str]:
    """Compile the tokenizer if needed; returns the .so path or None."""
    from stlt_tpu.data._native_build import build_shared_library

    return build_shared_library(_SRC, _LIB, force=force)


_lib_handle = None
_lib_lock = __import__("threading").Lock()


def load_library():
    global _lib_handle
    with _lib_lock:
        if _lib_handle is not None:
            return _lib_handle
        from stlt_tpu.data._native_build import load_shared_library

        lib = load_shared_library(_SRC, _LIB)
        if lib is None:
            return None
        lib.lt_parse.restype = ctypes.c_void_p
        lib.lt_parse.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.lt_num_videos.argtypes = [ctypes.c_void_p]
        lib.lt_video_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.lt_video_id.restype = ctypes.c_char_p
        lib.lt_video_id.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.lt_video_meta.restype = ctypes.c_char_p
        lib.lt_video_meta.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.lt_set_size.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_float]
        lib.lt_scan_max_objects.restype = ctypes.c_int
        lib.lt_scan_max_objects.argtypes = [ctypes.c_void_p, ctypes.c_double]
        lib.lt_tokenize.restype = ctypes.c_int
        lib.lt_tokenize.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.lt_free.argtypes = [ctypes.c_void_p]
        _lib_handle = lib
        return lib


def native_available() -> bool:
    return load_library() is not None


class NativeLayoutDataset:
    """Drop-in replacement for ``LayoutDataset`` backed by the C++ arena.

    Same outputs (asserted bit-identical in tests), ~10-40x faster per clip
    and a C-speed startup scan.
    """

    def __init__(self, config: DataConfig, json_file=None):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable (no g++?)")
        if json_file is not None:
            raise ValueError("NativeLayoutDataset reads from config.dataset_path")
        self._lib = lib
        self.config = config
        err = ctypes.create_string_buffer(512)
        vocab = json.dumps(config.category2id).encode()
        self._handle = lib.lt_parse(config.dataset_path.encode(), vocab, err, 512)
        if not self._handle:
            raise ValueError(f"native parse failed: {err.value.decode()}")
        with open(config.labels_path) as f:
            self.labels = json.load(f)
        with open(config.videoid2size_path) as f:
            self.videoid2size = json.load(f)
        self._num_videos = lib.lt_num_videos(self._handle)
        self._video_ids: List[str] = []
        for i in range(self._num_videos):
            vid = lib.lt_video_id(self._handle, i).decode()
            self._video_ids.append(vid)
            width, height = self.videoid2size[vid]
            lib.lt_set_size(self._handle, i, float(width), float(height))
        # Reference overwrites the config's max_num_objects with the scan.
        self.config.max_num_objects = lib.lt_scan_max_objects(
            self._handle, config.score_threshold
        )
        self._multilabel = config.dataset_name == "action_genome"

    def __len__(self) -> int:
        return self._num_videos

    def max_video_frames(self) -> int:
        """Longest clip's frame count (live-prefix capacity scans,
        configs.spatial_live_capacity_for). Startup-only O(n) ctypes walk."""
        return max(
            (
                int(self._lib.lt_video_num_frames(self._handle, i))
                for i in range(self._num_videos)
            ),
            default=0,
        )

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.lt_free(handle)
            self._handle = None

    def _meta(self, idx: int) -> str:
        return self._lib.lt_video_meta(self._handle, idx).decode()

    def get_actions(self, idx: int) -> np.ndarray:
        meta = self._meta(idx)
        if self._multilabel:
            actions = np.zeros((len(self.labels),), dtype=np.float32)
            for action in meta.split(";"):
                if action:
                    actions[int(action[1:])] = 1.0
            return actions
        template = _TEMPLATE_BRACKETS.sub("", meta)
        return np.asarray(int(self.labels[template]), dtype=np.int32)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None) -> Dict:
        from stlt_tpu.data.samplers import (
            get_test_layout_indices,
            sample_train_layout_indices,
        )

        cfg = self.config
        num_video_frames = self._lib.lt_video_num_frames(self._handle, idx)
        if cfg.train:
            indices = sample_train_layout_indices(
                cfg.layout_num_frames, num_video_frames, rng=rng
            )
        else:
            indices = get_test_layout_indices(cfg.layout_num_frames, num_video_frames)
        F_total, O = cfg.num_total_frames, cfg.num_total_boxes
        categories = np.empty((F_total, O), dtype=np.int32)
        boxes = np.empty((F_total, O, 4), dtype=np.float32)
        scores = np.empty((F_total, O), dtype=np.float32)
        frame_types = np.empty((F_total,), dtype=np.int32)
        idx_arr = np.asarray(indices, dtype=np.int32)
        f2t = cfg.frame2type
        rc = self._lib.lt_tokenize(
            self._handle,
            idx,
            idx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(indices),
            cfg.score_threshold,
            cfg.category2id["cls"],
            f2t["pad"], f2t["regular"], f2t["empty"], f2t["extract"],
            F_total, O,
            categories.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame_types.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == -1:
            raise KeyError(f"unknown category in video {self._video_ids[idx]}")
        if rc != 0:
            raise IndexError(f"native tokenize failed ({rc}) for clip {idx}")
        return {
            "video_id": self._video_ids[idx],
            "categories": categories,
            "boxes": boxes,
            "scores": scores,
            "frame_types": frame_types,
            "lengths": np.asarray(len(indices) + 1, dtype=np.int32),
            "labels": self.get_actions(idx),
        }
