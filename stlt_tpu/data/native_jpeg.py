"""ctypes bridge to the native JPEG decode+resize stage (native/jpeg_pipeline.cpp).

The reference decodes HDF5-archived JPEG frames with PIL per DataLoader
worker (``src/modelling/datasets.py:158-177``); here the hot stage — JPEG
entropy decode (optionally DCT-scaled, PIL-draft semantics) plus
shorter-side-to-target resize — runs in C++ against the system
libjpeg(-turbo). The resize step reimplements Pillow's fixed-point
resampler and is bit-identical to ``Image.resize(..., BILINEAR)``
(tests/test_native_jpeg.py); the decode step matches PIL whenever PIL's
bundled libjpeg matches the system one, so the pipeline keeps it opt-in
(``DataConfig.native_decode``) with a clean PIL fallback.

Auto-builds with g++ on first use (cached next to the source), like
``data/native.py``; requires libjpeg headers (-ljpeg) — unavailable means
``native_jpeg_available()`` is False and callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "jpeg_pipeline.cpp",
)
_LIB = os.path.join(os.path.dirname(_SRC), "jpeg_pipeline.so")


def build_library(force: bool = False) -> Optional[str]:
    """Compile the decoder if needed; returns the .so path or None."""
    from stlt_tpu.data._native_build import build_shared_library

    return build_shared_library(_SRC, _LIB, extra_flags=["-ljpeg"], force=force)


_lib_handle = None
_lib_tried = False
_lib_lock = __import__("threading").Lock()


def load_library():
    global _lib_handle, _lib_tried
    with _lib_lock:
        if _lib_handle is not None or _lib_tried:
            return _lib_handle
        _lib_tried = True
        from stlt_tpu.data._native_build import load_shared_library

        lib = load_shared_library(_SRC, _LIB, extra_flags=["-ljpeg"])
        if lib is None:
            return None
        _setup_signatures(lib)
        _lib_handle = lib
        return lib


def _setup_signatures(lib):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    intp = ctypes.POINTER(ctypes.c_int)
    lib.jp_probe.restype = ctypes.c_int
    lib.jp_probe.argtypes = [u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, intp, intp]
    lib.jp_decode_resize.restype = ctypes.c_int
    lib.jp_decode_resize.argtypes = [
        u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
    ]
    lib.jp_resize_rgb.restype = ctypes.c_int
    lib.jp_resize_rgb.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
    ]
    lib.jp_jitter_rgb.restype = ctypes.c_int
    lib.jp_jitter_rgb.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, intp,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int,
    ]


def native_jpeg_available() -> bool:
    return load_library() is not None


def unavailable_reason() -> Optional[str]:
    """Why the native stage is unavailable (compiler stderr etc.), or None."""
    if native_jpeg_available():
        return None
    from stlt_tpu.data._native_build import last_build_error

    return last_build_error(_SRC) or "shared library failed to load"


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_resize(
    jpeg_bytes: bytes, target_short: int, *, draft: bool = False
) -> Optional[np.ndarray]:
    """JPEG bytes → uint8 [H, W, 3] with the shorter side == target_short.

    ``draft`` applies PIL's DCT-scaled draft decode (``fast_decode``
    semantics). Returns None on any failure so callers fall back to PIL.
    """
    lib = load_library()
    if lib is None:
        return None
    buf = np.frombuffer(jpeg_bytes, dtype=np.uint8)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if lib.jp_probe(_u8ptr(buf), buf.size, target_short, int(draft),
                    ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    if lib.jp_decode_resize(_u8ptr(buf), buf.size, target_short, int(draft),
                            _u8ptr(out), w.value, h.value) != 0:
        return None
    return out


def jitter_rgb(image: np.ndarray, jitter) -> bool:
    """Apply a ``transforms.VideoColorJitter``'s draw to a uint8 [H, W, 3]
    array IN PLACE, bit-identically to the PIL op chain. Returns False (array
    untouched) when the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return False
    assert image.dtype == np.uint8 and image.ndim == 3 and image.shape[2] == 3
    assert image.flags.c_contiguous
    order = (ctypes.c_int * 4)(*[int(o) for o in jitter.order])
    # Python rounding semantics for the hue shift (transforms.adjust_hue).
    hue_shift = int(round(jitter.hue * 255))
    apply_hue = int(abs(jitter.hue) >= 1e-9)
    rc = lib.jp_jitter_rgb(
        _u8ptr(image), image.shape[1], image.shape[0], order,
        jitter.brightness, jitter.contrast, jitter.saturation,
        hue_shift, apply_hue,
    )
    return rc == 0


def resize_rgb(image: np.ndarray, out_w: int, out_h: int) -> Optional[np.ndarray]:
    """Pillow-bit-identical bilinear resample of a uint8 [H, W, 3] array."""
    lib = load_library()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.uint8)
    assert image.ndim == 3 and image.shape[2] == 3, image.shape
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    rc = lib.jp_resize_rgb(
        _u8ptr(image), image.shape[1], image.shape[0], _u8ptr(out), out_w, out_h
    )
    return out if rc == 0 else None
