"""Attention-mask helpers.

The reference uses PyTorch conventions: boolean ``src_key_padding_mask`` where
True means *masked* (built by the collater, ``src/modelling/datasets.py:273-286``)
and a boolean causal mask (``src/utils/model_utils.py:4-7``). Here masks are
additive f32 biases (0 = attend, large-negative = masked), the natural form for
XLA/Pallas attention. With at least one unmasked key per row — guaranteed by
the CLS-carrying pad frames — a finite large-negative bias is numerically
identical to PyTorch's ``-inf`` fill (the masked terms underflow to exactly 0
after the max-subtracted exp), and fully-masked rows degrade to a uniform
distribution instead of NaN.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MASK_VALUE = -1e9


def causal_bias(num_frames: int, dtype=jnp.float32) -> jnp.ndarray:
    """[T, T] additive bias allowing position t to attend to <= t
    (reference model_utils.py:4-7)."""
    allowed = np.tril(np.ones((num_frames, num_frames), dtype=bool))
    return jnp.where(allowed, 0.0, MASK_VALUE).astype(dtype)


def key_padding_bias(padding_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[..., S] boolean (True = masked) → [..., 1, 1, S] additive bias,
    broadcastable over heads and query positions."""
    bias = jnp.where(padding_mask, MASK_VALUE, 0.0).astype(dtype)
    return bias[..., None, None, :]


def boxes_padding_mask(categories: jnp.ndarray) -> jnp.ndarray:
    """True where the box slot is padding (reference datasets.py:273-278:
    ``categories == 0``)."""
    return categories == 0


def frames_padding_mask(frame_types: jnp.ndarray, pad_type: int = 0) -> jnp.ndarray:
    """True where the frame is padding (reference datasets.py:279-286:
    ``frame_types == frame2type['pad']``; pad is id 0 for both datasets)."""
    return frame_types == pad_type
