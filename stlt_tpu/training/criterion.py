"""Loss functions.

Reference: ``src/utils/train_inference_utils.py:64-76`` — CrossEntropyLoss for
Something(-Else), BCEWithLogitsLoss for Action Genome, **averaged over all
logit heads** (so CACNF's four heads — including the ensemble — all receive
loss).

TPU-first addition: an optional per-sample ``valid`` mask. The reference
never pads batches; we pad the final partial batch to the static batch size
and take a masked mean, which is loss-equivalent to the reference's smaller
final batch.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import optax


def _masked_mean(per_sample: jnp.ndarray, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    if valid is None:
        return per_sample.mean()
    valid = valid.astype(per_sample.dtype)
    return (per_sample * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Softmax cross-entropy with integer labels (torch CrossEntropyLoss)."""
    per_sample = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    )
    return _masked_mean(per_sample, valid)


def bce_with_logits(
    logits: jnp.ndarray, labels: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Element-wise sigmoid BCE (torch BCEWithLogitsLoss, mean reduction)."""
    per_sample = optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), labels.astype(jnp.float32)
    ).mean(axis=-1)
    return _masked_mean(per_sample, valid)


def make_criterion(dataset_name: str):
    loss_fn = cross_entropy if dataset_name == "something" else bce_with_logits

    def criterion(
        logits: Dict[str, jnp.ndarray],
        labels: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        losses = [loss_fn(v, labels, valid) for v in logits.values()]
        return sum(losses) / len(losses)

    return criterion
