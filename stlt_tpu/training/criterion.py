"""Loss functions.

Reference: ``src/utils/train_inference_utils.py:64-76`` — CrossEntropyLoss for
Something(-Else), BCEWithLogitsLoss for Action Genome, **averaged over all
logit heads** (so CACNF's four heads — including the ensemble — all receive
loss).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels (torch CrossEntropyLoss)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean element-wise sigmoid BCE (torch BCEWithLogitsLoss)."""
    return optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), labels.astype(jnp.float32)
    ).mean()


def make_criterion(dataset_name: str):
    loss_fn = cross_entropy if dataset_name == "something" else bce_with_logits

    def criterion(logits: Dict[str, jnp.ndarray], labels: jnp.ndarray) -> jnp.ndarray:
        losses = [loss_fn(v, labels) for v in logits.values()]
        return sum(losses) / len(losses)

    return criterion
