"""Segmentation losses.

JAX equivalent of the reference's wrapper over
``nn.CrossEntropyLoss(ignore_index=255)``
(`/root/reference/src/network/deeplab_v3_plus/models/loss.py:4-18`):
softmax cross entropy with ignored labels excluded from the mean, exactly
matching torch's 'mean' reduction (divide by the number of counted
elements, not the batch size).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def cross_entropy_loss(
    logits: Array,
    labels: Array,
    ignore_index: int = 255,
    weight: Optional[Array] = None,
) -> Array:
    """Mean softmax cross entropy over non-ignored pixels.

    Args:
        logits: (..., C) unnormalized scores (NHWC layout).
        labels: (...) integer labels; ``ignore_index`` entries are skipped.
        weight: optional (C,) per-class weights (torch semantics: the mean
            is divided by the summed weights of counted elements).
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
    nll = -picked

    if weight is not None:
        w = jnp.asarray(weight)[safe_labels]
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


class CrossEntropyLoss:
    """Callable matching the reference loss object's signature."""

    def __init__(self, weight=None, ignore_index: int = -100):
        self.weight = weight
        self.ignore_index = ignore_index

    def __call__(self, logits: Array, labels: Array) -> Array:
        return cross_entropy_loss(
            logits, labels, ignore_index=self.ignore_index, weight=self.weight
        )
