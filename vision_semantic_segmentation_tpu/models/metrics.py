"""Segmentation metrics.

Mean IoU via confusion-matrix accumulation — the jitted, device-side
equivalent of `/root/reference/src/network/deeplab_v3_plus/models/metrics.py:9-80`.
The per-batch update is a pure function (bincount on the MXU-free VPU path)
that can run inside the train step; cross-device reduction is a
``lax.psum`` over the mesh data axis instead of NCCL all_reduce
(ref metrics.py:64-70).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def confusion_matrix_update(preds: Array, labels: Array, num_class: int) -> Array:
    """Per-batch (C, C) confusion counts; rows = truth, cols = prediction.

    Ignores labels outside [0, num_class) — the reference's masking of the
    255 boundary label (ref metrics.py:57-60 bincount trick).

    Args:
        preds: (..., C) logits/probabilities, argmax'd internally, or (...)
            integer predictions.
        labels: (...) integer ground truth.
    """
    if preds.ndim == labels.ndim + 1:
        preds = jnp.argmax(preds, axis=-1)
    preds = preds.astype(jnp.int32).reshape(-1)
    labels = labels.astype(jnp.int32).reshape(-1)
    valid = (labels >= 0) & (labels < num_class)
    # one-hot matmul, NOT a scatter-add: XLA serializes duplicate-index
    # scatters on TPU (~1M points colliding into C^2 slots cost SECONDS per
    # train step); the (C, N) @ (N, C) contraction runs on the MXU and the
    # f32 accumulator keeps counts exact up to 2^24 points.
    lab_oh = jax.nn.one_hot(jnp.where(valid, labels, 0), num_class, dtype=jnp.float32)
    lab_oh = lab_oh * valid[:, None].astype(jnp.float32)
    pred_oh = jax.nn.one_hot(preds, num_class, dtype=jnp.float32)
    return jnp.matmul(lab_oh.T, pred_oh, precision=jax.lax.Precision.HIGHEST)


def miou_from_confusion(cm: Array) -> Array:
    """nanmean of per-class IoU (ref metrics.py:72-80)."""
    cm = jnp.asarray(cm, dtype=jnp.float64 if cm.dtype == jnp.float64 else jnp.float32)
    intersection = jnp.diagonal(cm)
    union = cm.sum(axis=0) + cm.sum(axis=1) - intersection
    iou = jnp.where(union > 0, intersection / jnp.maximum(union, 1e-12), jnp.nan)
    return jnp.nanmean(iou)


class MeanIOU:
    """Stateful accumulator with the reference's API surface.

    ``evaluate`` accepts NHWC logits (or integer predictions) and integer
    labels; device work is one jitted bincount, host work is one (C, C) add.
    """

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.confusion_matrix = np.zeros((num_class, num_class), dtype=np.float64)
        self._update = jax.jit(
            lambda p, l: confusion_matrix_update(p, l, num_class)
        )

    def reset(self) -> None:
        self.confusion_matrix[:] = 0

    def evaluate(self, preds: Array, labels: Array) -> None:
        self.confusion_matrix += np.asarray(self._update(preds, labels), dtype=np.float64)

    def merge(self, cm: Array) -> None:
        """Fold in an externally computed (e.g. psum'd) confusion matrix."""
        self.confusion_matrix += np.asarray(cm, dtype=np.float64)

    def synchronize_between_processes(self, axis_name: Optional[str] = None):
        """No-op hook: in SPMD the reduction happens via psum inside jit.

        Kept for API parity with the DDP version (ref metrics.py:64-70);
        multi-host aggregation uses ``jax.experimental.multihost_utils`` in
        the trainer instead.
        """
        return

    @property
    def global_avg(self) -> float:
        cm = self.confusion_matrix
        intersection = np.diag(cm)
        union = cm.sum(axis=0) + cm.sum(axis=1) - intersection
        iou = np.divide(
            intersection, union, out=np.full(union.shape, np.nan), where=union != 0
        )
        return float(np.nanmean(iou))
