"""Model registry (ref `/root/reference/src/network/deeplab_v3_plus/models/build.py:57-72`).

``build_model(cfg)`` returns ``(model, loss_fn, train_metric, val_metric)``
like the reference.  SYNC_BN needs no module surgery here: BatchNorm inside
a pjit'ed step computes statistics over the *global* logical batch, which
is SyncBatchNorm semantics by construction; SYNC_BN=False (the reference's
DDP default) selects the shard_map per-device-statistics train step
(parallel/train_step.py::make_per_device_bn_train_step) in the Trainer.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .deeplab import deeplab_from_cfg
from .loss import CrossEntropyLoss
from .metrics import MeanIOU
from .xception import Xception65


def build_deeplabv3_plus(cfg, dtype=None):
    # TRAIN.REMAT_BACKBONE exists only in the train config tree; the demo
    # tree (inference) never remats.
    remat = bool(getattr(getattr(cfg, "TRAIN", object()), "REMAT_BACKBONE", False))
    net = deeplab_from_cfg(cfg, dtype=dtype, remat_backbone=remat)
    loss_fn = CrossEntropyLoss(ignore_index=255)
    return net, loss_fn, MeanIOU(cfg.DATASET.NUM_CLASSES), MeanIOU(cfg.DATASET.NUM_CLASSES)


def build_xception(cfg, dtype=None):
    """Xception65 feature extractor + 1x1 classifier head.

    The reference declares this builder but leaves it unimplemented
    (ref models/build.py:9-10); we wire the written-but-unwired Xception65
    (ref backbone/xception.py:167-326) into a minimal segmentation head so
    the registry entry is functional.
    """

    class XceptionSeg(nn.Module):
        num_classes: int
        output_stride: int = 16
        remat: bool = False

        @nn.compact
        def __call__(self, x, train: bool = False, upsample_pred: bool = True):
            from ..ops.resize import resize_align_corners

            input_hw = (x.shape[-3], x.shape[-2])
            feats = Xception65(
                output_stride=self.output_stride, remat=self.remat, name="backbone"
            )(x, train)
            logits = nn.Conv(self.num_classes, (1, 1), name="classifier")(feats["feature"])
            if upsample_pred:
                logits = resize_align_corners(logits.astype(jnp.float32), input_hw)
            return logits

    net = XceptionSeg(
        num_classes=cfg.DATASET.NUM_CLASSES,
        output_stride=cfg.MODEL.OUTPUT_STRIDE,
        remat=bool(getattr(getattr(cfg, "TRAIN", object()), "REMAT_BACKBONE", False)),
    )
    loss_fn = CrossEntropyLoss(ignore_index=255)
    return net, loss_fn, MeanIOU(cfg.DATASET.NUM_CLASSES), MeanIOU(cfg.DATASET.NUM_CLASSES)


def build_dummy_model(cfg, dtype=None):
    """Tiny stand-in model (ref models/build.py:27-54) for pipeline tests."""

    class Dummy(nn.Module):
        num_classes: int

        @nn.compact
        def __call__(self, x, train: bool = False, upsample_pred: bool = True):
            from ..ops.resize import resize_align_corners

            input_hw = (x.shape[-3], x.shape[-2])
            x = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)))(x)
            x = nn.relu(x)
            x = nn.Conv(self.num_classes, (1, 1))(x)
            if upsample_pred:
                x = resize_align_corners(x, input_hw)
            return x

    net = Dummy(num_classes=cfg.DATASET.NUM_CLASSES)
    loss_fn = CrossEntropyLoss(ignore_index=255)
    return net, loss_fn, MeanIOU(cfg.DATASET.NUM_CLASSES), MeanIOU(cfg.DATASET.NUM_CLASSES)


_MODEL_BUILDERS = {
    "Xception": build_xception,
    "DeepLabv3+": build_deeplabv3_plus,
    "Dummy": build_dummy_model,
}


def build_model(cfg, dtype: Optional[jnp.dtype] = None):
    """General building function (ref models/build.py:65-72)."""
    if cfg.MODEL.TYPE not in _MODEL_BUILDERS:
        raise KeyError(f"Unknown MODEL.TYPE {cfg.MODEL.TYPE!r}")
    return _MODEL_BUILDERS[cfg.MODEL.TYPE](cfg, dtype=dtype)
