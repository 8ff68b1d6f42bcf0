"""Dataset + network-output visualization helpers.

Rebuilds:
  * Mapillary palette loading / label colorization
    (ref data/utils/mapillary_visualization.py:9-89 — also used by the
    runtime node; the device path lives in ops/colormap.py, these are the
    host-side wrappers)
  * BDD trainId -> color map (ref data/utils/bdd_visualization.py:10-39)
  * network-output panels for TensorBoard: denormalized input image grid +
    colored prediction/label grid (ref data/utils/visualization.py:65-106)
"""
from __future__ import annotations

import json
from typing import List, Optional, Sequence

import numpy as np

from ...ops.colormap import MAPILLARY_19_PALETTE


def get_labels(dataset_config_path: str) -> List[dict]:
    """Read labels metadata from a Mapillary-style config.json (ref :9-33)."""
    with open(dataset_config_path) as f:
        return json.load(f)["labels"]


def palette_from_cfg(net_cfg) -> np.ndarray:
    """Label palette selected by the network config.

    Mirrors the reference's selection logic: the video demo switches on
    ``TRAIN_DATASET`` (ref video_generator.py:24-27, 96-101) and the seg
    node loads colors from the ``DATASET_CONFIG`` labels JSON
    (ref vision_semantic_segmentation_node.py:62-63).  Falls back to the
    built-in Mapillary-19 palette.
    """
    if net_cfg is None:
        return MAPILLARY_19_PALETTE
    train_dataset = str(net_cfg.TRAIN_DATASET) if "TRAIN_DATASET" in net_cfg else ""
    if train_dataset.upper() == "BDD":
        return bdd_trainid_color_map()
    dataset_config = (
        str(net_cfg.DATASET_CONFIG) if "DATASET_CONFIG" in net_cfg else ""
    )
    if dataset_config:
        palette = np.zeros((256, 3), dtype=np.uint8)
        for i, label in enumerate(get_labels(dataset_config)):
            palette[i] = label["color"]
        return palette
    return MAPILLARY_19_PALETTE


def apply_color_map(label_array: np.ndarray, labels: Sequence[dict]) -> np.ndarray:
    """Label id image -> RGB using labels[i]['color'] (ref :70-89).

    Out-of-range ids (e.g. ignore=255) render black.
    """
    palette = np.zeros((256, 3), dtype=np.uint8)
    for i, label in enumerate(labels):
        palette[i] = label["color"]
    return palette[np.asarray(label_array, dtype=np.int64).clip(0, 255)]


def bdd_trainid_color_map() -> np.ndarray:
    """(256, 3) trainId -> color palette from the BDD label table."""
    from .bdd import labels

    palette = np.zeros((256, 3), dtype=np.uint8)
    for label in labels:
        if 0 <= label.trainId < 255:
            palette[label.trainId] = label.color
    return palette


def apply_bdd_color_map(label_array: np.ndarray) -> np.ndarray:
    return bdd_trainid_color_map()[np.asarray(label_array, np.int64).clip(0, 255)]


def make_grid(images: np.ndarray, nrow: int = 4, padding: int = 2) -> np.ndarray:
    """Tile a (N, H, W, C) batch into one (H', W', C) canvas."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    canvas = np.zeros(
        (nrows * (h + padding) - padding, ncol * (w + padding) - padding, c),
        dtype=images.dtype,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        canvas[r * (h + padding) : r * (h + padding) + h,
               col * (w + padding) : col * (w + padding) + w] = images[i]
    return canvas


def denormalize_images(
    images: np.ndarray,
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
) -> np.ndarray:
    """Undo ImageNet normalization back to uint8 (ref visualization.py:65-80)."""
    x = np.asarray(images) * np.asarray(std) + np.asarray(mean)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def log_network_outputs(
    writer,
    tag: str,
    images: np.ndarray,
    preds: np.ndarray,
    labels: np.ndarray,
    global_step: int,
    dataset_labels: Optional[Sequence[dict]] = None,
    nrow: int = 4,
) -> None:
    """Write input/prediction/label panels to TensorBoard (ref :82-106).

    Args:
        writer: a tensorboardX SummaryWriter (or compatible).
        images: (N, H, W, 3) normalized inputs; preds/labels: (N, H, W) ids.
    """
    if dataset_labels is not None:
        palette = np.zeros((256, 3), dtype=np.uint8)
        for i, l in enumerate(dataset_labels):
            palette[i] = l["color"]
    else:
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[: len(MAPILLARY_19_PALETTE)] = MAPILLARY_19_PALETTE

    img_grid = make_grid(denormalize_images(images), nrow)
    pred_grid = make_grid(palette[np.asarray(preds, np.int64).clip(0, 255)], nrow)
    label_grid = make_grid(palette[np.asarray(labels, np.int64).clip(0, 255)], nrow)
    writer.add_image(f"{tag}/image", img_grid, global_step, dataformats="HWC")
    writer.add_image(f"{tag}/prediction", pred_grid, global_step, dataformats="HWC")
    writer.add_image(f"{tag}/label", label_grid, global_step, dataformats="HWC")
