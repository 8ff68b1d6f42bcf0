"""Convex-hull extraction from a class mask.

Rebuild of `/root/reference/src/semantic_convex_hull.py:17-91` without the
skimage dependency (absent in this image): binarize the target class, 3x3
erode, 8-connected component labeling (scipy.ndimage), keep the
``top_number`` largest components above ``area_threshold``, and return the
closed convex hull vertex loops.  This is a host-side diagnostic path (the
node publishes hull markers, ref vision_semantic_segmentation_node.py:138).
"""
from __future__ import annotations

from collections import Counter
from typing import List

import numpy as np


def generate_convex_hull(
    img_src: np.ndarray,
    index_care_about: int = 1,
    top_number: int = 1,
    area_threshold: int = 30,
) -> List[np.ndarray]:
    """Extract convex hulls of the largest blobs of one class.

    Args:
        img_src: (H, W) integer label image.
        index_care_about: class id to extract (must be nonzero, ref :33-35).
        top_number: how many largest components to keep.
        area_threshold: minimum component area in pixels.

    Returns:
        List of (2, K) closed vertex loops in (x, y) image coordinates
        (first vertex repeated at the end, ref :74-76).
    """
    import cv2
    from scipy import ndimage

    if index_care_about == 0:
        raise ValueError("index_care_about cannot be zero")

    binary = (np.asarray(img_src) == index_care_about).astype(np.uint8)
    kernel = np.ones((3, 3), np.uint8)
    eroded = cv2.erode(binary, kernel, iterations=1)

    # 8-connected labeling (the reference's skimage connectivity=ndim)
    labeled, num = ndimage.label(eroded, structure=np.ones((3, 3)))
    if num == 0:
        return []

    counts = Counter(labeled[labeled != 0].ravel()).most_common(top_number)
    selected = [idx for idx, cnt in counts if cnt > area_threshold]

    vertices: List[np.ndarray] = []
    for select_index in selected:
        ij = np.argwhere(labeled == select_index)  # (N, 2) row, col
        pts_xy = np.fliplr(ij).astype(np.int32)  # (N, 2) x, y
        hull = cv2.convexHull(pts_xy)  # (K, 1, 2)
        loop = np.concatenate([hull[:, 0, :], hull[0, 0, :][None]], axis=0).T
        vertices.append(loop)
    return vertices
