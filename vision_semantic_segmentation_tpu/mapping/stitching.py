"""Multi-frame / multi-camera grid stitching.

Rebuild of `/root/reference/src/stitching.py:21-100`: compose per-frame
grids (log-odds channels) or colored frames into one canvas via chained
homographies.  Canvas extent is computed host-side from the warped frame
corners; the warps + accumulation run on device.

Modes (ref stitching.py:76-98):
  * log-odds: warped channel grids are summed (additive evidence)
  * color: painter's algorithm — later frames overwrite where non-black
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry.homography import warp_perspective
from .renderer import LABEL_COLORS, render_bev_map

Array = jnp.ndarray


def _canvas_extent(
    im_shape: Tuple[int, int], homography_list: Sequence[np.ndarray]
) -> Tuple[int, int, int, int]:
    """Min/max canvas coordinates covering every chained-warped frame."""
    h, w = im_shape
    corners = np.array(
        [[w, 0, 0, w], [0, 0, h, h], [1, 1, 1, 1]], dtype=np.float64
    )
    min_x, min_y, max_x, max_y = 0.0, 0.0, float(w), float(h)
    x_t = corners.copy()
    for H in list(homography_list)[::-1]:
        x_t = np.asarray(H) @ x_t
        pts = x_t[:2] / x_t[2]
        min_x = min(min_x, pts[0].min())
        min_y = min(min_y, pts[1].min())
        max_x = max(max_x, pts[0].max())
        max_y = max(max_y, pts[1].max())
    return int(min_x), int(min_y), int(max_x), int(max_y)


def stitch_image(
    im_src_list: Sequence[np.ndarray],
    homography_list: Sequence[np.ndarray],
    log_odds_out: bool = True,
    label_colors: np.ndarray = LABEL_COLORS,
) -> Array:
    """Stitch frames into a single canvas (ref stitching.py:40-100).

    Args:
        im_src_list: per-frame (H, W, C) grids (log-odds mode) or maps.
        homography_list: frame-to-next-frame homographies; frame i reaches
            the last frame's coordinates through H_i .. H_{n-2}.
        log_odds_out: accumulate channels additively; otherwise color each
            frame and composite with the painter's algorithm.
    """
    assert len(im_src_list) == len(homography_list)
    im_shape = im_src_list[0].shape[:2]
    min_x, min_y, max_x, max_y = _canvas_extent(im_shape, homography_list)
    out_w, out_h = max_x - min_x, max_y - min_y

    if log_odds_out:
        channels = im_src_list[0].shape[2]
        canvas = jnp.zeros((out_h, out_w, channels), dtype=jnp.float32)
    else:
        canvas = jnp.zeros((out_h, out_w, 3), dtype=jnp.uint8)

    shift = np.eye(3)
    shift[0, 2] = -min_x
    shift[1, 2] = -min_y

    for i in range(len(homography_list) - 1):
        H_chain = np.eye(3)
        for H in homography_list[i:-1]:
            H_chain = np.asarray(H) @ H_chain
        H_total = shift @ H_chain

        if log_odds_out:
            src = jnp.asarray(im_src_list[i], dtype=jnp.float32)
            warped = warp_perspective(src, H_total, (out_w, out_h), mode="bilinear")
            canvas = canvas + warped
        else:
            colored = render_bev_map(
                jnp.asarray(im_src_list[i], dtype=jnp.float32), label_colors
            )
            warped = warp_perspective(colored, H_total, (out_w, out_h), mode="nearest")
            mask = jnp.sum(warped.astype(jnp.int32), axis=2) != 0
            canvas = jnp.where(mask[..., None], warped, canvas)

    return canvas
