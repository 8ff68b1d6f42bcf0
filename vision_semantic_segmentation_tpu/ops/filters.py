"""Small spatial filters for BEV map post-processing.

TPU equivalents of the renderer's OpenCV filtering
(ref `/root/reference/src/renderer.py:175-189` ``apply_filter`` /
``cv2.filter2D`` with a 3x3 box kernel and BORDER_REFLECT_101).
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def box_filter_3x3(x: Array) -> Array:
    """3x3 mean filter with reflect-101 borders on (H, W) or (H, W, C).

    Matches ``cv2.filter2D(src, -1, ones(3,3)/9)`` (ref renderer.py:175-189).
    Written as nine shifted adds so XLA fuses it into a single VPU loop —
    no conv dispatch, no layout change.
    """
    pad_width = [(1, 1), (1, 1)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x.astype(jnp.float32), pad_width, mode="reflect")
    h, w = x.shape[0], x.shape[1]
    acc = jnp.zeros_like(xp[1 : 1 + h, 1 : 1 + w])
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            acc = acc + xp[dy : dy + h, dx : dx + w]
    out = acc / 9.0
    if jnp.issubdtype(x.dtype, jnp.integer):
        out = jnp.round(out)
    return out.astype(x.dtype)


def apply_filter(grid: Array) -> Array:
    """Smooth the (H, W, C) count grid to fill black holes (ref mapping.py:332)."""
    return box_filter_3x3(grid)
