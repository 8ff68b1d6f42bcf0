"""Device-side image remapping (undistortion).

Replaces the per-frame ``cv2.undistort`` on the camera image
(ref `/root/reference/src/vision_semantic_segmentation_node.py:85-87`):
the inverse distortion map is precomputed once per camera
(`geometry.Camera.undistort_maps`) and applied on device as a bilinear
gather, so raw frames can be undistorted as part of the fused
preprocess+forward jit program instead of on the host.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def remap_bilinear(image: Array, map_xy: Array, fill_value: float = 0.0) -> Array:
    """Sample ``image`` at float coordinates, like ``cv2.remap(INTER_LINEAR)``.

    Args:
        image: (H, W, C) source image.
        map_xy: (2, H_out, W_out) source (x, y) coordinates per output pixel.
        fill_value: value for samples outside the source (cv2 border constant).
    """
    h, w, c = image.shape
    sx = map_xy[0].reshape(-1)
    sy = map_xy[1].reshape(-1)
    out_h, out_w = map_xy.shape[1], map_xy.shape[2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[:, None]
    fy = (sy - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img_f = image.astype(jnp.float32).reshape(-1, c)

    def tap(ix, iy):
        inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        return jnp.where(inside[:, None], img_f[idx], fill_value)

    out = (
        tap(x0i, y0i) * (1 - fx) * (1 - fy)
        + tap(x0i + 1, y0i) * fx * (1 - fy)
        + tap(x0i, y0i + 1) * (1 - fx) * fy
        + tap(x0i + 1, y0i + 1) * fx * fy
    )
    out = out.reshape(out_h, out_w, c)
    if jnp.issubdtype(image.dtype, jnp.integer):
        out = jnp.round(out).astype(image.dtype)
    return out


def undistort(image: Array, undistort_map: Array) -> Array:
    """Undistort a camera frame using a precomputed (2, H, W) inverse map."""
    return remap_bilinear(image, undistort_map)
