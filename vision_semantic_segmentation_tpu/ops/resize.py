"""Image resizing with exact reference semantics, MXU-friendly.

The reference pipeline leans on three resize flavors whose pixel grids all
differ:

  * ``F.interpolate(..., mode='bilinear', align_corners=True)`` inside the
    network (ref models/deeplab_v3_plus.py:69, aspp.py:88, decoder.py:47)
  * ``cv2.resize(..., INTER_AREA)`` for camera-image downscale
    (ref vision_semantic_segmentation_node.py:92-96)
  * ``cv2.resize(..., INTER_NEAREST)`` for label upsample (ref node:109)

Rather than gather-based sampling, every mode here is expressed as two
separable 1-D interpolation matrices applied by matmul — this rides the
MXU, fuses with neighboring ops, and is bit-reproducible.  Matrices are
built with numpy at trace time (shapes are static under jit) and folded
into the compiled program as constants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@functools.lru_cache(maxsize=256)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bilinear interpolation matrix with align_corners=True.

    Grid: src = i * (in-1)/(out-1); torch's align_corners semantics.
    """
    M = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        M[0, 0] = 1.0
        return M
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    M[np.arange(out_size), lo] += 1.0 - frac
    M[np.arange(out_size), hi] += frac
    return M


@functools.lru_cache(maxsize=256)
def _area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) averaging matrix reproducing cv2 INTER_AREA downscale.

    Output cell i integrates the source interval [i*s, (i+1)*s), s = in/out,
    with fractional end pixels weighted by their overlap.
    """
    M = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for i in range(out_size):
        left = i * scale
        right = (i + 1) * scale
        j0 = int(np.floor(left))
        j1 = int(np.ceil(right))
        for j in range(j0, min(j1, in_size)):
            overlap = min(right, j + 1) - max(left, j)
            if overlap > 0:
                M[i, j] = overlap
        M[i] /= M[i].sum()
    return M.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) one-hot matrix reproducing cv2/torch 'nearest' resize.

    cv2 INTER_NEAREST picks src = floor(i * in/out) (no center alignment).
    """
    M = np.zeros((out_size, in_size), dtype=np.float32)
    src = np.minimum((np.arange(out_size) * in_size / out_size).astype(np.int64), in_size - 1)
    M[np.arange(out_size), src] = 1.0
    return M


def _separable_resize(x: Array, mh: np.ndarray, mw: np.ndarray) -> Array:
    """Apply 1-D resize matrices along the H and W axes of (..., H, W, C)."""
    Mh = jnp.asarray(mh)
    Mw = jnp.asarray(mw)
    # (..., H, W, C): contract H then W at fp32-exact precision
    x = jnp.einsum("oh,...hwc->...owc", Mh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,...hwc->...hoc", Mw, x, precision=jax.lax.Precision.HIGHEST)
    return x


def resize_align_corners(x: Array, out_hw: tuple[int, int]) -> Array:
    """Bilinear resize with align_corners=True on (..., H, W, C) tensors.

    Exact equivalent of ``F.interpolate(mode='bilinear', align_corners=True)``
    (ref deeplab_v3_plus.py:69) in NHWC layout.
    """
    out_h, out_w = out_hw
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    y = _separable_resize(
        x.astype(jnp.float32), _align_corners_matrix(in_h, out_h), _align_corners_matrix(in_w, out_w)
    )
    return y.astype(dtype)


def resize_area(x: Array, out_hw: tuple[int, int]) -> Array:
    """cv2 INTER_AREA downscale on (..., H, W, C) tensors (ref node:92-96)."""
    out_h, out_w = out_hw
    in_h, in_w = x.shape[-3], x.shape[-2]
    assert out_h <= in_h and out_w <= in_w, "INTER_AREA path is for downscaling"
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    y = _separable_resize(x.astype(jnp.float32), _area_matrix(in_h, out_h), _area_matrix(in_w, out_w))
    if jnp.issubdtype(dtype, jnp.integer):
        # cv2 rounds to nearest when storing back to integer images
        y = jnp.round(y)
    return y.astype(dtype)


def resize_nearest(x: Array, out_hw: tuple[int, int]) -> Array:
    """cv2 INTER_NEAREST resize on (..., H, W) or (..., H, W, C) (ref node:109).

    Implemented as a gather (no arithmetic on values, so label images
    survive exactly).
    """
    out_h, out_w = out_hw
    chan = x.ndim >= 3
    in_h = x.shape[-3] if chan else x.shape[-2]
    in_w = x.shape[-2] if chan else x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    src_r = jnp.minimum((jnp.arange(out_h) * in_h // out_h), in_h - 1)
    src_c = jnp.minimum((jnp.arange(out_w) * in_w // out_w), in_w - 1)
    if chan:
        return x[..., src_r[:, None], src_c[None, :], :]
    return x[..., src_r[:, None], src_c[None, :]]
