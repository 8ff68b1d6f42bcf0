"""Homography estimation + perspective warping, TPU-native.

Replaces the reference's OpenCV pair (`/root/reference/src/homography.py:22-76`,
``cv2.findHomography`` + ``cv2.warpPerspective``) with a normalized DLT
solver (host-side numpy, tiny SVD) and a jit-compatible inverse-map gather
warp that runs on device.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def find_homography(pts_src: np.ndarray, pts_dst: np.ndarray) -> np.ndarray:
    """Estimate the 3x3 homography H with dst ~ H @ src via normalized DLT.

    Least-squares over all correspondences — the behavior of
    ``cv2.findHomography(method=0)`` used by the reference
    (ref homography.py:39).  Host-side numpy (a 9x9 SVD is not TPU work).

    Args:
        pts_src, pts_dst: (N, 2) arrays, N >= 4.
    """
    pts_src = np.asarray(pts_src, dtype=np.float64).reshape(-1, 2)
    pts_dst = np.asarray(pts_dst, dtype=np.float64).reshape(-1, 2)
    n = pts_src.shape[0]
    assert n >= 4, "homography needs at least 4 correspondences"
    assert pts_dst.shape[0] == n

    def normalize(pts):
        mean = pts.mean(axis=0)
        centered = pts - mean
        scale = np.sqrt(2.0) / max(np.mean(np.linalg.norm(centered, axis=1)), 1e-12)
        T = np.array(
            [[scale, 0, -scale * mean[0]], [0, scale, -scale * mean[1]], [0, 0, 1]]
        )
        return (T @ np.vstack([pts.T, np.ones(n)]))[:2].T, T

    src_n, T_src = normalize(pts_src)
    dst_n, T_dst = normalize(pts_dst)

    A = np.zeros((2 * n, 9))
    for i in range(n):
        x, y = src_n[i]
        u, v = dst_n[i]
        A[2 * i] = [-x, -y, -1, 0, 0, 0, u * x, u * y, u]
        A[2 * i + 1] = [0, 0, 0, -x, -y, -1, v * x, v * y, v]

    _, _, VT = np.linalg.svd(A)
    Hn = VT[-1].reshape(3, 3)
    H = np.linalg.inv(T_dst) @ Hn @ T_src
    return H / H[2, 2]


def warp_perspective(
    image: Array,
    H: Array,
    out_size: Tuple[int, int],
    mode: str = "bilinear",
    fill_value: float = 0.0,
) -> Array:
    """Warp ``image`` by homography ``H`` into an (out_h, out_w) canvas.

    Device-side equivalent of ``cv2.warpPerspective`` (ref homography.py:52-55):
    for each output pixel, sample the source at ``H^-1 (x, y, 1)``.

    Args:
        image: (H, W) or (H, W, C) array.
        H: 3x3 homography mapping src pixel -> dst pixel.
        out_size: (width, height) of the output, cv2 argument order.
        mode: 'bilinear' (cv2 default INTER_LINEAR) or 'nearest'.
    """
    out_w, out_h = out_size
    H_inv = jnp.linalg.inv(jnp.asarray(H, dtype=jnp.float32))

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    ones = jnp.ones_like(gx)
    dst = jnp.stack([gx, gy, ones]).reshape(3, -1)
    src = jnp.matmul(H_inv, dst, precision=jax.lax.Precision.HIGHEST)
    sx = src[0] / src[2]
    sy = src[1] / src[2]

    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w, c = image.shape
    img_f = image.astype(jnp.float32)

    if mode == "nearest":
        # cv2 INTER_NEAREST rounds half down via floor(x + 0.5) on the
        # positive domain; outside pixels get the border constant.
        ix = jnp.floor(sx + 0.5).astype(jnp.int32)
        iy = jnp.floor(sy + 0.5).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        flat = img_f.reshape(-1, c)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        vals = flat[idx]
        out = jnp.where(valid[:, None], vals, fill_value)
    elif mode == "bilinear":
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def tap(ix, iy):
            inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
            v = img_f.reshape(-1, c)[idx]
            return jnp.where(inside[:, None], v, fill_value)

        v00 = tap(x0i, y0i)
        v01 = tap(x0i + 1, y0i)
        v10 = tap(x0i, y0i + 1)
        v11 = tap(x0i + 1, y0i + 1)
        fx = fx[:, None]
        fy = fy[:, None]
        out = (
            v00 * (1 - fx) * (1 - fy)
            + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy
            + v11 * fx * fy
        )
    else:
        raise ValueError(f"Unknown mode {mode}")

    out = out.reshape(out_h, out_w, c)
    if jnp.issubdtype(image.dtype, jnp.integer):
        out = jnp.round(out).astype(image.dtype)
    if squeeze:
        out = out[..., 0]
    return out


def generate_homography(
    im_src: Array,
    pts_src: np.ndarray,
    pts_dst: np.ndarray,
    out_size: Optional[Sequence[int]] = None,
    mode: str = "bilinear",
    return_h: bool = False,
):
    """Estimate H from correspondences and warp (ref homography.py:22-76).

    Args:
        out_size: [width, height]; defaults to the source image size.
    """
    H = find_homography(pts_src, pts_dst)
    if out_size is None:
        out_size = (im_src.shape[1], im_src.shape[0])
    im_dst = warp_perspective(jnp.asarray(im_src), H, (out_size[0], out_size[1]), mode=mode)
    return (im_dst, H) if return_h else im_dst
