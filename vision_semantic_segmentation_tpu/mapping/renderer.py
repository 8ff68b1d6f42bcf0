"""BEV map rendering, device-side.

Rebuild of `/root/reference/src/renderer.py:19-197`: argmax coloring with
zero-evidence cells black, threshold/priority rendering, priority-based
black-hole filling, border marking, and log-odds -> probability conversion
(the logsumexp path exercised in ref test/test_renderer.py:35-47).
All functions are pure jnp and jit-compatible.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import box_filter_3x3

Array = jnp.ndarray

# Default palette of the 5 mapped classes (ref renderer.py:19-25)
LABEL_COLORS = np.array(
    [
        [128, 64, 128],   # road
        [140, 140, 200],  # crosswalk
        [255, 255, 255],  # lane
        [107, 142, 35],   # vegetation
        [244, 35, 232],   # sidewalk
    ],
    dtype=np.uint8,
)

# Black-hole filling priority, low to high (ref renderer.py:67)
FILL_PRIORITY = (0, 3, 4, 2, 1)


def render_bev_map(grid: Array, label_colors: Array) -> Array:
    """Color each cell by its argmax channel; zero-sum cells stay black.

    (ref renderer.py:32-59)
    """
    label_colors = jnp.asarray(label_colors, dtype=jnp.uint8)
    assert grid.ndim == 3 and grid.shape[2] == label_colors.shape[0]
    winner = jnp.argmax(grid, axis=2)
    colored = label_colors[winner]
    known = jnp.sum(grid, axis=2) != 0
    return jnp.where(known[..., None], colored, jnp.uint8(0))


def render_bev_map_with_thresholds(
    grid: Array,
    label_colors: Array,
    priority: Optional[Sequence[int]] = None,
    thresholds: Sequence[float] = (0.01, 0.01, 0.01, 0.01, 0.01),
) -> Array:
    """Render channels whose normalized share exceeds a threshold.

    Channels are painted in priority order (later = higher priority
    overwrites), restricted to explored cells (ref renderer.py:131-172).
    """
    label_colors = jnp.asarray(label_colors, dtype=jnp.uint8)
    num_channels = grid.shape[2]
    if priority is None:
        priority = list(range(num_channels))
    assert len(priority) == num_channels

    channel_sum = jnp.sum(grid, axis=2, keepdims=True)
    normalized = jnp.where(channel_sum != 0, grid / jnp.where(channel_sum == 0, 1, channel_sum), 0.0)
    known = (channel_sum[..., 0] != 0)

    colored = jnp.zeros((*grid.shape[:2], 3), dtype=jnp.uint8)
    for i, p in enumerate(priority):
        mask = (normalized[..., p] >= thresholds[i]) & known
        colored = jnp.where(mask[..., None], label_colors[p], colored)
    return colored


def fill_black(
    color_map: Array,
    label_colors: Array = LABEL_COLORS,
    priority: Sequence[int] = FILL_PRIORITY,
) -> Array:
    """Fill cells from their 3x3 neighborhood by class priority.

    Device rewrite of ref renderer.py:62-98: for every pixel, each class
    present anywhere in the 3x3 window paints it, in priority order (higher
    priority last).  The reference matches classes via the first color
    channel only and shrinks the output by the 1-px border; we keep the
    full canvas (border pixels see their partial window) and match on full
    RGB, which is equivalent for the shipped palette.
    """
    label_colors = jnp.asarray(label_colors, dtype=jnp.uint8)
    h, w = color_map.shape[0], color_map.shape[1]
    padded = jnp.pad(color_map, ((1, 1), (1, 1), (0, 0)))

    windows = [padded[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
    stacked = jnp.stack(windows)  # (9, H, W, 3)

    out = jnp.zeros_like(color_map)
    for cls in priority:
        color = label_colors[cls]
        present = jnp.any(jnp.all(stacked == color, axis=-1), axis=0)
        out = jnp.where(present[..., None], color, out)
    return out


def fill_black_mode(
    color_map: Array, label_colors: Array = LABEL_COLORS
) -> Array:
    """Fill every cell with the most frequent label in its 3x3 window.

    Vectorized rewrite of the reference's per-pixel loop variant
    (ref renderer.py:108-128 ``fill_black_for_loop``): per class, count
    3x3 occurrences with shifted adds, then argmax the counts (zero-count
    cells stay black).  Ties break toward the lower class index, matching
    ``scipy.stats.mode``.
    """
    label_colors = jnp.asarray(label_colors, dtype=jnp.uint8)
    num_classes = label_colors.shape[0]
    h, w = color_map.shape[0], color_map.shape[1]

    counts = []
    for i in range(num_classes):
        onehot = jnp.all(color_map == label_colors[i], axis=-1).astype(jnp.int32)
        padded = jnp.pad(onehot, ((1, 1), (1, 1)))
        acc = jnp.zeros_like(onehot)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                acc = acc + padded[dy : dy + h, dx : dx + w]
        counts.append(acc)
    counts = jnp.stack(counts, axis=-1)  # (H, W, C)
    # scipy.stats.mode tie-break: the smallest *value* wins, so evaluate
    # classes in ascending first-channel order (argmax takes the first max)
    order = jnp.argsort(label_colors[:, 0])
    winner = order[jnp.argmax(counts[..., order], axis=-1)]
    any_hit = jnp.max(counts, axis=-1) > 0
    out = label_colors[winner]
    return jnp.where(any_hit[..., None], out, jnp.uint8(0))


def resume_color(gray3: Array, label_colors: Array = LABEL_COLORS) -> Array:
    """Restore full RGB from a first-channel-keyed image (ref renderer.py:101-105)."""
    label_colors = jnp.asarray(label_colors, dtype=jnp.uint8)
    out = gray3
    for i in range(label_colors.shape[0]):
        mask = gray3[..., 0] == label_colors[i, 0]
        out = jnp.where(mask[..., None], label_colors[i], out)
    return out


def fill_edge(color_map: Array) -> Array:
    """Mark canvas borders (ref renderer.py:192-196)."""
    color_map = color_map.at[jnp.asarray([0, -1]), :, :].set(250)
    color_map = color_map.at[:, jnp.asarray([0, -1]), :].set(250)
    color_map = color_map.at[0:5, 0:5].set(254)
    return color_map


def log_odds_to_probability(grid: Array) -> Array:
    """Normalize per-cell log evidence to probabilities via logsumexp.

    (ref test/test_renderer.py:35-47)
    """
    return jnp.exp(grid - jax.scipy.special.logsumexp(grid, axis=2, keepdims=True))


def apply_filter(grid: Array) -> Array:
    """3x3 box smoothing of the evidence grid (ref renderer.py:175-189)."""
    return box_filter_3x3(grid)


def map_layer_images(grid: Array, normalize: bool = True) -> Array:
    """Per-class grayscale layer images for map inspection.

    Headless equivalent of the reference's per-layer matplotlib viewer
    (ref test/test_renderer.py:50-84 ``visualize_map_layer``): each class
    channel of the (H, W, C) evidence grid becomes one (H, W) uint8 image.
    ``normalize=True`` converts log evidence to probabilities first (ref
    test_renderer.py:35-47); otherwise layers are min-max scaled.
    """
    grid = jnp.asarray(grid)
    if normalize:
        layers = log_odds_to_probability(grid)
        scaled = layers * 255.0
    else:
        lo = grid.min(axis=(0, 1), keepdims=True)
        hi = grid.max(axis=(0, 1), keepdims=True)
        scaled = (grid - lo) / jnp.maximum(hi - lo, 1e-12) * 255.0
    return jnp.clip(scaled, 0, 255).astype(jnp.uint8).transpose(2, 0, 1)


def add_car_to_map(
    color_map: np.ndarray,
    position_rel: np.ndarray,
    yaw_rel: float,
    resolution: float,
    map_boundary,
    length: float = 4.0,
    width: float = 1.8,
    color=(255, 0, 0),
) -> np.ndarray:
    """Paint the ego-car footprint onto a rendered map (ref mapping.py:490-526).

    The reference ships this visualization helper unwired and flagged
    "not tested, may have bug"; here it is implemented to its evident
    intent and tested.  A ``length`` x ``width`` rectangle centered per
    the reference's car-center convention rotates by ``yaw_rel`` and
    translates by ``position_rel`` (meters, map frame), then paints in
    row=x/col=y grid convention.  Out-of-map cells are clipped (the
    reference would wrap or crash).  Returns the modified map (in place).
    """
    import numpy as np

    from ..geometry.transforms import rotation_2d

    h, w = color_map.shape[:2]
    mask_length = max(int(length / resolution), 1)
    mask_width = max(int(width / resolution), 1)
    car_center = np.array([[length / 4.0], [width / 2.0]]) / resolution

    ix = np.tile(np.arange(mask_length), mask_width)
    iy = np.repeat(np.arange(mask_width), mask_length)
    ixy = np.vstack([ix, iy]).astype(np.float64)

    R = np.asarray(rotation_2d(float(yaw_rel)))
    pos = np.asarray(position_rel, dtype=np.float64).reshape(-1)[:2]
    origin = np.array(
        [[-float(map_boundary[0][0]) / resolution], [0.0]]
    )
    ixy_map = R @ (ixy - car_center) + pos.reshape(2, 1) / resolution + origin
    ixy_map = ixy_map.astype(np.int64)

    ok = (
        (ixy_map[0] >= 0) & (ixy_map[0] < h)
        & (ixy_map[1] >= 0) & (ixy_map[1] < w)
    )
    color_map[ixy_map[0, ok], ixy_map[1, ok]] = np.asarray(color, np.uint8)
    return color_map
