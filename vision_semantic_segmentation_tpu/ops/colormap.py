"""Palette <-> label conversions, device-resident.

The reference tags 3-D points with *RGB colors* gathered from the semantic
image and later matches those colors back to class indices with exact
equality (ref mapping.py:387,414-424), and renders maps by palette lookup
(ref data/utils/mapillary_visualization.py:70-89).  These are the fused,
jit-compatible equivalents.
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def apply_color_map(labels: Array, palette: Array) -> Array:
    """Class-index image (H, W) -> RGB (H, W, 3) via palette gather.

    Equivalent of ``apply_color_map`` (ref mapillary_visualization.py:70-89).
    """
    palette = jnp.asarray(palette, dtype=jnp.uint8)
    return palette[labels]


def colors_to_labels(rgb: Array, palette: Array, fill: int = -1) -> Array:
    """RGB image/point colors -> class indices by exact palette match.

    Args:
        rgb: (..., 3) uint8 colors.
        palette: (C, 3) palette; first exact match wins, else ``fill``.

    Device equivalent of the per-class equality scan in ref
    mapping.py:414-424 (and test/test_semantic_mapping.py:6-18), done in a
    single vectorized pass: compare against all C colors at once.
    """
    palette = jnp.asarray(palette, dtype=rgb.dtype)
    eq = jnp.all(rgb[..., None, :] == palette, axis=-1)  # (..., C)
    idx = jnp.argmax(eq, axis=-1)
    matched = jnp.any(eq, axis=-1)
    return jnp.where(matched, idx, fill).astype(jnp.int32)


def load_palette_from_dataset_config(path: str) -> np.ndarray:
    """Load the (num_classes, 3) palette from a Mapillary-style config.json.

    The reference reads ``labels[i]['color']`` from the dataset config
    (ref mapillary_visualization.py:9-33, config/config_19.json).
    """
    with open(path) as f:
        config = json.load(f)
    return np.array([label["color"] for label in config["labels"]], dtype=np.uint8)


# The 19-class palette shipped with the reference
# (`/root/reference/config/config_19.json` labels[i]['color']), used when no
# dataset config is available at runtime.
MAPILLARY_19_PALETTE = np.array(
    [
        [196, 196, 196],  # 0  Curb
        [140, 140, 200],  # 1  Crosswalk - Plain
        [128, 64, 128],   # 2  Road
        [244, 35, 232],   # 3  Sidewalk
        [70, 70, 70],     # 4  Building
        [220, 20, 60],    # 5  Person
        [255, 0, 0],      # 6  Bicyclist
        [255, 0, 100],    # 7  Motorcyclist
        [255, 255, 255],  # 8  Lane Marking - General
        [70, 130, 180],   # 9  Sky
        [107, 142, 35],   # 10 Vegetation
        [100, 128, 160],  # 11 Manhole
        [153, 153, 153],  # 12 Pole
        [220, 220, 0],    # 13 Traffic Sign (Front)
        [119, 11, 32],    # 14 Bicycle
        [0, 60, 100],     # 15 Bus
        [0, 0, 142],      # 16 Car
        [0, 0, 230],      # 17 Motorcycle
        [0, 0, 70],       # 18 Truck
    ],
    dtype=np.uint8,
)
