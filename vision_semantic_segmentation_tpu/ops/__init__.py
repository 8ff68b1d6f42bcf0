from .resize import resize_align_corners, resize_area, resize_nearest
from .filters import apply_filter, box_filter_3x3
from .colormap import (
    MAPILLARY_19_PALETTE,
    apply_color_map,
    colors_to_labels,
    load_palette_from_dataset_config,
)
from .warp import remap_bilinear, undistort

__all__ = [
    "resize_align_corners",
    "resize_area",
    "resize_nearest",
    "apply_filter",
    "box_filter_3x3",
    "MAPILLARY_19_PALETTE",
    "apply_color_map",
    "colors_to_labels",
    "load_palette_from_dataset_config",
    "remap_bilinear",
    "undistort",
]
