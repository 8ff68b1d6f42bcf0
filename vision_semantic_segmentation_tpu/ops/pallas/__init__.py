from .depthwise import depthwise3x3_dilated
from .render import render_bev_map_fused, unpack_rgba_image

__all__ = ["depthwise3x3_dilated", "render_bev_map_fused", "unpack_rgba_image"]
