from .render import render_bev_map_fused, unpack_rgba_image

__all__ = ["render_bev_map_fused", "unpack_rgba_image"]
