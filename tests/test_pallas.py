"""Pallas kernel tests (interpreter mode on the CPU harness)."""
import numpy as np
import pytest
import jax.numpy as jnp

from vision_semantic_segmentation_tpu.mapping.renderer import (
    LABEL_COLORS,
    apply_filter,
    render_bev_map,
)
from vision_semantic_segmentation_tpu.ops.pallas import (
    render_bev_map_fused,
    unpack_rgba_image,
)


class TestFusedRender:
    @pytest.mark.parametrize("shape", [(64, 128), (100, 200), (130, 257)])
    def test_matches_unfused_path(self, rng, shape):
        h, w = shape
        grid = rng.random((h, w, 5)).astype(np.float32)
        grid[rng.random((h, w)) < 0.3] = 0.0  # unexplored cells

        planar = jnp.asarray(np.moveaxis(grid, -1, 0))
        packed = render_bev_map_fused(planar, LABEL_COLORS, tile_h=32, interpret=True)
        ours = np.asarray(unpack_rgba_image(packed))

        ref = np.asarray(render_bev_map(apply_filter(jnp.asarray(grid)), LABEL_COLORS))
        mismatch = (ours != ref).any(axis=-1).mean()
        # float-order differences in the 3x3 mean can flip near-tie argmaxes
        assert mismatch < 2e-3, f"fused render mismatch {mismatch:.5f}"

    def test_zero_grid_black(self):
        grid = jnp.zeros((5, 32, 64), jnp.float32)
        packed = render_bev_map_fused(grid, LABEL_COLORS, tile_h=16, interpret=True)
        assert np.asarray(packed).sum() == 0

    def test_unpack(self):
        packed = jnp.asarray([[0xFF336699]], dtype=jnp.uint32)
        rgb = np.asarray(unpack_rgba_image(packed))
        np.testing.assert_array_equal(rgb[0, 0], [0x99, 0x66, 0x33])
