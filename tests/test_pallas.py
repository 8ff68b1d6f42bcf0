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


class TestDepthwiseDilated:
    """Pallas dilated depthwise conv vs the shifted-multiply formulation."""

    @pytest.mark.parametrize("dilation", [1, 3, 6])
    def test_matches_shifted_formulation(self, dilation):
        import jax
        from vision_semantic_segmentation_tpu.ops.pallas import depthwise3x3_dilated

        rng = np.random.default_rng(7 + dilation)
        h, w, c = 12, 16, 128
        x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 1, c)), jnp.float32)

        got = depthwise3x3_dilated(x, k, dilation, interpret=True)

        d = dilation
        ref = jax.lax.conv_general_dilated(
            x,
            k.reshape(3, 3, 1, c),
            window_strides=(1, 1),
            padding=((d, d), (d, d)),
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_module_pallas_flag_matches_shifted(self):
        """ShiftedDepthwiseConv(use_pallas=True) == use_pallas=False."""
        import jax
        from vision_semantic_segmentation_tpu.models.layers import ShiftedDepthwiseConv

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((1, 10, 12, 128)), jnp.float32)
        d = 2
        kwargs = dict(
            features=128, kernel_size=(3, 3), strides=(1, 1),
            padding=((d, d), (d, d)), dilation=(d, d), use_bias=True,
        )
        mod_ref = ShiftedDepthwiseConv(use_pallas=False, **kwargs)
        mod_pal = ShiftedDepthwiseConv(use_pallas=True, **kwargs)
        variables = mod_ref.init(jax.random.PRNGKey(0), x)
        out_ref = mod_ref.apply(variables, x)
        out_pal = mod_pal.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(out_pal), np.asarray(out_ref), atol=1e-5
        )


class TestFusedMultiBranchDepthwise:
    """One-HBM-read fused ASPP atrous kernel vs per-branch references
    (VERDICT r02 #4)."""

    def test_matches_xla_grouped_conv_per_branch(self):
        import jax
        from vision_semantic_segmentation_tpu.ops.pallas.depthwise import (
            aspp_depthwise3x3_multi,
        )

        rng = np.random.default_rng(21)
        h, w, c = 20, 28, 256
        dilations = (2, 4, 6)
        x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
        ks = [
            jnp.asarray(rng.standard_normal((3, 3, 1, c)), jnp.float32)
            for _ in dilations
        ]
        outs = aspp_depthwise3x3_multi(x, ks, dilations, interpret=True)
        assert len(outs) == 3
        for o, k, d in zip(outs, ks, dilations):
            ref = jax.lax.conv_general_dilated(
                x, k.reshape(3, 3, 1, c), window_strides=(1, 1),
                padding=((d, d), (d, d)), rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
            np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=1e-5)

    def test_bit_identical_to_single_branch_kernel(self):
        from vision_semantic_segmentation_tpu.ops.pallas.depthwise import (
            aspp_depthwise3x3_multi,
            depthwise3x3_dilated,
        )

        rng = np.random.default_rng(22)
        h, w, c = 14, 18, 128
        dilations = (1, 3, 5)
        x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
        ks = [
            jnp.asarray(rng.standard_normal((3, 3, 1, c)), jnp.float32)
            for _ in dilations
        ]
        outs = aspp_depthwise3x3_multi(x, ks, dilations, interpret=True)
        for o, k, d in zip(outs, ks, dilations):
            ref = depthwise3x3_dilated(x, k, d, interpret=True)
            np.testing.assert_array_equal(np.asarray(o), np.asarray(ref))


class TestEvidenceFoldKernel:
    """Fused grid += E @ obs pass (ops/pallas/fold.py): measured 4.2 ms vs
    XLA's 9.4 ms at 2000^2 on v5e; numerics pinned here."""

    @pytest.mark.parametrize("shape", [(5, 100, 130), (3, 64, 2000)])
    def test_matches_matmul(self, shape):
        from vision_semantic_segmentation_tpu.ops.pallas.fold import (
            evidence_fold_add,
        )

        rng = np.random.default_rng(31)
        c, h, w = shape
        grid = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        obs = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        E = rng.standard_normal((c, c)).astype(np.float32)
        want = np.asarray(grid) + np.einsum("ci,ihw->chw", E, np.asarray(obs))
        got = np.asarray(evidence_fold_add(grid, obs, E, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_engine_update_matches_with_pallas_fold(self, monkeypatch):
        """The full dense update with the Pallas fold == the XLA fold
        (engine.use_pallas_fold pins both paths; interpret mode on CPU)."""
        import functools

        import vision_semantic_segmentation_tpu.ops.pallas.fold as fold_mod
        from test_mapping import make_frame, small_cfg
        from vision_semantic_segmentation_tpu.mapping import (
            SemanticMappingEngine,
            pad_points,
        )

        rng = np.random.default_rng(32)
        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 2048
        pts, img, position, quaternion = make_frame(rng, cfg, n=1500)
        pcd, valid = pad_points(pts, 2048)

        def run(use_pallas):
            engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
            engine.use_pallas_fold = use_pallas
            grid, _, _ = engine.step(
                engine.init_grid(), pcd, valid, img, position, quaternion
            )
            return np.asarray(grid)

        monkeypatch.setattr(
            fold_mod, "evidence_fold_add",
            functools.partial(fold_mod.evidence_fold_add, interpret=True),
        )
        want = run(False)
        got = run(True)
        assert want.sum() > 0
        np.testing.assert_allclose(got, want, atol=1e-4)
