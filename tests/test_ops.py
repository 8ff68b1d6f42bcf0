"""Ops tests: exact-semantics checks against torch (CPU) and cv2."""
import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from vision_semantic_segmentation_tpu.ops import (
    MAPILLARY_19_PALETTE,
    apply_color_map,
    box_filter_3x3,
    colors_to_labels,
    remap_bilinear,
    resize_align_corners,
    resize_area,
    resize_nearest,
)


class TestResizeAlignCorners:
    @pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (20, 30)), ((33, 17), (8, 5)), ((5, 5), (5, 5)), ((2, 2), (1, 3))])
    def test_matches_torch(self, rng, in_hw, out_hw):
        import torch
        import torch.nn.functional as F

        x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
        ours = np.asarray(resize_align_corners(jnp.asarray(x), out_hw))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        # fp32 interpolation-weight rounding differs slightly from torch's
        # double-precision source-index computation
        np.testing.assert_allclose(ours, ref, atol=5e-5)

    def test_gradient_flows(self, rng):
        import jax

        x = jnp.asarray(rng.standard_normal((4, 6, 2)).astype(np.float32))
        g = jax.grad(lambda v: jnp.sum(resize_align_corners(v, (8, 12)) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestResizeArea:
    @pytest.mark.parametrize("scale", [0.5, 0.25, 0.3])
    def test_matches_cv2(self, rng, scale):
        img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        out_hw = (int(64 * scale), int(96 * scale))
        ours = np.asarray(resize_area(jnp.asarray(img), out_hw))
        ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_integer_factor_is_average_pool(self, rng):
        x = rng.random((8, 8, 1)).astype(np.float32)
        ours = np.asarray(resize_area(jnp.asarray(x), (4, 4)))
        ref = x.reshape(4, 2, 4, 2, 1).mean(axis=(1, 3))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestResizeNearest:
    def test_matches_cv2_upscale(self, rng):
        img = (rng.random((30, 40)) * 18).astype(np.uint8)
        ours = np.asarray(resize_nearest(jnp.asarray(img), (120, 160)))
        ref = cv2.resize(img, (160, 120), interpolation=cv2.INTER_NEAREST)
        assert (ours == ref).mean() > 0.99  # border tie-breaks may differ

    def test_labels_preserved(self, rng):
        img = (rng.random((10, 10)) * 18).astype(np.int32)
        out = np.asarray(resize_nearest(jnp.asarray(img), (37, 23)))
        assert set(np.unique(out)) <= set(np.unique(img))


class TestBoxFilter:
    def test_matches_cv2(self, rng):
        x = rng.random((20, 25, 5)).astype(np.float32)
        kernel = np.ones((3, 3), np.float32) / 9.0
        ref = cv2.filter2D(x, -1, kernel)
        ours = np.asarray(box_filter_3x3(jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestColormap:
    def test_roundtrip(self, rng):
        labels = (rng.random((12, 17)) * 19).astype(np.int32)
        rgb = np.asarray(apply_color_map(jnp.asarray(labels), jnp.asarray(MAPILLARY_19_PALETTE)))
        back = np.asarray(colors_to_labels(jnp.asarray(rgb), jnp.asarray(MAPILLARY_19_PALETTE)))
        np.testing.assert_array_equal(back, labels)

    def test_unknown_color_fill(self):
        rgb = jnp.asarray(np.full((2, 2, 3), 7, dtype=np.uint8))
        out = np.asarray(colors_to_labels(rgb, jnp.asarray(MAPILLARY_19_PALETTE), fill=-1))
        assert (out == -1).all()

    def test_palette_matches_reference_config(self):
        import json

        with open("/root/reference/config/config_19.json") as f:
            config = json.load(f)
        colors = np.array([l["color"] for l in config["labels"]], dtype=np.uint8)
        np.testing.assert_array_equal(MAPILLARY_19_PALETTE, colors)


class TestRemap:
    def test_identity(self, rng):
        img = rng.random((10, 12, 3)).astype(np.float32)
        xs, ys = np.meshgrid(np.arange(12, dtype=np.float32), np.arange(10, dtype=np.float32))
        out = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(np.stack([xs, ys]))))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_matches_cv2(self, rng):
        img = (rng.random((32, 48, 3)) * 255).astype(np.float32)
        xs, ys = np.meshgrid(np.arange(48, dtype=np.float32), np.arange(32, dtype=np.float32))
        map_x = xs + 0.7 + 0.01 * ys
        map_y = ys * 0.95 + 0.3
        ref = cv2.remap(img, map_x.astype(np.float32), map_y.astype(np.float32), cv2.INTER_LINEAR)
        ours = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(np.stack([map_x, map_y]))))
        diff = np.abs(ours[1:-1, 1:-1] - ref[1:-1, 1:-1])
        assert np.percentile(diff, 99) < 1.0


class TestRadixSort:
    """LSD radix sort (ops/sort.py) — the opt-in alternative to XLA's
    bitonic jnp.sort in the grid update's packed-key fast path."""

    @pytest.mark.parametrize("key_bits,digit_bits", [(26, 4), (24, 8), (10, 4), (17, 2)])
    def test_matches_np_sort(self, rng, key_bits, digit_bits):
        from vision_semantic_segmentation_tpu.ops.sort import radix_sort

        keys = rng.integers(0, 1 << key_bits, 4096).astype(np.int32)
        got = np.asarray(radix_sort(jnp.asarray(keys), key_bits, digit_bits))
        np.testing.assert_array_equal(got, np.sort(keys))

    def test_sentinel_heavy(self, rng):
        """The engine's real distribution: most slots hold the max packed
        sentinel (invalid points), valid keys cluster in a small range."""
        from vision_semantic_segmentation_tpu.ops.sort import radix_sort

        sentinel = 2000 * 2000 * 5 * 2
        keys = np.full(8192, sentinel, np.int32)
        n_valid = 900
        keys[rng.permutation(8192)[:n_valid]] = rng.integers(
            0, 500 * 5 * 2, n_valid
        ).astype(np.int32)
        got = np.asarray(radix_sort(jnp.asarray(keys), sentinel.bit_length()))
        np.testing.assert_array_equal(got, np.sort(keys))

    def test_all_equal_and_presorted(self):
        from vision_semantic_segmentation_tpu.ops.sort import radix_sort

        same = np.full(512, 77, np.int32)
        np.testing.assert_array_equal(np.asarray(radix_sort(jnp.asarray(same), 8)), same)
        asc = np.arange(512, dtype=np.int32)
        np.testing.assert_array_equal(np.asarray(radix_sort(jnp.asarray(asc), 10)), asc)

    def test_validation(self):
        from vision_semantic_segmentation_tpu.ops.sort import radix_sort

        with pytest.raises(ValueError):
            radix_sort(jnp.zeros((4, 4), jnp.int32), 8)
        with pytest.raises(ValueError):
            radix_sort(jnp.zeros((4,), jnp.int32), 8, digit_bits=0)

    def test_with_perm_matches_stable_argsort(self, rng):
        """Permutation output must equal jnp.argsort exactly, duplicates
        included: both sorts are stable, so ties break by position."""
        from vision_semantic_segmentation_tpu.ops.sort import radix_sort_with_perm

        keys = rng.integers(0, 50, 4096).astype(np.int32)  # heavy duplicates
        ksort, perm = radix_sort_with_perm(jnp.asarray(keys), 6)
        np.testing.assert_array_equal(np.asarray(perm), np.argsort(keys, kind="stable"))
        np.testing.assert_array_equal(np.asarray(ksort), np.sort(keys))
