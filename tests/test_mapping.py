"""Mapping engine tests: golden numpy replication of the reference math.

The golden model below independently implements the documented behavior of
ref mapping.py:357-444 in plain numpy — including the fancy-index ``+=``
duplicate-collapse quirk — and the fused TPU engine must match it exactly.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from vision_semantic_segmentation_tpu.config import get_cfg_defaults
from vision_semantic_segmentation_tpu.mapping import (
    ConfusionMatrix,
    GridSpec,
    LABEL_COLORS,
    PCD_ORIGIN_OFFSET,
    SemanticMappingEngine,
    apply_filter,
    fill_black,
    log_odds_to_probability,
    pad_points,
    render_bev_map,
    render_bev_map_with_thresholds,
    stitch_image,
    velodyne_to_baselink,
)
from vision_semantic_segmentation_tpu.geometry import camera_setup_1


def small_cfg():
    cfg = get_cfg_defaults()
    cfg.MAPPING.BOUNDARY = [[100, 140], [800, 840]]  # 400x400 cells at 0.1m
    cfg.MAPPING.POINT_BUCKET = 4096
    return cfg


def quat_to_mat(q):
    from scipy.spatial.transform import Rotation

    T = np.eye(4)
    T[:3, :3] = Rotation.from_quat(q).as_matrix()
    return T


def golden_frame(grid, pcd, image, position, quaternion, cfg, evidence,
                 velodyne_frame=False):
    """Independent numpy model of project_pcd + update_map (ref :357-444)."""
    cam = camera_setup_1()
    pcd_h = np.vstack([pcd[:3], np.ones((1, pcd.shape[1]))])
    if velodyne_frame:
        # points_raw mode: cloud already in the ego frame (ref :372-373)
        pcd_velo = pcd_h
    else:
        T_v2b = velodyne_to_baselink()
        T_b2o = quat_to_mat(quaternion)
        T_b2o[:3, 3] = position
        T_o2v = np.linalg.inv(T_b2o @ T_v2b)
        pcd_velo = T_o2v @ pcd_h
    proj = cam.P @ pcd_velo
    ixy = (proj[:2] / proj[2]).astype(np.int32)

    front = (pcd_velo[0] > 0) & (pcd_velo[0] < cfg.MAPPING.PCD.RANGE_MAX)
    in_img = (ixy[0] >= 0) & (ixy[0] < image.shape[1]) & (ixy[1] >= 0) & (ixy[1] < image.shape[0])
    mask = front & in_img

    masked_pcd = pcd[:, mask]
    label = image[ixy[1, mask], ixy[0, mask]].T  # (3, M)

    boundary = cfg.MAPPING.BOUNDARY
    res = cfg.MAPPING.RESOLUTION
    local = masked_pcd[:2] + PCD_ORIGIN_OFFSET[:2, None]
    px = ((local - np.array([[boundary[0][0]], [boundary[1][0]]])) / res).astype(np.int32)
    h, w = grid.shape[:2]
    on_grid = (px[0] >= 0) & (px[0] < h) & (px[1] >= 0) & (px[1] < w)

    colors = np.array(cfg.LABEL_COLORS)
    for i, name in enumerate(cfg.LABELS_NAMES):
        idx = np.logical_and.reduce(label == colors[i].reshape(3, 1))
        idx_mask = idx & on_grid
        # fancy += : duplicate cells collapse (reference quirk)
        grid[px[0, idx_mask], px[1, idx_mask], :] += evidence[:, i].reshape(1, -1)
        if cfg.MAPPING.PCD.USE_INTENSITY and name == "lane":
            imask = ((masked_pcd[3] < 2) | (masked_pcd[3] > 14)) & idx_mask
            grid[px[0, imask], px[1, imask], i] += 2
    return grid


def make_frame(rng, cfg, n=3000):
    """Synthesize a frame: points in front of camera1 near the vehicle pose."""
# points in the grid region, which spans x [100,140) - offset -> origin x
    x0 = 100 - PCD_ORIGIN_OFFSET[0]
    y0 = 800 - PCD_ORIGIN_OFFSET[1]
    # vehicle just behind the region, facing +x so camera1 sees the points
    position = np.array([x0 - 6.0, y0 + 20.0, 0.0])
    quaternion = np.array([0.0, 0.0, 0.0, 1.0])
    res = cfg.MAPPING.RESOLUTION
    # snap x/y to cell centers: float32 vs float64 truncation at exact cell
    # boundaries would otherwise flip a couple of border cells
    snap = lambda v, lo: lo + (np.floor((v - lo) / res) + 0.5) * res
    pts = np.vstack(
        [
            snap(rng.uniform(x0, x0 + 40, n), x0),
            snap(rng.uniform(y0, y0 + 40, n), y0),
            rng.uniform(-1.0, 0.5, n),
            rng.uniform(0, 20, n),
        ]
    ).astype(np.float32)
    # semantic image: patches of the palette colors + background
    img = np.zeros((1440, 1920, 3), dtype=np.uint8)
    colors = np.array(cfg.LABEL_COLORS, dtype=np.uint8)
    n_colors = len(colors)
    stripe = 1900 // n_colors
    for i in range(n_colors):
        img[:, i * stripe : (i + 1) * stripe] = colors[i]
    img[:100, :] = 17  # some non-palette color
    return pts, img, position, quaternion


class TestEngineGoldenParity:
    @pytest.mark.parametrize("use_intensity", [True, False])
    def test_matches_golden_numpy(self, rng, use_intensity):
        cfg = small_cfg()
        cfg.MAPPING.PCD.USE_INTENSITY = use_intensity
        evidence = np.eye(5)
        engine = SemanticMappingEngine(cfg, evidence=evidence)
        pts, img, position, quaternion = make_frame(rng, cfg)

        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        grid = engine.init_grid()
        grid, cls, vis = engine.step(grid, pcd_pad, valid, img, position, quaternion)

        golden = golden_frame(
            np.zeros(engine.grid_spec.shape), pts.astype(np.float64),
            img, position, quaternion, cfg, evidence,
        )
        ours = SemanticMappingEngine.to_hwc(grid)
        assert ours.sum() > 0, "no points landed on the grid — bad fixture"
        np.testing.assert_allclose(ours, golden, atol=1e-5)

    def test_log_confusion_evidence(self, rng):
        cfg = small_cfg()
        raw = rng.random((19, 19)) + np.eye(19) * 5
        cm = ConfusionMatrix(matrix=raw)
        evidence = cm.get_submatrix(cfg.LABELS, to_probability=True, use_log=True)
        assert evidence.shape == (5, 5)
        # row-stochastic before log
        np.testing.assert_allclose(np.exp(evidence).sum(axis=1), 1.0, atol=1e-9)

        engine = SemanticMappingEngine(cfg, evidence=evidence)
        pts, img, position, quaternion = make_frame(rng, cfg, n=500)
        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        grid, _, _ = engine.step(engine.init_grid(), pcd_pad, valid, img, position, quaternion)
        golden = golden_frame(
            np.zeros(engine.grid_spec.shape), pts.astype(np.float64),
            img, position, quaternion, cfg, evidence,
        )
        np.testing.assert_allclose(SemanticMappingEngine.to_hwc(grid), golden, atol=1e-5)

    def test_multi_frame_determinism(self, rng):
        cfg = small_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        pts, img, position, quaternion = make_frame(rng, cfg, n=2000)
        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        def run():
            g = engine.init_grid()
            for _ in range(3):
                g, _, _ = engine.step(g, pcd_pad, valid, img, position, quaternion)
            return np.asarray(g)

        a, b = run(), run()
        np.testing.assert_array_equal(a, b)

    def test_velodyne_frame_points_golden(self, rng):
        """points_raw mode: the cloud is already in the ego frame (ref :372-373).

        Preserves the reference quirk that grid coordinates still use the
        raw point xy + global offset (ref :404-409) even in ego frame.
        """
        cfg = small_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        # ego-frame points in front of the camera; grid coords come from the
        # same values + offset (quirk), so place them in the grid window too
        n = 800
        res = cfg.MAPPING.RESOLUTION
        x0 = 100 - PCD_ORIGIN_OFFSET[0]
        y0 = 800 - PCD_ORIGIN_OFFSET[1]
        snap = lambda v, lo: lo + (np.floor((v - lo) / res) + 0.5) * res
        pts = np.vstack([
            snap(rng.uniform(5, 40, n), x0),
            snap(rng.uniform(-10, 10, n), y0),
            rng.uniform(-2, 0, n),
            rng.uniform(0, 20, n),
        ]).astype(np.float32)
        img = np.zeros((1440, 1920, 3), np.uint8)
        img[:] = np.asarray(cfg.LABEL_COLORS[2], np.uint8)  # all lane

        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        position = np.zeros(3)
        quaternion = np.array([0, 0, 0, 1.0])
        grid, _, vis = engine.step(
            engine.init_grid(), pcd_pad, valid, img, position, quaternion,
            pcd_frame_id="velodyne",
        )
        golden = golden_frame(
            np.zeros(engine.grid_spec.shape), pts.astype(np.float64),
            img, position, quaternion, cfg, np.eye(5), velodyne_frame=True,
        )
        np.testing.assert_allclose(SemanticMappingEngine.to_hwc(grid), golden, atol=1e-5)


class TestPlanar:
    def test_update_map_planar_runs(self, rng):
        cfg = small_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        img = np.zeros((1440, 1920, 3), dtype=np.uint8)
        img[:] = np.array(cfg.LABEL_COLORS[0], dtype=np.uint8)
        T_local_to_base = np.eye(4)
        grid = engine.update_map_planar(engine.init_grid(), img, T_local_to_base)
        out = SemanticMappingEngine.to_hwc(grid)
        assert out.shape == engine.grid_spec.shape
        assert (out >= 0).all()
        sep = int((8 - cfg.MAPPING.BOUNDARY[0][0]) / cfg.MAPPING.RESOLUTION)
        if sep > 0:
            assert out[:, : min(sep, out.shape[1])].sum() == 0  # near-field masked


class TestRenderer:
    def test_render_bev_map_golden(self):
        grid = np.zeros((3, 3, 5), dtype=np.float32)
        grid[0, 0, 2] = 5  # lane wins
        grid[1, 1, 0] = 1
        grid[1, 1, 4] = 3  # sidewalk wins
        out = np.asarray(render_bev_map(jnp.asarray(grid), LABEL_COLORS))
        np.testing.assert_array_equal(out[0, 0], LABEL_COLORS[2])
        np.testing.assert_array_equal(out[1, 1], LABEL_COLORS[4])
        np.testing.assert_array_equal(out[2, 2], [0, 0, 0])  # empty stays black

    def test_threshold_render(self):
        grid = np.zeros((2, 2, 5), dtype=np.float32)
        grid[0, 0] = [8, 0, 2, 0, 0]  # road 0.8, lane 0.2
        out = np.asarray(
            render_bev_map_with_thresholds(
                jnp.asarray(grid), LABEL_COLORS,
                priority=[3, 4, 0, 2, 1],
                thresholds=[0.1, 0.1, 0.5, 0.2, 0.05],
            )
        )
        # road share 0.8 >= 0.5 paints road; lane 0.2 >= 0.2 paints after
        # (lane priority 2 is painted later than road in priority order)
        np.testing.assert_array_equal(out[0, 0], LABEL_COLORS[2])
        np.testing.assert_array_equal(out[1, 1], [0, 0, 0])  # unexplored

    def test_fill_black(self):
        img = np.zeros((5, 5, 3), dtype=np.uint8)
        img[2, 2] = LABEL_COLORS[1]  # crosswalk (highest fill priority)
        img[2, 3] = LABEL_COLORS[0]  # road
        out = np.asarray(fill_black(jnp.asarray(img)))
        np.testing.assert_array_equal(out[2, 2], LABEL_COLORS[1])
        np.testing.assert_array_equal(out[1, 2], LABEL_COLORS[1])  # dilated
        np.testing.assert_array_equal(out[0, 0], [0, 0, 0])  # out of reach

    def test_log_odds_to_probability(self, rng):
        grid = rng.standard_normal((4, 4, 5)).astype(np.float32)
        prob = np.asarray(log_odds_to_probability(jnp.asarray(grid)))
        np.testing.assert_allclose(prob.sum(axis=2), 1.0, atol=1e-5)
        from scipy.special import logsumexp

        ref = np.exp(grid - logsumexp(grid, axis=2, keepdims=True))
        np.testing.assert_allclose(prob, ref, atol=1e-5)

    def test_apply_filter_preserves_shape(self, rng):
        grid = rng.random((10, 12, 5)).astype(np.float32)
        out = np.asarray(apply_filter(jnp.asarray(grid)))
        assert out.shape == grid.shape


class TestStitching:
    def test_log_odds_accumulation(self, rng):
        frames = [rng.random((20, 30, 5)).astype(np.float32) for _ in range(3)]
        eye = np.eye(3)
        out = np.asarray(stitch_image(frames, [eye, eye, eye], log_odds_out=True))
        # identity homographies: canvas = sum of all but the last frame
        np.testing.assert_allclose(
            out[:20, :30], frames[0] + frames[1], atol=1e-3
        )

    def test_color_painter(self, rng):
        f0 = np.zeros((10, 10, 5), dtype=np.float32)
        f0[:, :, 0] = 1  # road everywhere
        f1 = np.zeros((10, 10, 5), dtype=np.float32)
        f1[:5, :, 2] = 1  # lane top half
        eye = np.eye(3)
        out = np.asarray(stitch_image([f0, f1, f1], [eye, eye, eye], log_odds_out=False))
        np.testing.assert_array_equal(out[7, 3], LABEL_COLORS[0])
        np.testing.assert_array_equal(out[2, 3], LABEL_COLORS[2])


class TestGridSpec:
    def test_from_cfg(self):
        cfg = get_cfg_defaults()
        spec = GridSpec.from_cfg(cfg)
        assert spec.shape == (2000, 2000, 5)
        cfg.MAPPING.BOUNDARY = [[0, 1000], [0, 1400]]
        cfg.MAPPING.RESOLUTION = 0.2
        assert GridSpec.from_cfg(cfg).shape == (5000, 7000, 5)

    def test_pad_points(self, rng):
        pts = rng.random((4, 100)).astype(np.float32)
        padded, valid = pad_points(pts, 256)
        assert padded.shape == (4, 256)
        assert valid.sum() == 100
        np.testing.assert_array_equal(padded[:, :100], pts)


class TestFillBlackMode:
    def test_majority_fill(self):
        from vision_semantic_segmentation_tpu.mapping import fill_black_mode

        img = np.zeros((5, 5, 3), dtype=np.uint8)
        img[1, 1] = LABEL_COLORS[0]
        img[1, 2] = LABEL_COLORS[0]
        img[2, 1] = LABEL_COLORS[2]
        out = np.asarray(fill_black_mode(jnp.asarray(img)))
        # (1,1)'s neighborhood has 2x road, 1x lane -> road wins
        np.testing.assert_array_equal(out[1, 1], LABEL_COLORS[0])
        # far corner has no labels in reach -> stays black
        np.testing.assert_array_equal(out[4, 4], [0, 0, 0])

    def test_matches_scipy_mode(self, rng):
        from scipy.stats import mode as scipy_mode

        from vision_semantic_segmentation_tpu.mapping import fill_black_mode

        cls = rng.integers(-1, 5, (12, 14))
        img = np.zeros((12, 14, 3), np.uint8)
        for i in range(5):
            img[cls == i] = LABEL_COLORS[i]
        out = np.asarray(fill_black_mode(jnp.asarray(img)))
        # check interior pixels against scipy mode of first channel
        first = np.asarray(LABEL_COLORS)[:, 0]
        for y in range(1, 11):
            for x in range(1, 13):
                vals = [
                    img[i, j, 0]
                    for i in range(y - 1, y + 2)
                    for j in range(x - 1, x + 2)
                    if img[i, j, 0] != 0
                ]
                if not vals:
                    assert out[y, x, 0] == 0
                else:
                    m = scipy_mode(vals, keepdims=False).mode
                    assert out[y, x, 0] == m


class TestDualCameraFusion:
    def test_cam1_plus_cam6(self, rng):
        """Dual-camera fusion into one grid (BASELINE.json config 4)."""

        cfg = small_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        pts, img, position, quaternion = make_frame(rng, cfg, n=2000)
        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        grid = engine.init_grid()
        grid, _, vis1 = engine.step(grid, pcd_pad, valid, img, position, quaternion,
                                    camera="camera1")
        sum_after_cam1 = float(np.asarray(grid).sum())
        grid, _, vis6 = engine.step(grid, pcd_pad, valid, img, position, quaternion,
                                    camera="camera6")
        sum_after_cam6 = float(np.asarray(grid).sum())

        assert sum_after_cam1 > 0
        # camera6 faces differently; its contribution differs from camera1's
        assert sum_after_cam6 >= sum_after_cam1
        assert int(np.asarray(vis1).sum()) != int(np.asarray(vis6).sum())

        # per-camera compiled steps are cached independently
        assert ("camera1", False) in engine._step_fns
        assert ("camera6", False) in engine._step_fns


class TestPlanarGolden:
    def test_planar_increments_match_numpy(self, rng):
        """Golden check of the homography planar path (ref :446-488)."""
        import cv2

        cfg = small_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        spec = engine.grid_spec

        img = np.zeros((1440, 1920, 3), np.uint8)
        img[:, :960] = np.asarray(cfg.LABEL_COLORS[0], np.uint8)  # road left half
        img[:, 960:] = np.asarray(cfg.LABEL_COLORS[2], np.uint8)  # lane right half
        T_local_to_base = np.eye(4)

        grid = SemanticMappingEngine.to_hwc(
            engine.update_map_planar(engine.init_grid(), img, T_local_to_base)
        )

        # independent numpy model using cv2 homography/warp
        anchors = engine.anchor_points_2()
        pts_map_h = np.vstack([anchors, np.ones((1, 4))])
        pts_local = engine.discretize_matrix_inv() @ pts_map_h
        pts_local[2, :] = 0.0
        pts_local_h = np.vstack([pts_local, np.ones((1, 4))])
        T_base_to_velodyne = np.linalg.inv(engine.T_velodyne_to_baselink)
        pts_velodyne = T_base_to_velodyne @ pts_local_h
        proj = engine.cameras["camera1"].P @ pts_velodyne
        pts_image = (proj[:2] / proj[2]).T

        H_cv, _ = cv2.findHomography(pts_image, anchors.T)
        warped = cv2.warpPerspective(
            img, H_cv, (spec.width, spec.height), flags=cv2.INTER_NEAREST
        )
        sep = int((8 - spec.boundary[0][0]) / spec.resolution)
        golden = np.zeros(spec.shape, np.float32)
        col_ok = np.zeros((spec.height, spec.width), bool)
        col_ok[:, max(sep, 0):] = True
        colors = np.asarray(cfg.LABEL_COLORS, np.uint8)
        for i in range(5):
            match = (warped[..., 0] == colors[i, 0]) & col_ok
            golden[..., i] += match

        # warp nearest-sampling tie-breaks differ slightly between cv2 and
        # our gather; compare cellwise agreement
        agree = (grid > 0) == (golden > 0)
        assert agree.mean() > 0.99
        np.testing.assert_allclose(grid.sum(), golden.sum(), rtol=0.02)


class TestWindowedUpdate:
    @pytest.mark.parametrize("semantics", ["reference", "accumulate"])
    def test_matches_dense(self, rng, semantics):
        """Pose-centered window update == dense update when the window
        covers every visible point."""
        cfg = small_cfg()
        pts, img, position, quaternion = make_frame(rng, cfg, n=2500)
        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        dense_engine = SemanticMappingEngine(cfg, evidence=np.eye(5),
                                             duplicate_semantics=semantics)
        g_dense, _, _ = dense_engine.step(
            dense_engine.init_grid(), pcd_pad, valid, img, position, quaternion
        )

        cfg_w = small_cfg()
        cfg_w.MAPPING.UPDATE_WINDOW = 200  # < 400-cell grid; points span 40m/0.1m... 
        # points span the full 40m region = 400 cells > 200 window, so use 
        # a tighter fixture: regenerate points within 15m
        x0 = 100 - PCD_ORIGIN_OFFSET[0]
        y0 = 800 - PCD_ORIGIN_OFFSET[1]
        res = cfg.MAPPING.RESOLUTION
        snap = lambda v, lo: lo + (np.floor((v - lo) / res) + 0.5) * res
        pts2 = np.vstack([
            snap(rng.uniform(x0 + 10, x0 + 25, 2500), x0),
            snap(rng.uniform(y0 + 12, y0 + 27, 2500), y0),
            rng.uniform(-1, 0.5, 2500),
            rng.uniform(0, 20, 2500),
        ]).astype(np.float32)
        pcd2, valid2 = pad_points(pts2, cfg.MAPPING.POINT_BUCKET)

        g_dense, _, _ = dense_engine.step(
            dense_engine.init_grid(), pcd2, valid2, img, position, quaternion
        )
        win_engine = SemanticMappingEngine(cfg_w, evidence=np.eye(5),
                                           duplicate_semantics=semantics)
        g_win, _, _ = win_engine.step(
            win_engine.init_grid(), pcd2, valid2, img, position, quaternion
        )
        np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_dense), atol=1e-5)
        assert float(np.asarray(g_dense).sum()) > 0


class TestEngineEdgeCases:
    def test_empty_cloud(self, rng):
        """All-invalid point buckets leave the grid untouched."""
        cfg = small_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        _, img, position, quaternion = make_frame(rng, cfg, n=10)
        pcd = np.zeros((4, cfg.MAPPING.POINT_BUCKET), np.float32)
        valid = np.zeros(cfg.MAPPING.POINT_BUCKET, bool)
        grid, cls, vis = engine.step(engine.init_grid(), pcd, valid, img,
                                     position, quaternion)
        assert float(np.abs(np.asarray(grid)).sum()) == 0.0
        assert not np.asarray(vis).any()

    def test_bucket_truncation(self, rng):
        """Clouds larger than the bucket are truncated, not crashed."""
        cfg = small_cfg()
        pts, img, position, quaternion = make_frame(rng, cfg, n=6000)
        pcd, valid = pad_points(pts, 4096)
        assert pcd.shape == (4, 4096)
        assert valid.all()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        grid, _, _ = engine.step(engine.init_grid(), pcd, valid, img,
                                 position, quaternion)
        assert float(np.asarray(grid).sum()) > 0

    def test_radix_sort_method_matches_bitonic(self, rng):
        """The packed-key fast path with sort_method='radix' is
        bit-identical to the default bitonic sort (values sorts of the
        same keys are equal element-for-element, so the whole update
        must match exactly — incl. the intensity boost carried in the
        packed LSB)."""
        cfg = small_cfg()
        pts, img, position, quaternion = make_frame(rng, cfg, n=2500)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        def run(method):
            engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
            engine.sort_method = method
            grid, _, _ = engine.step(engine.init_grid(), pcd, valid, img,
                                     position, quaternion)
            return np.asarray(grid)

        want = run("bitonic")
        got = run("radix")
        assert want.sum() > 0
        np.testing.assert_array_equal(got, want)

    def test_unknown_sort_method_raises(self, rng):
        cfg = small_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        engine.sort_method = "quantum"
        with pytest.raises(ValueError, match="sort_method"):
            engine._build_dense_update()

    def test_no_lane_in_labels(self, rng):
        """Configs without a 'lane' class skip the intensity boost."""
        cfg = small_cfg()
        cfg.LABELS = [2, 1, 10]
        cfg.LABELS_NAMES = ["road", "crosswalk", "vegetation"]
        cfg.LABEL_COLORS = [[128, 64, 128], [140, 140, 200], [107, 142, 35]]
        engine = SemanticMappingEngine(cfg, evidence=np.eye(3))
        assert engine.lane_channel == -1
        pts, img, position, quaternion = make_frame(rng, cfg, n=500)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        grid, _, _ = engine.step(engine.init_grid(), pcd, valid, img,
                                 position, quaternion)
        assert np.asarray(grid).shape[0] == 3


class TestMapLayerImages:
    """ref test/test_renderer.py:50-84 headless per-layer viewer."""

    def test_probability_layers(self):
        import numpy as np
        import jax.numpy as jnp
        from vision_semantic_segmentation_tpu.mapping import (
            log_odds_to_probability,
            map_layer_images,
        )

        rng = np.random.default_rng(5)
        grid = jnp.asarray(rng.normal(size=(6, 7, 5)).astype(np.float32))
        imgs = map_layer_images(grid)
        assert imgs.shape == (5, 6, 7) and imgs.dtype == jnp.uint8
        probs = np.asarray(log_odds_to_probability(grid))
        np.testing.assert_array_equal(
            np.asarray(imgs),
            np.clip(probs * 255.0, 0, 255).astype(np.uint8).transpose(2, 0, 1),
        )

    def test_minmax_layers(self):
        import numpy as np
        from vision_semantic_segmentation_tpu.mapping import map_layer_images

        grid = np.zeros((4, 4, 3), np.float32)
        grid[..., 1] = np.linspace(0, 1, 16).reshape(4, 4)
        imgs = np.asarray(map_layer_images(grid, normalize=False))
        assert imgs[1].max() == 255 and imgs[1].min() == 0
        assert (imgs[0] == 0).all()  # constant layer -> all zeros


class TestDistortedProjection:
    """Engine ``distorted_image`` mode: the plumb-bob forward model applied
    to projected points instead of resampling the whole frame (the
    reference's cv2.undistort, node:85-87)."""

    def _pointwise_pair(self, cfg, dist):
        import dataclasses as dc

        base = camera_setup_1()
        cam = dc.replace(base, dist=dist)
        engine = SemanticMappingEngine(
            cfg, evidence=np.eye(5), cameras={"camera1": cam}
        )
        std = engine._build_pointwise("camera1", pcd_in_velodyne_frame=False)
        disto = engine._build_pointwise(
            "camera1", pcd_in_velodyne_frame=False, distorted_image=True
        )
        return engine, std, disto

    def test_zero_distortion_equals_pinhole(self, rng):
        cfg = small_cfg()
        engine, std, disto = self._pointwise_pair(cfg, np.zeros(5))
        pts, img, position, quaternion = make_frame(rng, cfg, n=2000)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        out_a = std(jnp.asarray(pcd), jnp.asarray(valid), jnp.asarray(img),
                    jnp.asarray(position, jnp.float32), jnp.asarray(quaternion, jnp.float32))
        out_b = disto(jnp.asarray(pcd), jnp.asarray(valid), jnp.asarray(img),
                      jnp.asarray(position, jnp.float32), jnp.asarray(quaternion, jnp.float32))
        upd_a, upd_b = np.asarray(out_a[3]), np.asarray(out_b[3])
        cls_a, cls_b = np.asarray(out_a[1]), np.asarray(out_b[1])
        # identical math modulo float op order; allow a handful of points
        # whose truncation flips at an exact pixel boundary
        assert np.mean(upd_a == upd_b) > 0.999
        both = upd_a & upd_b
        assert np.mean(cls_a[both] == cls_b[both]) > 0.999

    def test_matches_numpy_golden_distorted_pixels(self, rng):
        """Distorted-pixel label gather vs an independent float64 model."""
        cfg = small_cfg()
        dist = camera_setup_1().dist
        engine, _, disto = self._pointwise_pair(cfg, dist)
        pts, img, position, quaternion = make_frame(rng, cfg, n=2000)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        cell, cls, vis, upd, _ = disto(
            jnp.asarray(pcd), jnp.asarray(valid), jnp.asarray(img),
            jnp.asarray(position, jnp.float32), jnp.asarray(quaternion, jnp.float32),
        )

        # float64 host model
        cam = engine.cameras["camera1"]
        T_b2o = np.eye(4)
        T_b2o[:3, 3] = position
        T_v2b = engine.T_velodyne_to_baselink
        T_o2v = np.linalg.inv(T_b2o @ T_v2b)
        xyz = pts[:3].astype(np.float64)
        velo = T_o2v[:3, :3] @ xyz + T_o2v[:3, 3:4]
        cam_pts = np.hstack([cam.R, cam.t]) @ np.vstack([velo, np.ones((1, velo.shape[1]))])
        xn = cam_pts[0] / cam_pts[2]
        yn = cam_pts[1] / cam_pts[2]
        k1, k2, p1, p2, k3 = dist
        r2 = xn * xn + yn * yn
        radial = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
        yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
        u = cam.K[0, 0] * xd + cam.K[0, 2]
        v = cam.K[1, 1] * yd + cam.K[1, 2]
        # points behind the camera divide by ~0 -> inf/nan pixels; they are
        # masked by `front` below, so cast them to a harmless sentinel
        # instead of tripping numpy's invalid-cast warning
        finite = np.isfinite(u) & np.isfinite(v)
        iu = np.where(finite, u, -1.0).astype(np.int32)
        iv = np.where(finite, v, -1.0).astype(np.int32)
        front = (velo[0] > 0) & (velo[0] < cfg.MAPPING.PCD.RANGE_MAX)
        in_img = (iu >= 0) & (iu < 1920) & (iv >= 0) & (iv < 1440)
        n = pts.shape[1]
        upd_np = np.asarray(upd)[:n]
        vis_np = np.asarray(vis)[:n]
        golden_vis = front & in_img
        assert np.mean(vis_np == golden_vis) > 0.999
        both = vis_np & golden_vis
        colors = np.array(cfg.LABEL_COLORS)
        gathered = img[np.clip(iv, 0, 1439), np.clip(iu, 0, 1919)]
        golden_cls = np.full(n, -1)
        for i in range(len(colors)):
            golden_cls[np.all(gathered == colors[i], axis=-1)] = i
        cls_np = np.asarray(cls)[:n]
        assert np.mean(cls_np[both] == golden_cls[both]) > 0.999

    def test_map_agreement_distorted_vs_rectified(self, rng):
        """Full-frame agreement: mapping from a raw-frame label image
        (distorted mode) vs the rectified image (standard mode)."""
        cfg = small_cfg()
        dist = camera_setup_1().dist
        engine, std, disto = self._pointwise_pair(cfg, dist)
        cam = engine.cameras["camera1"]

        # rectified label image with large blocks
        _, img_u, position, quaternion = make_frame(rng, cfg, n=4)
        # build the raw-frame image consistent with it: the undistort map
        # says rectified pixel u samples raw pixel s(u); scatter L_u there
        smap = np.asarray(cam.undistort_maps())  # (2, H, W) raw coords
        sx = np.clip(np.round(smap[0]).astype(np.int64), 0, 1919)
        sy = np.clip(np.round(smap[1]).astype(np.int64), 0, 1439)
        img_d = img_u.copy()  # mild distortion: identity is a good base
        img_d[sy.ravel(), sx.ravel()] = img_u.reshape(-1, 3)

        pts, _, _, _ = make_frame(rng, cfg, n=3000)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        args_u = (jnp.asarray(pcd), jnp.asarray(valid), jnp.asarray(img_u),
                  jnp.asarray(position, jnp.float32), jnp.asarray(quaternion, jnp.float32))
        args_d = (jnp.asarray(pcd), jnp.asarray(valid), jnp.asarray(img_d),
                  jnp.asarray(position, jnp.float32), jnp.asarray(quaternion, jnp.float32))
        _, cls_u, _, upd_u, _ = std(*args_u)
        _, cls_d, _, upd_d, _ = disto(*args_d)
        upd_u, upd_d = np.asarray(upd_u), np.asarray(upd_d)
        cls_u, cls_d = np.asarray(cls_u), np.asarray(cls_d)
        both = upd_u & upd_d
        assert both.sum() > 500
        # the two paths quantize at different stages; labels must agree for
        # nearly all points (block-interior points are insensitive)
        agree = np.mean(cls_u[both] == cls_d[both])
        assert agree > 0.97, agree


class TestConfidenceWeightedUpdate:
    """Weighted Bayesian evidence (softmax-confidence head extension)."""

    def _setup(self, semantics):
        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 64
        engine = SemanticMappingEngine(
            cfg, evidence=np.eye(5), duplicate_semantics=semantics
        )
        h, w = engine.grid_spec.height, engine.grid_spec.width
        dense = engine._build_dense_update()
        return engine, dense, h, w

    @pytest.mark.parametrize("semantics", ["reference", "accumulate"])
    def test_unit_weights_equal_unweighted(self, rng, semantics):
        engine, dense, h, w = self._setup(semantics)
        n = 64
        cell = jnp.asarray(rng.integers(0, h * w, n), jnp.int32)
        cls = jnp.asarray(rng.integers(0, 5, n), jnp.int32)
        inten = jnp.asarray(rng.uniform(0, 20, n), jnp.float32)
        upd = jnp.asarray(rng.random(n) < 0.8)
        a = dense(engine.init_grid(), cell, cls, inten, upd, h, w)
        b = dense(engine.init_grid(), cell, cls, inten, upd, h, w,
                  weights=jnp.ones(n, jnp.float32))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_dedupe_takes_strongest_confidence(self):
        engine, dense, h, w = self._setup("reference")
        # three points in ONE (cell, class) segment with conf .3/.9/.5
        cell = jnp.asarray([7, 7, 7, 9] + [0] * 60, jnp.int32)
        cls = jnp.asarray([2, 2, 2, 1] + [0] * 60, jnp.int32)
        conf = jnp.asarray([0.3, 0.9, 0.5, 0.6] + [0.0] * 60, jnp.float32)
        upd = jnp.asarray([True] * 4 + [False] * 60)
        inten = jnp.full((64,), 8.0, jnp.float32)
        grid = np.asarray(
            dense(engine.init_grid(), cell, cls, inten, upd, h, w, weights=conf)
        )
        r7, c7 = 7 // w, 7 % w
        r9, c9 = 9 // w, 9 % w
        assert grid[2, r7, c7] == pytest.approx(0.9)   # max, not sum
        assert grid[1, r9, c9] == pytest.approx(0.6)

    @pytest.mark.parametrize("semantics", ["reference", "accumulate"])
    def test_radix_matches_bitonic_on_general_path(self, rng, semantics):
        """Weighted updates take the general argsort path; with
        sort_method='radix' the stable radix permutation must reproduce
        the bitonic result bit-for-bit (stability fixes the within-
        segment order, so even f32 segment sums agree exactly)."""
        n = 64
        cell_np = rng.integers(0, 100, n).astype(np.int32)
        cls_np = rng.integers(0, 5, n).astype(np.int32)
        inten_np = rng.uniform(0, 20, n).astype(np.float32)
        upd_np = rng.random(n) < 0.8
        w_np = rng.uniform(0.1, 1.0, n).astype(np.float32)

        def run(method):
            engine, dense, h, w = self._setup(semantics)
            engine.sort_method = method
            dense = engine._build_dense_update()
            return np.asarray(dense(
                engine.init_grid(), jnp.asarray(cell_np), jnp.asarray(cls_np),
                jnp.asarray(inten_np), jnp.asarray(upd_np), h, w,
                weights=jnp.asarray(w_np),
            ))

        want = run("bitonic")
        got = run("radix")
        assert want.sum() > 0
        np.testing.assert_array_equal(got, want)

    def test_accumulate_sums_confidences(self):
        engine, dense, h, w = self._setup("accumulate")
        cell = jnp.asarray([7, 7, 7] + [0] * 61, jnp.int32)
        cls = jnp.asarray([2, 2, 2] + [0] * 61, jnp.int32)
        conf = jnp.asarray([0.3, 0.9, 0.5] + [0.0] * 61, jnp.float32)
        upd = jnp.asarray([True] * 3 + [False] * 61)
        inten = jnp.full((64,), 8.0, jnp.float32)
        grid = np.asarray(
            dense(engine.init_grid(), cell, cls, inten, upd, h, w, weights=conf)
        )
        r7, c7 = 7 // w, 7 % w
        assert grid[2, r7, c7] == pytest.approx(1.7)


class TestScatterFold:
    """fold_method='scatter': per-cell evidence-vector deltas applied with
    ONE unique-cell scatter instead of densifying a (C, gh*gw) observation
    buffer and matmul-folding it — same update semantics on every path
    (dedupe / accumulate / weighted / windowed), HBM traffic O(points)
    instead of O(cells).  Numerics agree to f32 reassociation of <= C+1
    addends per cell (the matmul and the segmented scan sum a cell's
    observed-class evidence in different orders)."""

    @pytest.mark.parametrize("semantics", ["reference", "accumulate"])
    def test_step_matches_matmul(self, rng, semantics):
        cfg = small_cfg()
        pts, img, position, quaternion = make_frame(rng, cfg, n=2500)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        def run(fold):
            engine = SemanticMappingEngine(cfg, evidence=np.eye(5),
                                           duplicate_semantics=semantics)
            engine.fold_method = fold
            grid, _, _ = engine.step(engine.init_grid(), pcd, valid, img,
                                     position, quaternion)
            return np.asarray(grid)

        want = run("matmul")
        got = run("scatter")
        assert want.sum() > 0
        # np.eye evidence + intensity boost => every delta visible
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("semantics", ["reference", "accumulate"])
    def test_weighted_matches_matmul(self, rng, semantics):
        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 64
        n = 64
        cell_np = rng.integers(0, 100, n).astype(np.int32)
        cls_np = rng.integers(0, 5, n).astype(np.int32)
        inten_np = rng.uniform(0, 20, n).astype(np.float32)
        upd_np = rng.random(n) < 0.8
        w_np = rng.uniform(0.1, 1.0, n).astype(np.float32)

        def run(fold):
            engine = SemanticMappingEngine(cfg, evidence=np.eye(5),
                                           duplicate_semantics=semantics)
            engine.fold_method = fold
            h, w = engine.grid_spec.height, engine.grid_spec.width
            dense = engine._build_dense_update()
            return np.asarray(dense(
                engine.init_grid(), jnp.asarray(cell_np), jnp.asarray(cls_np),
                jnp.asarray(inten_np), jnp.asarray(upd_np), h, w,
                weights=jnp.asarray(w_np),
            ))

        want = run("matmul")
        got = run("scatter")
        assert want.sum() > 0
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_windowed_matches_matmul(self, rng):
        cfg = small_cfg()
        cfg.MAPPING.UPDATE_WINDOW = 200
        x0 = 100 - PCD_ORIGIN_OFFSET[0]
        y0 = 800 - PCD_ORIGIN_OFFSET[1]
        res = cfg.MAPPING.RESOLUTION
        snap = lambda v, lo: lo + (np.floor((v - lo) / res) + 0.5) * res
        pts = np.vstack([
            snap(rng.uniform(x0 + 10, x0 + 25, 2500), x0),
            snap(rng.uniform(y0 + 12, y0 + 27, 2500), y0),
            rng.uniform(-1, 0.5, 2500),
            rng.uniform(0, 20, 2500),
        ]).astype(np.float32)
        _, img, position, quaternion = make_frame(rng, cfg, n=10)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        def run(fold):
            engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
            engine.fold_method = fold
            grid, _, _ = engine.step(engine.init_grid(), pcd, valid, img,
                                     position, quaternion)
            return np.asarray(grid)

        want = run("matmul")
        got = run("scatter")
        assert want.sum() > 0
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_empty_cloud_untouched(self, rng):
        cfg = small_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        engine.fold_method = "scatter"
        _, img, position, quaternion = make_frame(rng, cfg, n=10)
        pcd = np.zeros((4, cfg.MAPPING.POINT_BUCKET), np.float32)
        valid = np.zeros(cfg.MAPPING.POINT_BUCKET, bool)
        grid, _, _ = engine.step(engine.init_grid(), pcd, valid, img,
                                 position, quaternion)
        assert float(np.abs(np.asarray(grid)).sum()) == 0.0

    def test_unknown_fold_method_raises(self):
        engine = SemanticMappingEngine(small_cfg(), evidence=np.eye(5))
        engine.fold_method = "telepathy"
        with pytest.raises(ValueError, match="fold_method"):
            engine._build_dense_update()

    @pytest.mark.parametrize("semantics", ["reference", "accumulate"])
    @pytest.mark.parametrize("weighted", [False, True])
    def test_fuzz_both_folds_vs_numpy(self, semantics, weighted):
        """Duplicates-heavy fuzz: 6 seeds x tiny grid, both fold backends
        vs an independent numpy model of the update semantics (dedupe /
        accumulate x unweighted / weighted, lane boost included)."""
        cfg = small_cfg()
        cfg.MAPPING.BOUNDARY = [[100, 101], [800, 801]]  # 10x10 cells
        cfg.MAPPING.POINT_BUCKET = 64
        E = np.arange(25, dtype=np.float32).reshape(5, 5) / 10.0

        for seed in range(6):
            r = np.random.default_rng(seed)
            n = 64
            cell_np = r.integers(0, 100, n).astype(np.int32)
            cls_np = r.integers(0, 5, n).astype(np.int32)
            inten_np = r.uniform(0, 20, n).astype(np.float32)
            upd_np = r.random(n) < 0.8
            w_np = (r.uniform(0.1, 1.0, n).astype(np.float32)
                    if weighted else None)

            # independent numpy model (ref mapping.py:414-437 semantics)
            engines = {}
            for fold in ("matmul", "scatter"):
                eng = SemanticMappingEngine(
                    cfg, evidence=E, duplicate_semantics=semantics
                )
                eng.fold_method = fold
                engines[fold] = eng
            h, w = engines["matmul"].grid_spec.height, \
                engines["matmul"].grid_spec.width
            lane = engines["matmul"].lane_channel
            obs = {}
            boost = {}
            for i in range(n):
                if not upd_np[i]:
                    continue
                k = (int(cell_np[i]), int(cls_np[i]))
                wgt = 1.0 if w_np is None else float(w_np[i])
                if semantics == "reference":
                    obs[k] = max(obs.get(k, 0.0), wgt) if w_np is not None else 1.0
                else:
                    obs[k] = obs.get(k, 0.0) + wgt
                if cls_np[i] == lane and (inten_np[i] < 2 or inten_np[i] > 14):
                    boost[k[0]] = boost.get(k[0], 0.0) + 1.0
            want = np.zeros((5, h, w), np.float64)
            for (c_idx, k_cls), o in obs.items():
                want[:, c_idx // w, c_idx % w] += E[:, k_cls] * o
            for c_idx, b in boost.items():
                if semantics == "reference":
                    b = min(b, 1.0)
                want[lane, c_idx // w, c_idx % w] += 2.0 * b

            for fold, eng in engines.items():
                dense = eng._build_dense_update()
                got = np.asarray(dense(
                    eng.init_grid(), jnp.asarray(cell_np), jnp.asarray(cls_np),
                    jnp.asarray(inten_np), jnp.asarray(upd_np), h, w,
                    weights=None if w_np is None else jnp.asarray(w_np),
                ))
                np.testing.assert_allclose(
                    got, want, atol=1e-5,
                    err_msg=f"fold={fold} seed={seed}",
                )

    def test_backends_configurable(self, rng):
        """MAPPING.SORT_METHOD / MAPPING.FOLD_METHOD reach the engine."""
        cfg = small_cfg()
        cfg.MAPPING.SORT_METHOD = "radix"
        cfg.MAPPING.FOLD_METHOD = "scatter"
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        assert engine.sort_method == "radix"
        assert engine.fold_method == "scatter"
        # and the combination actually runs + matches the defaults
        pts, img, position, quaternion = make_frame(rng, cfg, n=800)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        got, _, _ = engine.step(engine.init_grid(), pcd, valid, img,
                                position, quaternion)
        base = SemanticMappingEngine(small_cfg(), evidence=np.eye(5))
        want, _, _ = base.step(base.init_grid(), pcd, valid, img,
                               position, quaternion)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_scatter_rejects_pallas_fold(self):
        engine = SemanticMappingEngine(small_cfg(), evidence=np.eye(5))
        engine.fold_method = "scatter"
        engine.use_pallas_fold = True
        with pytest.raises(ValueError, match="scatter"):
            engine._build_dense_update()


class TestCarOverlayAndPoseNormal:
    """The reference's unwired diagnostic helpers, implemented + tested
    (ref mapping.py:490-526 'not tested, may have bug';
    ref utils_ros.py:113-123)."""

    def test_add_car_to_map_paints_footprint(self):
        from vision_semantic_segmentation_tpu.mapping.renderer import add_car_to_map

        color_map = np.zeros((200, 200, 3), np.uint8)
        out = add_car_to_map(
            color_map, position_rel=np.array([10.0, 10.0]), yaw_rel=0.0,
            resolution=0.1, map_boundary=[[0, 20], [0, 20]],
        )
        painted = (out == [255, 0, 0]).all(axis=-1)
        # 4.0 x 1.8 m at 0.1 m -> 40 x 18 cells
        assert painted.sum() == 40 * 18
        rows = np.where(painted.any(axis=1))[0]
        cols = np.where(painted.any(axis=0))[0]
        assert rows.max() - rows.min() + 1 == 40
        assert cols.max() - cols.min() + 1 == 18

    def test_add_car_clips_out_of_map(self):
        from vision_semantic_segmentation_tpu.mapping.renderer import add_car_to_map

        color_map = np.zeros((50, 50, 3), np.uint8)
        out = add_car_to_map(
            color_map, position_rel=np.array([0.2, 0.2]), yaw_rel=0.7,
            resolution=0.1, map_boundary=[[0, 5], [0, 5]],
        )
        assert (out == [255, 0, 0]).all(axis=-1).sum() > 0  # partial, no crash

    def test_get_normal_from_pose(self):
        from vision_semantic_segmentation_tpu.utils.ros_compat import (
            get_normal_from_pose,
        )

        # identity orientation: normal = +z
        n = get_normal_from_pose(None, np.array([0.0, 0.0, 0.0, 1.0]))
        np.testing.assert_allclose(n, [[0], [0], [1]], atol=1e-6)
        # 90 deg about x: z axis maps to -y
        q = np.array([np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4)])
        n = get_normal_from_pose(None, q)
        np.testing.assert_allclose(n, [[0], [-1], [0]], atol=1e-6)

    def test_bounding_box_to_ray(self):
        from vision_semantic_segmentation_tpu.geometry.bounding_box import BoundingBox
        from vision_semantic_segmentation_tpu.geometry.camera import camera_setup_1

        cam = camera_setup_1()
        bbox = BoundingBox(left=900, top=700, width=100, height=100)
        d, C = cam.bounding_box_to_ray(bbox)
        # same as casting the bottom-center pixel directly
        import jax.numpy as jnp

        d2, C2 = cam.pixel_to_ray(jnp.asarray([[950.0], [800.0]]))
        np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(C), np.asarray(C2), atol=1e-6)
