"""Dual-camera, full-route, sp x fp composition end-to-end (VERDICT r02 #10).

Both cameras' frames flow through the COMPOSED sharded-grid +
frame-parallel runner (parallel/grid_shard.py::make_sharded_frame_parallel_run)
into ONE full-route 5000x7000 grid row-sharded over a 2D (data, grid)
mesh, with the windowed update active — then the scene window is rendered
and scored by the evaluator, and the whole sharded result is pinned
against a sequential single-device windowed replay.

Proves, in one test: sp and fp compose (they were only tested separately
before), the dual-camera dataflow feeds one grid (ref launch files +
mapping.py:528-541 run camera1+camera6 into one map), and the full-route
grid shape from README.md:173-177 works sharded on the 8-device CPU mesh.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vision_semantic_segmentation_tpu.evaluation.synthetic_scene import (
    BOUNDARY,
    RES,
    pose as _pose,
    render_frame,
    scene_class,
    write_ground_truth,
)
from vision_semantic_segmentation_tpu.config import get_cfg_defaults
from vision_semantic_segmentation_tpu.geometry.camera import (
    camera_setup_1,
    camera_setup_6,
)
from vision_semantic_segmentation_tpu.mapping import SemanticMappingEngine, pad_points
from vision_semantic_segmentation_tpu.parallel import (
    create_mesh,
    gather_grid,
    init_sharded_grid,
    make_sharded_frame_parallel_run,
)

BUCKET = 2 ** 16


def _fullroute_cfg():
    cfg = get_cfg_defaults()
    cfg.MAPPING.BOUNDARY = [[0, 1000], [0, 1400]]
    cfg.MAPPING.RESOLUTION = 0.2
    cfg.MAPPING.UPDATE_WINDOW = 512
    cfg.MAPPING.POINT_BUCKET = BUCKET
    cfg.MAPPING.PCD.RANGE_MAX = 16.0
    return cfg


def _scene_frames():
    """Perfect semantic frames for both cameras around the golden scene.

    The semantic images carry the MAPPING palette directly (label colors
    for road/crosswalk/lane; off-palette grays for background/sky), so the
    engine's RGB palette-match path consumes them without a network —
    this test is about the mapping composition, not segmentation.
    """
    cfg = get_cfg_defaults()
    # scene class -> mapping palette: road, crosswalk, lane mapped;
    # background and sky to off-palette colors (dropped by the engine)
    colors = np.array(
        [
            [17, 17, 17],
            cfg.LABEL_COLORS[0],
            cfg.LABEL_COLORS[1],
            cfg.LABEL_COLORS[2],
            [40, 40, 40],
        ],
        dtype=np.uint8,
    )
    cams = {"camera1": camera_setup_1(), "camera6": camera_setup_6()}
    frames = {name: [] for name in cams}
    viewpoints = [(110, 810), (130, 830), (120, 820)]
    for name, cam in cams.items():
        for cmx, cmy in viewpoints:
            for k in range(8):
                position, quaternion = _pose(cmx, cmy, yaw=k * np.pi / 4)
                img, _ = render_frame(
                    position, quaternion, scale=4, cam=cam, palette=colors
                )
                frames[name].append((position, quaternion, img))
    return frames


def _point_map():
    """One point per scene grid cell center (as in the golden fixture)."""
    from vision_semantic_segmentation_tpu.evaluation.synthetic_scene import (
        make_point_map,
    )

    return make_point_map()


@pytest.fixture(scope="module")
def scene():
    return _scene_frames(), _point_map()


class TestDualCameraComposedFullRoute:
    def test_sp_fp_composed_matches_sequential_and_scores(self, scene, tmp_path):
        frames_by_cam, pcd = scene
        cfg = _fullroute_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        assert engine.grid_spec.shape[:2] == (5000, 7000)

        devices = jax.devices()
        mesh = create_mesh(
            axis_sizes=(2, 4), axis_names=("data", "grid"), devices=devices
        )

        pcd_pad, valid = pad_points(pcd, BUCKET)
        grid_sh = init_sharded_grid(engine, mesh)

        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P("data"))
        for camera, frames in frames_by_cam.items():
            run = make_sharded_frame_parallel_run(engine, mesh, camera=camera)
            stack = lambda arrs: jax.device_put(np.stack(arrs), data_sharding)
            grid_sh = run(
                grid_sh,
                stack([pcd_pad] * len(frames)),
                stack([valid] * len(frames)),
                stack([f[2] for f in frames]),
                stack([np.asarray(f[0], np.float32) for f in frames]),
                stack([np.asarray(f[1], np.float32) for f in frames]),
            )
        grid_full = np.asarray(gather_grid(grid_sh))

        # ---- sequential single-device windowed reference ----
        grid_seq = engine.init_grid()
        for camera, frames in frames_by_cam.items():
            for position, quaternion, img in frames:
                grid_seq, _, _ = engine.step(
                    grid_seq, pcd_pad, valid, img, position, quaternion,
                    camera=camera,
                )
        grid_seq = np.asarray(grid_seq)
        np.testing.assert_allclose(grid_full, grid_seq, rtol=1e-5, atol=1e-4)

        # ---- render the scene window and score it ----
        r0 = int((BOUNDARY[0][0] - 0) / RES)
        c0 = int((BOUNDARY[1][0] - 0) / RES)
        crop = np.moveaxis(grid_full[:, r0 : r0 + 200, c0 : c0 + 200], 0, -1)
        assert crop.sum() > 0, "no evidence landed in the scene window"

        from vision_semantic_segmentation_tpu.evaluation.map_eval import (
            MapEvaluator,
            convert_labels,
        )
        from vision_semantic_segmentation_tpu.mapping.renderer import (
            apply_filter,
            render_bev_map,
        )

        color_map = np.asarray(
            render_bev_map(
                apply_filter(jnp.asarray(crop)),
                np.array(cfg.LABEL_COLORS, np.uint8),
            )
        )
        gt_dir = tmp_path / "gt"
        gt_dir.mkdir()
        write_ground_truth(str(gt_dir))
        evaluator = MapEvaluator(ground_truth_dir=str(gt_dir))
        generated = convert_labels(color_map)
        truth = evaluator._crop_truth(generated)
        mapped = generated > 0
        # dual-camera coverage from 24 poses per camera is partial by
        # construction; mapped cells must be substantial AND correct
        assert mapped.mean() > 0.4, float(mapped.mean())
        precision = float(np.mean((truth == generated)[mapped]))
        assert precision > 0.9, precision

    def test_camera6_actually_contributes(self, scene):
        """The dual-camera claim needs camera6's wedge to add cells that
        camera1 alone does not observe from the same poses."""
        frames_by_cam, pcd = scene
        cfg = _fullroute_cfg()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        pcd_pad, valid = pad_points(pcd, BUCKET)

        def mapped_cells(camera):
            grid = engine.init_grid()
            position, quaternion, img = frames_by_cam[camera][0]
            grid, _, _ = engine.step(
                grid, pcd_pad, valid, img, position, quaternion, camera=camera
            )
            return np.asarray(grid).sum(axis=0) > 0

        m1 = mapped_cells("camera1")
        m6 = mapped_cells("camera6")
        assert m6.sum() > 0
        only6 = m6 & ~m1
        # measured: first frame m1=3513, m6=2650, camera6-only=1199 cells
        # (the two wedges point differently but overlap ahead-left)
        assert only6.sum() > 500 and only6.sum() > 0.25 * m6.sum(), (
            f"camera6 should observe substantial cells camera1 does not "
            f"(got {only6.sum()} of {m6.sum()})"
        )
