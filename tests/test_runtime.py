"""Runtime tests: bus sync semantics, frame IO, replay, node pipeline E2E."""
import numpy as np
import jax
import pytest

from vision_semantic_segmentation_tpu.config import get_cfg_defaults
from vision_semantic_segmentation_tpu.mapping import SemanticMappingEngine
from vision_semantic_segmentation_tpu.runtime.bus import TopicBus, nearest_stamp_index
from vision_semantic_segmentation_tpu.runtime.io import FrameRecord, load_frames, save_frames
from vision_semantic_segmentation_tpu.runtime.node import MappingNode, SegmentationNode
from vision_semantic_segmentation_tpu.runtime.replay import MappingReplay


def small_cfg(tmp_path=None):
    cfg = get_cfg_defaults()
    cfg.MAPPING.BOUNDARY = [[100, 140], [800, 840]]
    cfg.MAPPING.POINT_BUCKET = 4096
    if tmp_path is not None:
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.MAPPING.INPUT_DIR = str(tmp_path / "inputs")
    return cfg


class TestBusSync:
    def test_pub_sub(self):
        bus = TopicBus()
        got = []
        bus.subscribe("/topic", lambda m: got.append(m))
        bus.publish("/topic", 42, stamp=1.5, frame_id="camera1")
        assert got[0].data == 42 and got[0].stamp == 1.5

    def test_nearest_stamp_selection(self):
        """Reference selection rule (ref mapping.py:185-219)."""
        stamps = [1.0, 2.0, 3.0, 10.0]
        assert nearest_stamp_index(stamps, 2.4) == 1   # closer to 2.0
        assert nearest_stamp_index(stamps, 2.6) == 2   # closer to 3.0
        assert nearest_stamp_index(stamps, 2.5) == 1   # tie -> earlier
        assert nearest_stamp_index(stamps, 99.0) == 3  # all below target -> last
        assert nearest_stamp_index(stamps, 0.5) == 3   # all above -> falls to last

    def test_single_element(self):
        assert nearest_stamp_index([5.0], 1.0) == 0

    def test_sync_deep_queue_returns_nearest(self):
        """Selection happens BEFORE trimming (ref mapping.py:204-216).

        Regression: indexing the trimmed queue with the pre-trim nearest
        index returned a message ~2x deeper than the nearest whenever the
        queue ran more than two entries ahead of the target stamp.
        """
        from vision_semantic_segmentation_tpu.runtime.bus import Message

        queue = [
            Message(data=i, stamp=float(i), frame_id="") for i in range(21)
        ]
        msg = MappingNode._sync(None, queue, 12.3)
        assert msg.stamp == 12.0
        # trimmed to the bracket start; the nearest stays at the front
        assert queue[0].stamp == 11.0
        msg = MappingNode._sync(None, queue, 18.9)
        assert msg.stamp == 19.0
        # all-below-target falls through to the newest entry (ref :213-216)
        msg = MappingNode._sync(None, queue, 99.0)
        assert msg.stamp == 20.0
        assert queue[0].stamp == 19.0 and queue[-1].stamp == 20.0


class TestFrameIO:
    def test_npz_roundtrip(self, rng, tmp_path):
        frames = [
            FrameRecord(
                pcd=rng.random((4, 50)).astype(np.float32),
                pcd_frame_id="world",
                semantic_image=(rng.random((10, 12, 3)) * 255).astype(np.uint8),
                position=rng.random(3),
                quaternion=np.array([0, 0, 0, 1.0]),
                camera="camera6",
                stamp=1.25,
            )
            for _ in range(3)
        ]
        path = str(tmp_path / "seq.npz")
        save_frames(frames, path)
        loaded = load_frames(path)
        assert len(loaded) == 3
        np.testing.assert_array_equal(loaded[0].pcd, frames[0].pcd)
        np.testing.assert_array_equal(loaded[1].semantic_image, frames[1].semantic_image)
        assert loaded[2].camera == "camera6"
        assert loaded[2].pcd_frame_id == "world"
        assert loaded[2].stamp == 1.25
        # schema is exactly the per-frame keys + num_frames + meta — no
        # stray entries (a savez kwarg typo once stored an 'allow_pickle'
        # scalar array in every archive)
        with np.load(path, allow_pickle=True) as z:
            want = {"num_frames", "meta"} | {
                f"{k}_{i}" for i in range(3)
                for k in ("pcd", "image", "position", "quaternion")
            }
            assert set(z.files) == want

    def test_reference_dict_pose_dump_loads(self, rng, tmp_path):
        import pickle

        input_list = [
            {
                "pcd": rng.random((4, 10)),
                "pcd_frame_id": "world",
                "semantic_image": np.zeros((4, 4, 3), np.uint8),
                "pose": {
                    "position": {"x": 1.0, "y": 2.0, "z": 3.0},
                    "orientation": {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0},
                },
            }
        ]
        path = str(tmp_path / "input_list.pkl")
        with open(path, "wb") as f:
            pickle.dump(input_list, f)
        from vision_semantic_segmentation_tpu.runtime.io import load_reference_dump

        frames = load_reference_dump(path)
        np.testing.assert_array_equal(frames[0].position, [1, 2, 3])
        np.testing.assert_array_equal(frames[0].quaternion, [0, 0, 0, 1])


def _make_sequence(rng, cfg, n_frames=3, n_pts=1500):
    from test_mapping import make_frame

    frames = []
    for i in range(n_frames):
        pts, img, position, quaternion = make_frame(rng, cfg, n=n_pts)
        frames.append(
            FrameRecord(
                pcd=pts, pcd_frame_id="world", semantic_image=img,
                position=position, quaternion=quaternion, stamp=float(i),
            )
        )
    return frames


class TestReplay:
    def test_replay_file_produces_map(self, rng, tmp_path):
        cfg = small_cfg(tmp_path)
        frames = _make_sequence(rng, cfg)
        (tmp_path / "inputs").mkdir()
        seq = str(tmp_path / "inputs" / "input_list_0.npz")
        save_frames(frames, seq)

        replay = MappingReplay(cfg, engine=SemanticMappingEngine(cfg, evidence=np.eye(5)))
        maps = replay.replay_dir()
        assert len(maps) == 1
        color_map = maps[0]
        assert color_map.shape == (400, 400, 3)
        assert color_map.sum() > 0  # something was mapped
        import os

        assert any(
            f.startswith("global_map") for f in os.listdir(replay.output_dir)
        )

    def test_replay_deterministic(self, rng, tmp_path):
        cfg = small_cfg(tmp_path)
        frames = _make_sequence(rng, cfg)
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        replay = MappingReplay(cfg, engine=engine)
        a = np.asarray(replay.run_frames(frames))
        b = np.asarray(replay.run_frames(frames))
        np.testing.assert_array_equal(a, b)

    def test_multi_chunk_replay_traces_once_per_shape(self, rng, tmp_path):
        """Runner caching (VERDICT r02 #6): a chunked replay must reuse ONE
        jitted wrapper per (camera, cloud frame), tracing once per distinct
        window shape — not once per chunk.  Counted with a side effect in
        the traced step."""
        import jax

        cfg = small_cfg(tmp_path)
        # 10 frames at window 4 -> chunks of 4, 4, 2: two distinct stack
        # shapes, three dispatches
        frames = _make_sequence(rng, cfg, n_frames=10)
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))

        traces = []
        original = engine._build_step

        def counting_build_step(*args):
            step = original(*args)

            def counted(*sargs):
                if any(isinstance(a, jax.core.Tracer) for a in jax.tree.leaves(sargs)):
                    traces.append(1)
                return step(*sargs)

            return counted

        engine._build_step = counting_build_step
        replay = MappingReplay(cfg, engine=engine)
        grid = replay.run_frames(frames, window=4)
        assert np.asarray(grid).sum() > 0
        assert engine.build_sequence_runner() is engine.build_sequence_runner()
        assert sum(traces) == 2, (
            f"expected one trace per distinct window shape (4 and 2), got {sum(traces)}"
        )
        # replaying again re-traces NOTHING
        traces.clear()
        replay.run_frames(frames, window=4)
        assert sum(traces) == 0, "second replay must hit the jit cache"


class TestNodePipelineE2E:
    """Full two-node dataflow with a Dummy network (ref launch: both nodes)."""

    def test_camera_to_map(self, rng, tmp_path):
        cfg = small_cfg(tmp_path)
        cfg.TEST_END_TIME = 2  # finalize at the second pose
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"

        # build a Dummy predictor with random init (no weights on disk)
        from vision_semantic_segmentation_tpu.inference.predictor import SemanticSegmentation
        from vision_semantic_segmentation_tpu.models import build_model
        import jax.numpy as jnp

        model, *_ = build_model(net_cfg)
        x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0)
        predictor = SemanticSegmentation(net_cfg, variables=variables, compute_dtype="float32")

        bus = TopicBus()
        seg_node = SegmentationNode(cfg, bus, predictor=predictor, cameras=("camera1",))
        map_node = MappingNode(cfg, bus, engine=SemanticMappingEngine(cfg, evidence=np.eye(5)))

        from test_mapping import make_frame

        pts, _, position, quaternion = make_frame(rng, cfg, n=800)
        raw_image = (rng.random((1440, 1920, 3)) * 255).astype(np.uint8)

        # stream: cloud + poses + camera frames
        bus.publish("/reduced_map", pts, stamp=0.0, frame_id="world")
        bus.publish("/current_pose", (position, quaternion), stamp=0.0)
        bus.publish("/camera1/image_raw", raw_image, stamp=0.5, frame_id="camera1")
        assert bus.published_counts["/camera1/semantic"] == 1
        assert bus.published_counts["/semantic_point_cloud"] == 1
        assert map_node.grid is not None

        # second pose crosses TEST_END_TIME -> finalize on next frame
        bus.publish("/current_pose", (position, quaternion), stamp=3.0)
        bus.publish("/camera1/image_raw", raw_image, stamp=3.0, frame_id="camera1")
        assert map_node.finalized_map is not None
        assert map_node.finalized_map.shape == (400, 400, 3)
        assert bus.published_counts["/semantic_local_map"] == 1


class TestPlanarNodeWiring:
    """The planar fallback is driven by the synced pose (ref mapping.py:446-488),
    not a fixed identity transform."""

    def _run_node(self, cfg, poses, img, tf_tree=None):
        from vision_semantic_segmentation_tpu.mapping import SemanticMappingEngine

        bus = TopicBus()
        node = MappingNode(
            cfg, bus, engine=SemanticMappingEngine(cfg, evidence=np.eye(5)),
            tf_tree=tf_tree,
        )
        for i, (position, quaternion) in enumerate(poses):
            bus.publish("/current_pose", (position, quaternion), stamp=float(i))
            bus.publish("/camera1/semantic", img, stamp=float(i), frame_id="camera1")
        return node

    def test_moving_pose_sequence_matches_engine(self, rng, tmp_path):
        from scipy.spatial.transform import Rotation

        from vision_semantic_segmentation_tpu.geometry.transforms import pose_to_matrix
        from vision_semantic_segmentation_tpu.mapping import SemanticMappingEngine

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.DEPTH_METHOD = "planar"
        # ego-local grid in front of the camera (planar mode is ego-centric)
        cfg.MAPPING.BOUNDARY = [[0, 40], [-20, 20]]

        # structured image (stripes of two palette colors): a constant image
        # would be invariant to the warp and hide a wrong transform
        img = np.zeros((1440, 1920, 3), np.uint8)
        img[:] = np.array(cfg.LABEL_COLORS[0], np.uint8)
        img[:, ::3] = np.array(cfg.LABEL_COLORS[1], np.uint8)
        poses = []
        for i in range(3):
            q = Rotation.from_euler("z", 0.2 * i).as_quat()
            poses.append((np.array([1.0 * i, 0.5 * i, 0.0]), q))

        node = self._run_node(cfg, poses, img)
        assert node.grid is not None

        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        grid = engine.init_grid()
        for position, quaternion in poses:
            T_b2o = np.asarray(pose_to_matrix(
                np.asarray(position, np.float64),
                np.asarray(quaternion, np.float64)), np.float64)
            grid = engine.update_map_planar(grid, img, np.linalg.inv(T_b2o))
        np.testing.assert_allclose(np.asarray(node.grid), np.asarray(grid), atol=1e-5)

        # a moving pose must actually change the warp vs the identity wiring
        node_id = self._run_node(cfg, [poses[1]], img)
        grid_id = engine.update_map_planar(engine.init_grid(), img, np.eye(4))
        assert not np.allclose(np.asarray(node_id.grid), np.asarray(grid_id), atol=1e-5)

    def test_local_map_frame_from_tf_tree(self, rng, tmp_path):
        from vision_semantic_segmentation_tpu.geometry.transforms import pose_to_matrix
        from vision_semantic_segmentation_tpu.mapping import SemanticMappingEngine
        from vision_semantic_segmentation_tpu.utils.ros_compat import TransformTree

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.DEPTH_METHOD = "planar"
        img = np.zeros((1440, 1920, 3), np.uint8)
        img[:] = np.array(cfg.LABEL_COLORS[1], np.uint8)

        T_local = np.eye(4)
        T_local[:3, 3] = [3.0, -2.0, 0.0]
        tree = TransformTree()
        tree.set_transform("world", "local_map", T_local)

        pose = (np.array([1.0, 2.0, 0.0]), np.array([0.0, 0.0, 0.0, 1.0]))
        node = self._run_node(cfg, [pose], img, tf_tree=tree)

        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        T_b2o = np.asarray(pose_to_matrix(
            np.asarray(pose[0], np.float64),
            np.asarray(pose[1], np.float64)), np.float64)
        want = engine.update_map_planar(
            engine.init_grid(), img, np.linalg.inv(T_b2o) @ T_local)
        np.testing.assert_allclose(np.asarray(node.grid), np.asarray(want), atol=1e-5)


class TestHullBackProjection:
    def test_plane_hull_markers(self, rng, tmp_path):
        """Convex hulls back-project onto the estimated ground plane
        (ref node:138-201)."""
        cfg = small_cfg(tmp_path)
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"

        from vision_semantic_segmentation_tpu.inference.predictor import SemanticSegmentation
        from vision_semantic_segmentation_tpu.models import build_model
        import jax.numpy as jnp

        model, *_ = build_model(net_cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        predictor = SemanticSegmentation(net_cfg, variables=variables, compute_dtype="float32")

        bus = TopicBus()
        node = SegmentationNode(
            cfg, bus, predictor=predictor, cameras=("camera1",), publish_hulls=True
        )
        got = []
        bus.subscribe("/crosswalk_markers", lambda m: got.append(m))

        # ground plane z = -2 in the velodyne frame
        bus.publish("/estimated_plane", [0.0, 0.0, 1.0, 2.0], stamp=0.0)
        assert node.plane is not None

        labels = np.zeros((100, 140), np.int32)
        labels[40:70, 50:90] = 1  # crosswalk blob
        node.generate_and_publish_convex_hull(labels, "camera1", index_care_about=1)
        assert len(got) == 1
        markers = got[0].data
        assert markers[0].marker_type == "line_strip"
        pts = markers[0].points
        np.testing.assert_allclose(pts[:, 2], -2.0, atol=1e-3)  # on the plane


class TestFusedPipeline:
    def test_matches_two_stage_path(self, rng, tmp_path):
        """Fused class-id pipeline == segment->colorize->RGB-engine path."""
        import jax.numpy as jnp
        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
            colorize_labels,
            postprocess_labels,
        )
        from vision_semantic_segmentation_tpu.models import build_model
        from vision_semantic_segmentation_tpu.runtime.pipeline import FusedFramePipeline
        from vision_semantic_segmentation_tpu.mapping import pad_points
        from test_mapping import make_frame
        import numpy as np

        cfg = small_cfg(tmp_path)
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        net_cfg.DATASET.NUM_CLASSES = 19

        model, *_ = build_model(net_cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))

        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        pipeline = FusedFramePipeline(cfg, variables, engine=engine,
                                      compute_dtype=jnp.float32)

        pts, _, position, quaternion = make_frame(rng, cfg, n=1200)
        raw = (rng.random((720, 960, 3)) * 255).astype(np.uint8)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        grid_fused, net_labels = pipeline.step(
            engine.init_grid(), raw, pcd, valid, position, quaternion
        )

        # reference-dataflow path: predictor -> colorize -> RGB engine
        predictor = SemanticSegmentation(net_cfg, variables=variables,
                                         compute_dtype="float32")
        labels = predictor.segmentation(raw, upsample_pred=False)
        labels_full = postprocess_labels(labels, raw.shape[:2])
        # palette restricted to the 5 mapped classes (others black)
        seg_palette = np.zeros((19, 3), np.uint8)
        for net_idx, color in zip(cfg.LABELS, cfg.LABEL_COLORS):
            seg_palette[net_idx] = color
        semantic_rgb = np.asarray(colorize_labels(labels_full, seg_palette))
        grid_rgb, _, _ = engine.step(
            engine.init_grid(), pcd, valid, semantic_rgb, position, quaternion
        )

        np.testing.assert_allclose(
            np.asarray(grid_fused), np.asarray(grid_rgb), atol=1e-5
        )
        assert np.asarray(grid_fused).sum() > 0

    def test_sequence_runner_matches_per_frame(self, rng, tmp_path):
        import jax.numpy as jnp
        from vision_semantic_segmentation_tpu.models import build_model
        from vision_semantic_segmentation_tpu.runtime.pipeline import FusedFramePipeline
        from vision_semantic_segmentation_tpu.mapping import pad_points
        from test_mapping import make_frame
        import numpy as np

        cfg = small_cfg(tmp_path)
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        net_cfg.DATASET.NUM_CLASSES = 19
        model, *_ = build_model(net_cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        pipeline = FusedFramePipeline(cfg, variables, engine=engine,
                                      compute_dtype=jnp.float32)

        hw = (360, 480)
        T = 3
        frames = {"image": [], "pcd": [], "valid": [], "position": [], "quaternion": []}
        for _ in range(T):
            pts, _, position, quaternion = make_frame(rng, cfg, n=700)
            pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
            frames["image"].append((rng.random((*hw, 3)) * 255).astype(np.uint8))
            frames["pcd"].append(pcd)
            frames["valid"].append(valid)
            frames["position"].append(np.asarray(position, np.float32))
            frames["quaternion"].append(np.asarray(quaternion, np.float32))
        stacked = {k: jnp.asarray(np.stack(v)) for k, v in frames.items()}

        run = pipeline.build_sequence_runner(image_hw=hw)
        grid_scan = run(pipeline.init_grid(), stacked)

        grid_loop = pipeline.init_grid()
        for i in range(T):
            grid_loop, _ = pipeline.step(
                grid_loop, frames["image"][i], frames["pcd"][i], frames["valid"][i],
                frames["position"][i], frames["quaternion"][i],
            )
        np.testing.assert_allclose(np.asarray(grid_scan), np.asarray(grid_loop), atol=1e-5)


class TestDropObservability:
    def test_drops_counted(self, tmp_path, rng):
        cfg = small_cfg(tmp_path)
        bus = TopicBus()
        node = MappingNode(cfg, bus, engine=SemanticMappingEngine(cfg, evidence=np.eye(5)))
        # image with no cloud/pose -> dropped, counted
        img = np.zeros((8, 8, 3), np.uint8)
        bus.publish("/camera1/semantic", img, stamp=1.0, frame_id="camera1")
        assert node.dropped_frames == 1
        bus.publish("/reduced_map", rng.random((4, 10)).astype(np.float32), stamp=1.0, frame_id="world")
        bus.publish("/camera1/semantic", img, stamp=1.1, frame_id="camera1")
        assert node.dropped_frames == 2  # pose still missing
        assert node.fused_frames == 0

    def test_fused_pipeline_undistort_flag(self, rng, tmp_path):
        """Undistortion folds into the fused program when enabled."""
        import jax.numpy as jnp
        from vision_semantic_segmentation_tpu.models import build_model
        from vision_semantic_segmentation_tpu.runtime.pipeline import FusedFramePipeline
        from vision_semantic_segmentation_tpu.mapping import pad_points
        from test_mapping import make_frame
        import numpy as np

        cfg = small_cfg(tmp_path)
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        net_cfg.DATASET.NUM_CLASSES = 19
        model, *_ = build_model(net_cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        pipeline = FusedFramePipeline(cfg, variables, engine=engine,
                                      compute_dtype=jnp.float32, undistort=True)
        pts, _, position, quaternion = make_frame(rng, cfg, n=400)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        raw = (rng.random((1440, 1920, 3)) * 255).astype(np.uint8)
        grid, labels = pipeline.step(engine.init_grid(), raw, pcd, valid, position, quaternion)
        assert np.asarray(grid).shape[0] == 5


class TestFrameParallelReplayDriver:
    def test_run_frames_parallel_matches_sequential(self, rng, tmp_path):
        """MappingReplay.run_frames_parallel == run_frames on the CPU mesh."""
        import numpy as np

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        replay = MappingReplay(cfg)
        frames = _make_sequence(rng, cfg, n_frames=8, n_pts=1200)

        grid_seq = np.asarray(replay.run_frames(frames))
        grid_fp = np.asarray(replay.run_frames_parallel(frames))
        np.testing.assert_allclose(grid_fp, grid_seq, rtol=1e-5, atol=1e-5)


class TestReplayPrefetch:
    def test_prefetch_matches_sync(self, rng, tmp_path):
        """Host double-buffered staging must not change results."""
        import numpy as np

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        replay = MappingReplay(cfg)
        # mixed sequence: homogeneous stretches + a camera switch forcing
        # chunk boundaries and a single-frame fallback chunk
        frames = _make_sequence(rng, cfg, n_frames=7, n_pts=900)
        frames[3] = FrameRecord(
            pcd=frames[3].pcd, pcd_frame_id=frames[3].pcd_frame_id,
            semantic_image=frames[3].semantic_image,
            position=frames[3].position, quaternion=frames[3].quaternion,
            camera="camera6", stamp=frames[3].stamp,
        )
        a = np.asarray(replay.run_frames(frames, window=3, prefetch=False))
        b = np.asarray(replay.run_frames(frames, window=3, prefetch=True))
        np.testing.assert_array_equal(a, b)


class TestDualCameraPipeline:
    """BASELINE config 4: both vehicle cameras fuse into one grid through
    the node pipeline (camera1 + camera6 calibrations)."""

    def test_both_cameras_contribute(self, rng, tmp_path):
        import jax.numpy as jnp

        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
        )
        from vision_semantic_segmentation_tpu.models import build_model

        cfg = small_cfg(tmp_path)
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        model, *_ = build_model(net_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32)
        )
        predictor = SemanticSegmentation(
            net_cfg, variables=variables, compute_dtype="float32"
        )

        bus = TopicBus()
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        SegmentationNode(cfg, bus, predictor=predictor,
                         cameras=("camera1", "camera6"))
        node = MappingNode(cfg, bus, engine=engine)

        from test_mapping import make_frame

        pts, _, position, quaternion = make_frame(rng, cfg, n=900)
        raw = (rng.random((1440, 1920, 3)) * 255).astype(np.uint8)

        bus.publish("/reduced_map", pts, stamp=0.0, frame_id="world")
        bus.publish("/current_pose", (position, quaternion), stamp=0.0)
        bus.publish("/camera1/image_raw", raw, stamp=0.1, frame_id="camera1")
        grid_after_cam1 = np.asarray(node.grid).copy()
        bus.publish("/reduced_map", pts, stamp=0.2, frame_id="world")
        bus.publish("/current_pose", (position, quaternion), stamp=0.2)
        bus.publish("/camera6/image_raw", raw, stamp=0.3, frame_id="camera6")
        grid_after_cam6 = np.asarray(node.grid)

        # both cameras compiled their own projections and both added
        # evidence (the cameras face different directions, so the second
        # update is not a no-op duplicate of the first)
        assert ("camera1", False) in engine._step_fns
        assert ("camera6", False) in engine._step_fns
        assert grid_after_cam1.sum() > 0
        assert grid_after_cam6.sum() > grid_after_cam1.sum()
        assert node.fused_frames == 2


class TestConfidencePipeline:
    def test_confidence_weighting_bounds_evidence(self, rng, tmp_path):
        """Softmax-confidence weighting: same dataflow, evidence scaled by
        the winning class's probability (<= the unweighted grid, > 0)."""
        import jax.numpy as jnp

        from test_mapping import make_frame
        from vision_semantic_segmentation_tpu.models import build_model
        from vision_semantic_segmentation_tpu.runtime.pipeline import (
            FusedFramePipeline,
        )

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        net_cfg.DATASET.NUM_CLASSES = 19
        model, *_ = build_model(net_cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))

        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        plain = FusedFramePipeline(cfg, variables, engine=engine,
                                   compute_dtype=jnp.float32)
        conf = FusedFramePipeline(cfg, variables, engine=engine,
                                  compute_dtype=jnp.float32,
                                  confidence_weighting=True)

        pts, _, position, quaternion = make_frame(rng, cfg, n=1200)
        raw = (rng.random((720, 960, 3)) * 255).astype(np.uint8)
        from vision_semantic_segmentation_tpu.mapping.engine import pad_points

        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        g1, _ = plain.step(plain.init_grid(), raw, pcd, valid, position, quaternion)
        g2, _ = conf.step(conf.init_grid(), raw, pcd, valid, position, quaternion)
        s1, s2 = float(np.asarray(g1).sum()), float(np.asarray(g2).sum())
        assert 0 < s2 <= s1 + 1e-5
        # a random-init network is nowhere fully confident
        assert s2 < s1


class TestConfidenceHead:
    def test_labels_match_and_confidence_bounded(self, rng, tmp_path):
        import jax.numpy as jnp

        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
        )
        from vision_semantic_segmentation_tpu.models import build_model

        cfg = small_cfg(tmp_path)
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        model, *_ = build_model(net_cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        predictor = SemanticSegmentation(
            net_cfg, variables=variables, compute_dtype="float32"
        )
        img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        labels = predictor.segmentation(img)
        labels_c, conf = predictor.segmentation_with_confidence(img)
        np.testing.assert_array_equal(labels, labels_c)
        assert conf.shape == labels.shape
        assert np.all(conf > 0) and np.all(conf <= 1.0 + 1e-6)
        # argmax class probability is at least uniform
        assert np.all(conf >= 1.0 / 19 - 1e-6)


class TestGridCheckpoint:
    """Grid checkpoint/resume (engine.save_grid/load_grid + replay
    init_grid): evidence is additive, so split replays compose exactly.
    No reference equivalent — its log-odds map dies with the process and
    only RENDERED maps stitch post-hoc (ref stitching)."""

    def test_split_replay_equals_oneshot(self, rng, tmp_path):
        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        frames = _make_sequence(rng, cfg, n_frames=8, n_pts=900)
        replay = MappingReplay(cfg)

        oneshot = np.asarray(replay.run_frames(frames, window=4))

        grid_a = replay.run_frames(frames[:4], window=4)
        ckpt = tmp_path / "grid.npz"
        replay.engine.save_grid(str(ckpt), grid_a)
        loaded = replay.engine.load_grid(str(ckpt))
        split = np.asarray(replay.run_frames(frames[4:], window=4,
                                             init_grid=loaded))
        np.testing.assert_array_equal(split, oneshot)
        # the dispatch donates its grid buffer — run_frames must COPY the
        # caller's checkpoint, so the same loaded array resumes again
        again = np.asarray(replay.run_frames(frames[4:], window=4,
                                             init_grid=loaded))
        np.testing.assert_array_equal(again, oneshot)

    def test_frame_parallel_resume_adds_once(self, rng, tmp_path):
        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        frames = _make_sequence(rng, cfg, n_frames=8, n_pts=900)
        replay = MappingReplay(cfg)
        base = replay.run_frames(frames[:4], window=4)
        want = np.asarray(base) + np.asarray(
            replay.run_frames_parallel(frames[4:])
        )
        got = np.asarray(replay.run_frames_parallel(frames[4:],
                                                    init_grid=base))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_load_rejects_mismatched_geometry(self, rng, tmp_path):
        cfg = small_cfg(tmp_path)
        engine = SemanticMappingEngine(cfg)
        ckpt = tmp_path / "grid.npz"
        engine.save_grid(str(ckpt), engine.init_grid())

        other = get_cfg_defaults()
        other.MAPPING.BOUNDARY = [[100, 150], [800, 840]]
        with pytest.raises(ValueError, match="does not match"):
            SemanticMappingEngine(other).load_grid(str(ckpt))

    def test_cli_incremental_route(self, rng, tmp_path):
        """replay --save-grid then --resume-grid across two input dirs ==
        one-shot replay of all frames (identical rendered map)."""
        import cv2
        import glob

        from vision_semantic_segmentation_tpu.__main__ import main

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        frames = _make_sequence(rng, cfg, n_frames=8, n_pts=900)

        dir_all = tmp_path / "all"; dir_all.mkdir()
        dir_a = tmp_path / "a"; dir_a.mkdir()
        dir_b = tmp_path / "b"; dir_b.mkdir()
        save_frames(frames, str(dir_all / "seq.npz"))
        save_frames(frames[:4], str(dir_a / "seq.npz"))
        save_frames(frames[4:], str(dir_b / "seq.npz"))
        cfg_path = str(tmp_path / "exp.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())

        main(["replay", "--cfg", cfg_path, "--input-dir", str(dir_all)])
        oneshot_png = sorted(glob.glob(
            str(tmp_path / "out" / "**" / "global_map_seq.png"), recursive=True
        ))[-1]
        oneshot = cv2.imread(oneshot_png)

        ckpt = str(tmp_path / "route.npz")
        main(["replay", "--cfg", cfg_path, "--input-dir", str(dir_a),
              "--save-grid", ckpt])
        main(["replay", "--cfg", cfg_path, "--input-dir", str(dir_b),
              "--resume-grid", ckpt, "--save-grid", ckpt])
        combined_png = sorted(glob.glob(
            str(tmp_path / "out" / "**" / "global_map_combined.png"),
            recursive=True,
        ))[-1]
        np.testing.assert_array_equal(cv2.imread(combined_png), oneshot)
