"""The two pipeline nodes, wired over the in-process topic bus.

Rebuild of the reference's L6 ROS layer:
  * SegmentationNode (`/root/reference/src/vision_semantic_segmentation_node.py:49-221`):
    camera frame -> undistort -> scale -> network -> colorize -> publish
  * MappingNode (`/root/reference/src/mapping.py:39-355`): semantic image +
    pose + cloud -> time sync -> fused grid update -> finalize at cutoff

Topic names mirror the reference so the dataflow is recognizable; the
transport is the synchronous TopicBus instead of TCPROS.
"""
from __future__ import annotations

import os.path as osp
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config.defaults import resolve_output_dir
from ..geometry.camera import get_camera
from ..inference.predictor import (
    SemanticSegmentation,
    colorize_labels,
    postprocess_labels,
    preprocess_frame,
)
from ..mapping.engine import SemanticMappingEngine, pad_points
from ..mapping.renderer import apply_filter, render_bev_map
from ..ops.colormap import MAPILLARY_19_PALETTE
from ..utils.file_io import makedirs
from ..utils.logger import MyLogger
from .bus import Message, TopicBus, nearest_stamp_index
from .io import FrameRecord, save_frames


def _make_subscriber(bus: TopicBus, executor):
    """Wiring helper: inline bus subscription, or through a NodeExecutor's
    bounded mailboxes when one is provided (the online/concurrent mode —
    see runtime/async_bus.py)."""
    if executor is None:
        return lambda topic, cb, queue_size=1: bus.subscribe(topic, cb)
    return lambda topic, cb, queue_size=1: executor.subscribe(
        bus, topic, cb, queue_size=queue_size
    )


class SegmentationNode:
    """Camera image -> semantic RGB image (ref node:49-221).

    Subscribes ``/cameraX/image_raw`` and ``/estimated_plane``; publishes
    ``/cameraX/semantic`` plus optional crosswalk/road hull markers
    back-projected onto the ground plane (ref node:138-201).
    """

    def __init__(self, cfg, bus: TopicBus, predictor: Optional[SemanticSegmentation] = None,
                 cameras: Tuple[str, ...] = ("camera1", "camera6"),
                 publish_hulls: bool = False, executor=None):
        """``executor``: optional :class:`~.async_bus.NodeExecutor`; when
        given, callbacks run serially on its worker thread with bounded
        keep-latest mailboxes (the online/concurrent mode) instead of
        inline on ``bus.publish``."""
        self.cfg = cfg
        self.bus = bus
        _sub = _make_subscriber(bus, executor)
        self.image_scale = float(cfg.VISION_SEM_SEG.IMAGE_SCALE)
        self.predictor = predictor or SemanticSegmentation(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK)
        # colors from the network cfg's DATASET_CONFIG labels JSON when
        # set (ref vision_semantic_segmentation_node.py:62-63), else the
        # built-in Mapillary-19 palette
        from ..train.datasets.visualization import palette_from_cfg

        self.palette = palette_from_cfg(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK)
        self.publish_hulls = publish_hulls
        self.plane = None
        self.plane_last_update = 0.0
        undistort = (
            bool(cfg.VISION_SEM_SEG.UNDISTORT)
            if "UNDISTORT" in cfg.VISION_SEM_SEG
            else True
        )
        self.upsample_pred = (
            bool(cfg.VISION_SEM_SEG.UPSAMPLE_PRED)
            if "UPSAMPLE_PRED" in cfg.VISION_SEM_SEG
            else False
        )
        self._undistort_maps: Dict[str, np.ndarray] = {}
        for cam in cameras:
            if undistort:
                try:
                    self._undistort_maps[cam] = get_camera(cam).undistort_maps()
                except KeyError:
                    pass
            # camera frames: keep-latest depth 1 — a saturated seg stage
            # drops stale frames like the reference's online pipeline
            _sub(f"/{cam}/image_raw", self.image_callback, queue_size=1)
        _sub("/estimated_plane", self.plane_callback, queue_size=4)

    def plane_callback(self, msg: Message) -> None:
        """Ground-plane estimate update (ref node:199-201)."""
        from ..geometry.plane import Plane3D

        coef = msg.data
        self.plane = Plane3D(float(coef[0]), float(coef[1]), float(coef[2]), float(coef[3]))
        self.plane_last_update = msg.stamp

    def image_callback(self, msg: Message) -> None:
        """Per-frame path (ref node:74-136)."""
        camera = msg.frame_id
        image = np.asarray(msg.data)
        full_hw = (image.shape[0], image.shape[1])

        x = preprocess_frame(
            image,
            undistort_map=self._undistort_maps.get(camera),
            image_scale=self.image_scale,
        )
        labels = self.predictor.segmentation(
            np.asarray(x), upsample_pred=self.upsample_pred
        )

        if self.publish_hulls:
            # crosswalk (class 1) and road (class 2) hulls on the ground
            # plane (ref node:104-106; class ids from config_19.json)
            self.generate_and_publish_convex_hull(labels, camera, index_care_about=1)
            self.generate_and_publish_convex_hull(labels, camera, index_care_about=2)

        labels_full = postprocess_labels(labels, full_hw)
        semantic_rgb = np.asarray(colorize_labels(labels_full, self.palette))

        self.bus.publish(
            f"/{camera}/semantic", semantic_rgb, stamp=msg.stamp, frame_id=camera
        )

    # -- hull back-projection (ref node:138-197) -----------------------------
    def generate_and_publish_convex_hull(
        self, labels: np.ndarray, camera: str, index_care_about: int = 1
    ) -> None:
        from ..inference.convex_hull import generate_convex_hull

        cam = get_camera(camera)
        hulls = generate_convex_hull(np.asarray(labels), index_care_about=index_care_about)
        if not hulls or self.plane is None:
            return

        # scale hull vertices from network-output resolution to the full
        # image the calibration describes (ref node:146-150)
        scale_x = float(cam.im_size[0]) / labels.shape[1]
        scale_y = float(cam.im_size[1]) / labels.shape[0]
        scaled = [h * np.array([[scale_x], [scale_y]]) for h in hulls]
        self.cam_back_project_convex_hull(cam, scaled, index_care_about)

    def cam_back_project_convex_hull(self, cam, vertex_loops, index_care_about: int = 1) -> None:
        """Cast hull pixels to ground-plane points and publish markers."""
        import jax.numpy as jnp

        from ..utils.markers import visualize_marker

        markers = []
        for loop in vertex_loops:
            d, C = cam.pixel_to_ray(jnp.asarray(loop, jnp.float32))
            ground = np.asarray(self.plane.ray_intersection(d, C))  # (3, K)
            if index_care_about == 1:
                color, lifetime = (0.8, 0.0, 0.0, 0.8), 10.0  # crosswalk red
            else:
                color, lifetime = (0.0, 0.0, 0.8, 0.8), 3.0   # road blue
            markers.append(
                visualize_marker(
                    (0, 0, 0), frame_id="velodyne", mtype="line_strip",
                    scale=(0.1, 0.1, 0.1), color=color, points=ground.T,
                    lifetime=lifetime,
                )
            )
        topic = "/crosswalk_markers" if index_care_about == 1 else "/road_markers"
        self.bus.publish(topic, markers)


class MappingNode:
    """Semantic image + pose + cloud -> global BEV map (ref mapping.py:39-355).

    Args:
        tf_tree: optional TransformTree carrying a ``local_map`` frame (the
            reference's TF graph, ref mapping.py:454-458).  The planar
            fallback derives the local_map -> base_link transform from it
            and the synced pose; without one, local_map == the world/origin
            frame.
    """

    #: image topics this node consumes; FusedOnlineNode overrides to take
    #: RAW camera frames directly (no intermediate semantic topic)
    IMAGE_TOPICS = ("/camera1/semantic", "/camera6/semantic")

    def __init__(self, cfg, bus: TopicBus, engine: Optional[SemanticMappingEngine] = None,
                 record_inputs: bool = False, tf_tree=None, executor=None):
        self.cfg = cfg
        self.bus = bus
        _sub = _make_subscriber(bus, executor)
        self.tf_tree = tf_tree
        self.engine = engine or SemanticMappingEngine(cfg)
        self.grid = None
        self.depth_method = cfg.MAPPING.DEPTH_METHOD
        self.test_cut_time = cfg.TEST_END_TIME
        self.label_colors = np.array(cfg.LABEL_COLORS, dtype=np.uint8)
        self.record_inputs = record_inputs
        self.input_list: List[FrameRecord] = []
        self.save_map_to_file = False
        self.finalized_map: Optional[np.ndarray] = None
        self.eval_result: Optional[dict] = None

        output_dir = resolve_output_dir(cfg.OUTPUT_DIR, cfg.TASK_NAME)
        self.logger = MyLogger("mapping", save_dir=output_dir, use_timestamp=False)
        self.output_dir = self.logger.save_dir

        # time-sync queues (ref mapping.py:91-104)
        self.pose_queue: List[Message] = []
        self.pcd_queue: List[Message] = []
        # observability: the reference drops frames silently when queues are
        # empty (ref mapping.py:281,284; SURVEY.md section 5 "failure
        # detection: none") — count and log them here instead
        self.dropped_frames = 0
        self.fused_frames = 0

        # history topics get deep mailboxes (they feed this node's own
        # sync queues); semantic frames keep-latest depth 1
        _sub("/current_pose", self.pose_callback, queue_size=256)
        for topic in self.IMAGE_TOPICS:
            _sub(topic, self.image_callback, queue_size=1)
        if tf_tree is not None:
            _sub("/tf", self._tf_callback, queue_size=256)
        self._tf_cameras_registered: set = set()
        self.pcd_topic = {
            "points_map": "/reduced_map", "points_raw": "/points_raw",
        }.get(self.depth_method)
        if self.pcd_topic:
            _sub(self.pcd_topic, self.pcd_callback, queue_size=256)

    # -- callbacks -----------------------------------------------------------
    def _tf_callback(self, msg: Message) -> None:
        """Fold /tf messages into the tree (rosbag playback path)."""
        for tr in getattr(msg.data, "transforms", []):
            self.tf_tree.set_pose(
                tr.translation, tr.rotation,
                parent=tr.header.frame_id.lstrip("/"),
                child=tr.child_frame_id.lstrip("/"),
                stamp=tr.header.stamp,
            )

    def _maybe_register_tf_camera(self, camera: str) -> None:
        """Dynamic camera extrinsics from TF, once, before first compile.

        The reference resolves camera->base_link from the live TF tree at
        startup (ref mapping.py:142-163) and composes it with the pose in
        get_extrinsics (ref :528-541).  Here, if the TF tree carries the
        camera frame, rebuild the engine's camera with those extrinsics;
        the built-in hardcoded setup stays as the fallback.
        """
        if self.tf_tree is None or camera in self._tf_cameras_registered:
            return
        if any(key[0] == camera for key in self.engine._step_fns):
            # projection already compiled with the built-in extrinsics; a
            # late TF broadcast can no longer take effect for this camera
            self._tf_cameras_registered.add(camera)
            return
        try:
            T_cam_to_base = self.tf_tree.lookup("base_link", camera)
        except LookupError:
            # no TF calibration broadcast YET — retry on later frames (the
            # calibration may arrive after the first image, e.g. when the
            # first frames are dropped waiting for pose/cloud sync)
            return
        self._tf_cameras_registered.add(camera)
        from ..geometry.camera import camera_from_extrinsic, get_camera

        T_cam_to_velo = (
            np.linalg.inv(self.engine.T_velodyne_to_baselink) @ T_cam_to_base
        )
        self.engine.cameras[camera] = camera_from_extrinsic(
            get_camera(camera), T_cam_to_velo
        )
        self.logger.log(f"Registered TF extrinsics for {camera}")

    def pcd_callback(self, msg: Message) -> None:
        self.pcd_queue.append(msg)

    def pose_callback(self, msg: Message) -> None:
        self.pose_queue.append(msg)
        if msg.stamp >= self.test_cut_time:
            self.save_map_to_file = True

    def _sync(self, queue: List[Message], target: float) -> Message:
        idx = nearest_stamp_index([m.stamp for m in queue], target)
        # select BEFORE trimming (the reference captures the message and
        # only then rebinds the queue from the bracket start, ref :204-216;
        # indexing the trimmed queue with the pre-trim index returned a
        # message ~2x deeper than the nearest whenever idx >= 2)
        msg = queue[idx]
        # drop everything before the bracketing window (ref :210-217)
        del queue[: max(idx - 1, 0)]
        return msg

    def image_callback(self, msg: Message) -> None:
        """Fuse one semantic frame (ref mapping.py:261-355)."""
        self._maybe_register_tf_camera(msg.frame_id)
        if self.depth_method in ("points_map", "points_raw"):
            if not self.pcd_queue:
                self.dropped_frames += 1
                self.logger.log(
                    f"Dropping frame at {msg.stamp}: no point cloud in queue "
                    f"({self.dropped_frames} dropped so far)", level="warning",
                )
                return
            pcd_msg = self._sync(self.pcd_queue, msg.stamp)
        else:
            pcd_msg = None
        if not self.pose_queue:
            self.dropped_frames += 1
            self.logger.log(
                f"Dropping frame at {msg.stamp}: no pose in queue "
                f"({self.dropped_frames} dropped so far)", level="warning",
            )
            return
        pose_msg = self._sync(self.pose_queue, msg.stamp)

        if self.grid is None:
            self.grid = self.engine.init_grid()

        position, quaternion = pose_msg.data
        if pcd_msg is not None:
            pcd = np.asarray(pcd_msg.data, dtype=np.float32)
            if self.record_inputs:
                self.input_list.append(
                    FrameRecord(
                        pcd=pcd, pcd_frame_id=pcd_msg.frame_id,
                        semantic_image=np.asarray(msg.data),
                        position=np.asarray(position),
                        quaternion=np.asarray(quaternion),
                        camera=msg.frame_id, stamp=msg.stamp,
                    )
                )
            pcd_pad, valid = pad_points(pcd, self.engine.point_bucket)
            labeled = self._fuse_cloud(
                msg, pcd_pad, valid, position, quaternion, pcd_msg.frame_id
            )
            self.fused_frames += 1
            if labeled is not None:
                # labeled cloud for downstream consumers (ref :316-317)
                self.bus.publish(
                    "/semantic_point_cloud",
                    (pcd_pad, labeled[0], labeled[1]),
                    stamp=msg.stamp, frame_id=pcd_msg.frame_id,
                )
        else:
            # planar fallback (ref :321,446-488): ground-plane homography
            # driven by the synced pose — the reference's TF lookup of
            # local_map -> base_link at pose_time (ref :454-458), computed
            # here as inv(T_base_to_origin(pose)) @ T_local_to_origin
            self.grid = self.engine.update_map_planar(
                self.grid, np.asarray(msg.data),
                self._planar_transform(position, quaternion),
                camera=msg.frame_id,
            )

        if self.save_map_to_file:
            self.finalize()

    def _fuse_cloud(self, msg, pcd_pad, valid, position, quaternion,
                    pcd_frame_id):
        """One cloud-mode fusion dispatch.  Returns the labeled cloud
        ``(point_cls, point_vis)`` for the /semantic_point_cloud republish,
        or ``None`` when the fused program doesn't materialize one
        (:class:`FusedOnlineNode`)."""
        self.grid, point_cls, point_vis = self.engine.step(
            self.grid, pcd_pad, valid, np.asarray(msg.data),
            position, quaternion, camera=msg.frame_id,
            pcd_frame_id=pcd_frame_id,
        )
        return np.asarray(point_cls), np.asarray(point_vis)

    def _planar_transform(self, position, quaternion) -> np.ndarray:
        """local_map -> base_link from the synced pose (ref mapping.py:454-458)."""
        from ..geometry.transforms import pose_to_matrix

        T_base_to_origin = np.asarray(
            pose_to_matrix(
                np.asarray(position, np.float64),
                np.asarray(quaternion, np.float64),
            ),
            dtype=np.float64,
        )
        T_local_to_origin = np.eye(4)
        if self.tf_tree is not None:
            try:
                T_local_to_origin = self.tf_tree.lookup("world", "local_map")
            except LookupError:
                pass  # no local_map broadcast yet: anchored at the origin
        return np.linalg.inv(T_base_to_origin) @ T_local_to_origin

    # -- finalization (ref mapping.py:323-355) -------------------------------
    def finalize(self) -> np.ndarray:
        if self.record_inputs and self.cfg.MAPPING.INPUT_DIR:
            makedirs(self.cfg.MAPPING.INPUT_DIR, exist_ok=True)
            save_frames(
                self.input_list, osp.join(self.cfg.MAPPING.INPUT_DIR, "input_list.npz")
            )

        import jax.numpy as jnp

        hwc = jnp.asarray(SemanticMappingEngine.to_hwc(self.grid))
        color_map = np.asarray(render_bev_map(apply_filter(hwc), self.label_colors))

        makedirs(self.output_dir, exist_ok=True)
        output_file = osp.join(self.output_dir, "global_map.png")
        import cv2

        cv2.imwrite(output_file, color_map)
        self.logger.log(f"Saving image to {output_file}")

        if self.cfg.GROUND_TRUTH_DIR:
            from ..evaluation.map_eval import MapEvaluator

            evaluator = MapEvaluator(
                ground_truth_dir=self.cfg.GROUND_TRUTH_DIR, logger=self.logger
            )
            self.eval_result = evaluator.test_single_map(color_map)

        self.bus.publish("/semantic_local_map", color_map)
        self.finalized_map = color_map
        self.save_map_to_file = False
        return color_map


class FusedOnlineNode(MappingNode):
    """Single-dispatch online node: RAW camera frame + pose + cloud ->
    one fused XLA program per frame (undistort/scale/forward/projection/
    Bayesian update) via :meth:`FusedFramePipeline.step`.

    The two-node topology (SegmentationNode -> MappingNode) pays two
    device dispatches per camera frame.  Chaining both stages inside one
    program halves the per-frame dispatch overhead — measured on the v5e
    (scripts/probe_online_device.py): at a 12 Hz camera and 1.0x
    playback the two-node path sustains 10.9 Hz (10 drops/96 frames,
    invariant to IMAGE_SCALE and readback amortization — it is
    dispatch-bound, not compute-bound), while the fused node sustains
    the FULL 12 Hz with ZERO drops.  The reference needs the bag slowed
    to 0.1x for zero drops (ref README.md:194).

    Trade-offs vs the two-node topology: no ``/cameraX/semantic``
    republish and no ``/semantic_point_cloud`` labeled cloud (downstream
    consumers of either need the two-node mode), and no frame-level
    overlap of forward(i+1) with fusion(i) — the fused program's only
    consumer is the grid, so XLA pipelines internally instead.

    Sync semantics, drop accounting, TF extrinsics registration,
    TEST_END_TIME finalization, and the output artifacts are all
    inherited from :class:`MappingNode` unchanged.
    """

    IMAGE_TOPICS = ("/camera1/image_raw", "/camera6/image_raw")

    def __init__(self, cfg, bus: TopicBus, pipeline=None, variables=None,
                 engine: Optional[SemanticMappingEngine] = None, **kwargs):
        """``pipeline`` injects a prebuilt FusedFramePipeline (tests use
        light doubles); otherwise one is built from ``variables`` (or the
        config's MODEL.WEIGHT via SemanticSegmentation's loader), with
        distortion handled on the projected points when
        VISION_SEM_SEG.UNDISTORT is set (the TPU-first production path —
        see FusedFramePipeline's distortion docstring)."""
        if pipeline is None:
            from .pipeline import FusedFramePipeline

            if variables is None:
                from ..inference.predictor import SemanticSegmentation

                variables = SemanticSegmentation(
                    cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
                ).variables
            undistort = (
                bool(cfg.VISION_SEM_SEG.UNDISTORT)
                if "UNDISTORT" in cfg.VISION_SEM_SEG
                else True
            )
            pipeline = FusedFramePipeline(
                cfg, variables, engine=engine,
                distortion="points" if undistort else "none",
            )
        self.pipeline = pipeline
        super().__init__(cfg, bus, engine=pipeline.engine, **kwargs)
        if self.depth_method not in ("points_map", "points_raw"):
            raise ValueError(
                "FusedOnlineNode needs a cloud DEPTH_METHOD (points_map/"
                "points_raw); the planar path has no fused program — use "
                "the two-node topology for MAPPING.DEPTH_METHOD="
                f"{self.depth_method!r}"
            )

    def _fuse_cloud(self, msg, pcd_pad, valid, position, quaternion,
                    pcd_frame_id):
        self.grid, _ = self.pipeline.step(
            self.grid, np.asarray(msg.data), pcd_pad, valid,
            position, quaternion, camera=msg.frame_id,
            pcd_frame_id=pcd_frame_id,
        )
        return None
