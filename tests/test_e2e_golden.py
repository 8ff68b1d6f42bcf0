"""Synthetic golden-bag end-to-end parity.

The reference's real integration test is: drive a recorded bag through both
nodes, write ``global_map.png``, and score IoU against annotated BEV ground
truth (ref README.md:190-196, test/test_semantic_mapping.py:117-161).  No
reference bag or pretrained weights exist in this environment, so this module
builds the next-best thing from first principles:

1. a synthetic urban scene (road / crosswalk / lane regions) with *exact*
   geometric ground truth, written in the evaluator's ``bev-5cm-*.jpg``
   contract;
2. camera frames ray-cast through the real camera-1 calibration and the
   vehicle extrinsics, plus a cell-center point map — a fully synthetic bag;
3. a real DeepLabV3+ (resnet18-os16) trained in-process to segment the
   scene's input colors, saved as a ``.npz`` checkpoint;
4. the full CLI ``pipeline`` path (segmentation node -> topic bus -> mapping
   node -> finalize) over that bag, scored with MapEvaluator at pinned IoU
   thresholds;
5. a float64 host reference of the whole post-network pipeline (projection,
   grid update, box filter, rendering) compared cell-for-cell against the
   device map.
"""
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# The scene generator is a package feature (evaluation/synthetic_scene.py,
# shared with `autotune --serving`'s quality scorer); this module is the
# e2e quality GATE built on it.
from vision_semantic_segmentation_tpu.evaluation.synthetic_scene import (
    BOUNDARY,
    GRID_HW,
    INPUT_COLORS,
    NET_IDS,
    RES,
    make_point_map,
    make_poses,
    pose as _pose,
    render_frame,
    scene_class,
    scene_network_cfg,
    train_segmenter,
    write_ground_truth,
)
from vision_semantic_segmentation_tpu.runtime.io import FrameRecord, save_frames


def network_cfg(weight_path=""):
    """Scene app config at the fixture's network operating point."""
    return scene_network_cfg(
        weight_path, backbone="resnet18", output_stride=16
    )


# --------------------------------------------------------------------------
# Fixture: build the whole artifact set once per session
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def golden_bag(tmp_path_factory):
    import cv2  # noqa: F401  (needed by write_ground_truth)

    root = tmp_path_factory.mktemp("golden")
    gt_dir = root / "ground_truth"
    gt_dir.mkdir()
    write_ground_truth(str(gt_dir))

    poses = make_poses()
    pcd = make_point_map()

    images, net_labels = [], []
    for position, quaternion in poses:
        img, lab = render_frame(position, quaternion)
        images.append(img)
        net_labels.append(lab)

    # train on 8 frames spanning viewpoints and yaws, at the node's exact
    # preprocessing (area resize to 96x128) and resolution — CNNs are not
    # scale-invariant, and a train/infer resolution or resampling mismatch
    # measurably collapses the thin-lane class (test development finding)
    from vision_semantic_segmentation_tpu.ops.resize import resize_area

    train_idx = list(range(0, len(poses), max(1, len(poses) // 8)))[:8]

    def _small(idx):
        return (
            [
                np.asarray(
                    resize_area(jnp.asarray(images[i]), (144, 192))
                ).astype(np.float32)
                for i in idx
            ],
            [net_labels[i][4::10, 4::10] for i in idx],
        )

    small_imgs, small_labels = _small(train_idx)
    # held-out VIEWS arm the trainer's generalization gate (train-batch
    # metrics alone can lie — r04 scale-1.0 collapse finding); same
    # offset recipe as the serving sweep's SceneArtifacts
    stride = max(1, len(poses) // 8)
    val_idx = [min(i + max(1, stride // 2), len(poses) - 1) for i in train_idx]
    val_imgs, val_labels = _small(val_idx)
    weight_path = str(root / "segmenter.npz")

    # Content-keyed disk cache of the trained weights: the 300 gate-checked
    # steps are ~15 min of the suite's 45 (r05 durations: this fixture's
    # setup was 1080 s).  The trainer is bit-deterministic, so identical
    # inputs + recipe give identical weights — and a WRONG cache hit cannot
    # silently pass: every downstream test gates map IoU on these weights.
    # Disable with VSS_TEST_WEIGHT_CACHE=0 (or point it elsewhere).
    import hashlib
    import inspect
    import shutil

    cache_dir = os.environ.get("VSS_TEST_WEIGHT_CACHE", "/tmp/vss_test_weights")
    cached = None
    if cache_dir != "0":
        # Key = training inputs + call args + the trainer's own source:
        # an edit to train_segmenter (lr default, gate logic, ...) must
        # invalidate the cache by itself — a hand-maintained recipe tag
        # alone silently reuses pre-change weights (review finding).
        h = hashlib.sha256(b"golden|resnet18|os16|steps300")
        h.update(inspect.getsource(train_segmenter).encode())
        for a in (*small_imgs, *small_labels, *val_imgs, *val_labels):
            h.update(np.ascontiguousarray(a).tobytes())
        cached = osp.join(cache_dir, f"golden_{h.hexdigest()[:20]}.npz")
    if cached and osp.exists(cached):
        shutil.copyfile(cached, weight_path)
        acc = None  # cache hit: no fresh training pass to report
    else:
        acc = train_segmenter(
            small_imgs, small_labels, weight_path, max_steps=300,
            val_frames=val_imgs, val_labels=val_labels,
        )
        if cached:
            os.makedirs(cache_dir, exist_ok=True)
            shutil.copyfile(weight_path, cached)

    bag_path = str(root / "bag.npz")
    frames = [
        FrameRecord(
            pcd=pcd,
            pcd_frame_id="world",
            semantic_image=images[i],
            position=poses[i][0],
            quaternion=poses[i][1],
            camera="camera1",
            stamp=float(i),
        )
        for i in range(len(poses))
    ]
    save_frames(frames, bag_path)

    cfg = network_cfg(weight_path)
    cfg.TASK_NAME = "golden_e2e"
    cfg.OUTPUT_DIR = str(root / "out")
    cfg.GROUND_TRUTH_DIR = str(gt_dir)
    cfg.MAPPING.RESOLUTION = RES
    cfg.MAPPING.BOUNDARY = BOUNDARY
    cfg.MAPPING.POINT_BUCKET = 2 ** 16
    # every cell is within ~7.1 m of some lattice viewpoint; capping the
    # range keeps far, heavily-quantized observations out of the evidence
    cfg.MAPPING.PCD.RANGE_MAX = 12.0
    cfg.VISION_SEM_SEG.IMAGE_SCALE = 0.1  # -> 144x192, = train resolution
    cfg.VISION_SEM_SEG.UNDISTORT = False  # frames are rendered pinhole
    # argmax at 96x128 instead of the decoder's 24x32 (the reference's
    # upsample_pred=False default costs the thin lane class dearly at
    # reduced IMAGE_SCALE)
    cfg.VISION_SEM_SEG.UPSAMPLE_PRED = True
    cfg_path = str(root / "golden.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg.dump())

    return {
        "root": root,
        "cfg": cfg,
        "cfg_path": cfg_path,
        "bag_path": bag_path,
        "gt_dir": str(gt_dir),
        "train_acc": acc,
        "frames": frames,
    }


class TestGoldenPipeline:
    def test_cli_pipeline_iou(self, golden_bag):
        """Full CLI path: __main__ pipeline -> global_map.png -> IoU."""
        import cv2

        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.evaluation.map_eval import MapEvaluator

        main(["pipeline", "--cfg", golden_bag["cfg_path"], "--bag", golden_bag["bag_path"]])

        import glob

        candidates = sorted(
            glob.glob(
                osp.join(str(golden_bag["root"]), "out", "**", "global_map.png"),
                recursive=True,
            )
        )
        assert candidates, "pipeline did not write a global_map.png"
        map_path = candidates[-1]
        color_map = cv2.imread(map_path)  # saved RGB round-trips unchanged

        evaluator = MapEvaluator(ground_truth_dir=golden_bag["gt_dir"])
        result = evaluator.test_single_map(color_map)

        # Pinned quality floor, tightened to what the system achieves with
        # the held-out-gated balanced trainer (VERDICT r04 #5; measured
        # road 0.938, crosswalk 0.955, lane 0.881, miou 0.924, missing
        # 0.00004 — margins for library drift).  Why this fixture cannot
        # match the serving sweep's lane 0.97-0.99: the sweep's smallest
        # operating point is IMAGE_SCALE 0.355 (511x682 network input);
        # this fixture runs 0.1 (144x192) to bound CPU-suite cost, where
        # input-label quantization projected to the ground is ~3.5x
        # coarser — at the thin 0.8 m (4-cell) lane stripes that costs
        # ~0.09 IoU irreducibly (r02 sweep: lane 0.31 -> 0.89 was won by
        # resolution/range/lattice, and the residual is resolution-bound).
        assert result["iou"]["road"] >= 0.88, result
        assert result["iou"]["crosswalk"] >= 0.92, result
        assert result["iou"]["lane"] >= 0.80, result
        assert result["miou"] >= 0.87, result
        assert result["missing_rate"] <= 0.02, result

    def test_cli_fused_confidence_pipeline_iou(self, golden_bag):
        """`pipeline --fused --confidence`: the production fast path with
        the softmax-confidence-weighted Bayesian update, scored end-to-end.

        Also pins the UNDISTORT-aware distortion selection: the golden
        frames are rendered pinhole (UNDISTORT False), so the fused path
        must project pinhole — applying the plumb-bob point model against
        rectified frames would mis-gather near the frame edges."""
        import glob

        import cv2

        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.evaluation.map_eval import MapEvaluator

        pattern = osp.join(str(golden_bag["root"]), "out", "**", "global_map_fused.png")
        before = set(glob.glob(pattern, recursive=True))
        main([
            "pipeline", "--cfg", golden_bag["cfg_path"],
            "--bag", golden_bag["bag_path"], "--fused", "--confidence",
        ])
        candidates = sorted(set(glob.glob(pattern, recursive=True)) - before)
        assert candidates, "fused pipeline wrote no global_map_fused.png"

        color_map = cv2.imread(candidates[-1])
        evaluator = MapEvaluator(ground_truth_dir=golden_bag["gt_dir"])
        result = evaluator.test_single_map(color_map)
        # confidence-weighted evidence on an overfit segmenter behaves
        # close to the unweighted update; floors a notch under the
        # two-node path's (which also differs by the class-id shortcut)
        assert result["iou"]["road"] >= 0.80, result
        assert result["iou"]["crosswalk"] >= 0.85, result
        assert result["iou"]["lane"] >= 0.50, result
        assert result["missing_rate"] <= 0.05, result

    def test_quantized_predictor_on_trained_net(self, golden_bag):
        """Int8 PTQ quality on a TRAINED net (models/quant.py): the
        quantized predictor's label maps must agree with the float path
        on nearly every pixel of the golden scene — the quality evidence
        behind the opt-in serving mode (random-net agreement is pinned in
        tests/test_quant.py; trained nets agree more)."""
        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
        )
        from vision_semantic_segmentation_tpu.ops.resize import resize_area

        cfg = golden_bag["cfg"]
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        seg = SemanticSegmentation(net_cfg, compute_dtype="float32")

        frames = [
            np.asarray(
                resize_area(jnp.asarray(f.semantic_image), (144, 192))
            ).astype(np.uint8)
            for f in golden_bag["frames"][::10]
        ]  # 5 viewpoints
        refs = [seg.segmentation(f, upsample_pred=True) for f in frames]
        seg.quantize(frames[:3])
        agree = np.mean([
            (seg.segmentation(f, upsample_pred=True) == r).mean()
            for f, r in zip(frames, refs)
        ])
        assert agree >= 0.97, agree

    def test_spatial_sharded_forward_on_trained_net(self, golden_bag):
        """The mp (spatially-sharded) serving forward on the TRAINED net:
        row-banded GSPMD inference over the 8-device mesh must produce
        the same labels as the single-device forward on golden frames
        (parallel/spatial_infer.py — conv halo exchanges re-associate no
        window sum, argmax must match exactly)."""
        import jax

        from vision_semantic_segmentation_tpu.models import deeplab_from_cfg
        from vision_semantic_segmentation_tpu.models.convert import load_npz
        from vision_semantic_segmentation_tpu.inference.predictor import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )
        from vision_semantic_segmentation_tpu.ops.resize import resize_area
        from vision_semantic_segmentation_tpu.parallel import (
            create_mesh,
            make_spatial_forward,
            replicate_variables,
            shard_image,
        )

        cfg = golden_bag["cfg"]
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        model = deeplab_from_cfg(net_cfg, dtype=jnp.float32)
        variables = load_npz(net_cfg.MODEL.WEIGHT)

        img = np.asarray(
            resize_area(
                jnp.asarray(golden_bag["frames"][0].semantic_image), (144, 192)
            )
        ).astype(np.float32)
        x = ((img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD)[None]

        ref = np.argmax(
            np.asarray(
                model.apply(variables, x, train=False, upsample_pred=True)
            ),
            -1,
        )
        mesh = create_mesh(axis_names=("grid",), devices=jax.devices())
        fwd = make_spatial_forward(
            model, mesh, axis="grid", upsample_pred=True, argmax=True
        )
        out = fwd(replicate_variables(mesh, variables), shard_image(mesh, x))
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_cli_pipeline_from_rosbag(self, golden_bag):
        """The same pipeline driven from a ROS .bag recording: container
        serialization -> bag adapter -> nodes -> map (subset of frames,
        loose quality floor — full coverage is the .npz test's job)."""
        import glob

        import cv2

        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.evaluation.map_eval import MapEvaluator
        from vision_semantic_segmentation_tpu.runtime.rosbag import (
            Header,
            ImageMsg,
            PointCloud2Msg,
            PointField,
            PoseStampedMsg,
            write_bag,
        )

        subset = golden_bag["frames"][::5]  # 10 frames
        msgs = []
        fields = [
            PointField("x", 0, 7, 1),
            PointField("y", 4, 7, 1),
            PointField("z", 8, 7, 1),
            PointField("intensity", 12, 7, 1),
        ]
        for f in subset:
            pts = np.asarray(f.pcd, np.float32)
            pc2 = PointCloud2Msg(
                Header(0, f.stamp, "/world"), 1, pts.shape[1], fields, 16,
                np.ascontiguousarray(pts.T).tobytes(),
            )
            msgs.append(("/reduced_map", pc2, f.stamp))
            msgs.append((
                "/current_pose",
                PoseStampedMsg(
                    Header(0, f.stamp, "/world"), f.position, f.quaternion
                ),
                f.stamp,
            ))
            msgs.append((
                "/camera1/image_raw",
                ImageMsg(
                    Header(0, f.stamp, "camera1"),
                    f.semantic_image.shape[0], f.semantic_image.shape[1],
                    "rgb8", f.semantic_image,
                ),
                f.stamp,
            ))
        bag_path = str(golden_bag["root"] / "drive.bag")
        write_bag(bag_path, msgs)

        pattern = osp.join(str(golden_bag["root"]), "out", "**", "global_map.png")
        before = set(glob.glob(pattern, recursive=True))
        main(["pipeline", "--cfg", golden_bag["cfg_path"], "--bag", bag_path])
        candidates = sorted(set(glob.glob(pattern, recursive=True)) - before)
        # the bag run must write its OWN map: a stale map from the .npz
        # test passing here would mask a dead rosbag path
        assert candidates, "bag pipeline produced no new global_map.png"

        from vision_semantic_segmentation_tpu.evaluation.map_eval import (
            convert_labels,
        )

        color_map = cv2.imread(candidates[-1])
        evaluator = MapEvaluator(ground_truth_dir=golden_bag["gt_dir"])
        generated = convert_labels(np.asarray(color_map))
        truth = evaluator._crop_truth(generated)
        mapped = generated > 0
        # 10 of 50 frames: coverage is partial by construction, but the
        # cells that ARE mapped must carry the right class
        assert mapped.mean() > 0.10, float(mapped.mean())
        precision = float(np.mean((truth == generated)[mapped]))
        assert precision > 0.80, precision

    def test_degraded_frames_pipeline_iou(self, golden_bag):
        """Sensor-realism robustness gate: Gaussian sensor noise + JPEG
        round-trip on every camera frame (the reference's real input is a
        compressed_image topic, ref launch/play_rosbag.launch — its frames
        carry exactly these artifacts), then the full two-node pipeline.

        The point being demonstrated is the MAPPING property: multi-view
        Bayesian evidence fusion absorbs per-frame segmentation noise
        (same property the serving Pareto exploits), so the map floors sit
        close to the clean-bag gates of test_cli_pipeline_iou even though
        individual degraded frames mis-segment."""
        import glob

        import cv2

        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.evaluation.map_eval import MapEvaluator

        rng = np.random.default_rng(7)
        degraded = []
        for f in golden_bag["frames"]:
            img = f.semantic_image.astype(np.float32)
            img = img + rng.normal(0.0, 8.0, img.shape)  # sensor noise, sigma 8/255
            img = np.clip(img, 0, 255).astype(np.uint8)
            ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 50])
            assert ok
            img = cv2.imdecode(buf, cv2.IMREAD_COLOR)  # channel-order round-trip
            degraded.append(
                FrameRecord(
                    pcd=f.pcd, pcd_frame_id=f.pcd_frame_id, semantic_image=img,
                    position=f.position, quaternion=f.quaternion,
                    camera=f.camera, stamp=f.stamp,
                )
            )
        bag_path = str(golden_bag["root"] / "bag_degraded.npz")
        save_frames(degraded, bag_path)

        cfg = golden_bag["cfg"].clone()
        cfg.TASK_NAME = "golden_degraded"
        cfg.OUTPUT_DIR = str(golden_bag["root"] / "out_degraded")
        cfg_path = str(golden_bag["root"] / "golden_degraded.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())

        main(["pipeline", "--cfg", cfg_path, "--bag", bag_path])
        candidates = sorted(
            glob.glob(
                osp.join(cfg.OUTPUT_DIR, "**", "global_map.png"), recursive=True
            )
        )
        assert candidates, "degraded pipeline wrote no global_map.png"
        result = MapEvaluator(ground_truth_dir=golden_bag["gt_dir"]).test_single_map(
            cv2.imread(candidates[-1])
        )
        print("degraded-frames map:", result)
        # Measured on the fixture weights (2026-08-20): road 0.9415,
        # crosswalk 0.9574, lane 0.8822, miou 0.9271, missing 8e-5 —
        # every class WITHIN NOISE of the clean bag's measured values
        # (road 0.938/crosswalk 0.955/lane 0.881) despite sigma-8 noise
        # + Q50 JPEG on all 90 frames: the area-resize to 144x192
        # averages ~100 camera px per network px (cutting pixel noise
        # ~10x) and the 90-view Bayesian fusion absorbs what remains.
        # Floors = clean-bag gates minus a small degradation allowance.
        assert result["iou"]["road"] >= 0.87, result
        assert result["iou"]["crosswalk"] >= 0.90, result
        assert result["iou"]["lane"] >= 0.79, result
        assert result["miou"] >= 0.86, result
        assert result["missing_rate"] <= 0.02, result

    def test_pose_jitter_pipeline_iou(self, golden_bag):
        """Localization-noise robustness gate: zero-mean jitter on every
        frame's pose (2 cm std on x/y, 0.3 deg std on yaw — typical
        well-tuned NDT/GNSS localization error; the reference consumes
        /current_pose from exactly such a localizer, ref mapping.py
        pose subscriber) through the full two-node pipeline.

        Pose error, unlike pixel noise, moves EVIDENCE between nearby
        cells, so thin structures pay first — but at 2 cm / 0.3 deg the
        displacement is well under the 0.2 m cell size and the measured
        cost is small even on the 4-cell lane stripes (~0.013 IoU)."""
        import glob

        import cv2

        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.evaluation.map_eval import MapEvaluator

        rng = np.random.default_rng(11)
        jittered = []
        for f in golden_bag["frames"]:
            dx, dy = rng.normal(0.0, 0.02, 2)
            dyaw = rng.normal(0.0, np.deg2rad(0.3))
            qz, qw = f.quaternion[2], f.quaternion[3]
            yaw = 2.0 * np.arctan2(qz, qw) + dyaw
            jittered.append(
                FrameRecord(
                    pcd=f.pcd, pcd_frame_id=f.pcd_frame_id,
                    semantic_image=f.semantic_image,
                    position=f.position + np.array([dx, dy, 0.0]),
                    quaternion=np.array(
                        [0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)]
                    ),
                    camera=f.camera, stamp=f.stamp,
                )
            )
        bag_path = str(golden_bag["root"] / "bag_jitter.npz")
        save_frames(jittered, bag_path)

        cfg = golden_bag["cfg"].clone()
        cfg.TASK_NAME = "golden_jitter"
        cfg.OUTPUT_DIR = str(golden_bag["root"] / "out_jitter")
        cfg_path = str(golden_bag["root"] / "golden_jitter.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())

        main(["pipeline", "--cfg", cfg_path, "--bag", bag_path])
        candidates = sorted(
            glob.glob(
                osp.join(cfg.OUTPUT_DIR, "**", "global_map.png"), recursive=True
            )
        )
        assert candidates, "jittered pipeline wrote no global_map.png"
        result = MapEvaluator(ground_truth_dir=golden_bag["gt_dir"]).test_single_map(
            cv2.imread(candidates[-1])
        )
        print("pose-jitter map:", result)
        # Measured on the fixture weights (2026-08-20): road 0.9389,
        # crosswalk 0.9594, lane 0.8680, miou 0.9221, missing 0.0 —
        # lane drops 0.013 IoU vs the clean bag (thin-structure cost),
        # road/crosswalk are unchanged.  At these magnitudes (sub-cell
        # displacement) multi-view fusion votes the jitter away.
        assert result["iou"]["road"] >= 0.87, result
        assert result["iou"]["crosswalk"] >= 0.90, result
        assert result["iou"]["lane"] >= 0.78, result
        assert result["miou"] >= 0.86, result
        assert result["missing_rate"] <= 0.02, result

    def test_float64_host_reference_matches_device_map(self, golden_bag):
        """f64 numpy reference of the whole post-network pipeline vs the
        device pipeline: semantic images captured off the bus, then f64
        projection + grid update + box filter + render."""
        from test_mapping import golden_frame

        from vision_semantic_segmentation_tpu.mapping.engine import (
            SemanticMappingEngine,
        )
        from vision_semantic_segmentation_tpu.runtime.bus import TopicBus
        from vision_semantic_segmentation_tpu.runtime.node import (
            MappingNode,
            SegmentationNode,
        )

        cfg = golden_bag["cfg"]
        bus = TopicBus()
        SegmentationNode(cfg, bus)
        engine = SemanticMappingEngine(cfg)
        node = MappingNode(cfg, bus, engine=engine)

        semantic_images = []
        bus.subscribe("/camera1/semantic", lambda m: semantic_images.append(np.asarray(m.data)))

        # parity needs identical inputs, not full coverage: a 12-frame
        # subset keeps this test fast
        subset = golden_bag["frames"][::4]
        for f in subset:
            bus.publish("/reduced_map", f.pcd, stamp=f.stamp, frame_id=f.pcd_frame_id)
            bus.publish("/current_pose", (f.position, f.quaternion), stamp=f.stamp)
            bus.publish("/camera1/image_raw", f.semantic_image, stamp=f.stamp, frame_id="camera1")
        device_map = node.finalize()
        assert len(semantic_images) == len(subset)

        # ---- float64 host pipeline ----
        grid = np.zeros(
            (GRID_HW[0], GRID_HW[1], len(cfg.LABELS_NAMES)), dtype=np.float64
        )
        evidence = np.asarray(engine.evidence, dtype=np.float64)
        for f, sem in zip(subset, semantic_images):
            grid = golden_frame(
                grid, f.pcd.astype(np.float64), sem, f.position, f.quaternion,
                cfg, evidence,
            )
        # 3x3 reflect box filter (matches ops.filters.box_filter_3x3)
        gp = np.pad(grid, ((1, 1), (1, 1), (0, 0)), mode="reflect")
        h, w = grid.shape[:2]
        filtered = sum(
            gp[dy : dy + h, dx : dx + w] for dy in (0, 1, 2) for dx in (0, 1, 2)
        ) / 9.0
        # argmax render, zero-sum cells black
        colors = np.asarray(cfg.LABEL_COLORS, dtype=np.uint8)
        host_map = colors[np.argmax(filtered, axis=2)]
        host_map[filtered.sum(axis=2) == 0] = 0

        agree = float(np.mean(np.all(host_map == device_map, axis=-1)))
        assert agree >= 0.995, f"host/device map agreement only {agree:.4f}"
