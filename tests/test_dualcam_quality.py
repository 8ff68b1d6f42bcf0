"""Dual-camera map QUALITY on the synthetic scene (VERDICT r04 #6).

The reference's reason for running two cameras is COVERAGE of one shared
map (ref mapping.py:528-541: get_extrinsics resolves BOTH camera frames;
ref vision_semantic_segmentation_node.py subscribes camera1 and camera6).
Measured through the real calibrations (base_link frame, +x forward,
+y left):

    camera1 ground wedge: azimuth [-13.5 deg, +42.1 deg]
    camera6 ground wedge: azimuth [-40.4 deg, +16.6 deg]

Together they span ~82.5 deg.  At a 5-yaw pose lattice (72 deg apart)
camera1 alone leaves a ~16-26 deg uncovered wedge per yaw; camera6 fills
it.  This module drives the real MappingNode twice over identical
frames — once camera1-only, once with both cameras — using PERFECT
semantic images (the scene rendered directly in map label colors, no
network in the loop, so the measured difference is pure geometry/fusion)
and gates that the second camera BUYS map quality: higher mIoU, lower
missing rate, and a pinned dual-camera floor.

The fps side of dual-camera serving is bench.py's dualcam stage; this is
its quality counterpart in the suite.
"""
import numpy as np
import pytest

from vision_semantic_segmentation_tpu.evaluation.map_eval import MapEvaluator
from vision_semantic_segmentation_tpu.evaluation.synthetic_scene import (
    apply_scene_mapping_cfg,
    make_point_map,
    pose as scene_pose,
    render_frame,
    scene_network_cfg,
    write_ground_truth,
)
from vision_semantic_segmentation_tpu.geometry.camera import (
    camera_setup_1,
    camera_setup_6,
)
from vision_semantic_segmentation_tpu.runtime.bus import TopicBus
from vision_semantic_segmentation_tpu.runtime.node import MappingNode

# scene class -> MAP label color (cfg.LABEL_COLORS rows for road /
# crosswalk / lane); background and sky render black = unmatched in
# colors_to_labels -> contributes no evidence
MAP_PALETTE = np.array(
    [[0, 0, 0], [128, 64, 128], [140, 140, 200], [255, 255, 255], [0, 0, 0]],
    dtype=np.uint8,
)

# 9 viewpoints (10 m lattice — every cell within ~7.1 m of one, and the
# ~5.8 m near-blind disk of each viewpoint inside a neighbor's 12 m
# range) x 5 yaws: yaw sectors 72 deg apart (> camera1's 55.6 deg
# wedge, < the 82.5 deg two-camera union — the single-camera map HAS
# azimuthal gaps and the dual map does not, by construction)
VIEWPOINTS = [
    (110, 810), (110, 830), (130, 810), (130, 830), (120, 820),
    (120, 810), (120, 830), (110, 820), (130, 820),
]
N_YAWS = 5

CAMS = {"camera1": camera_setup_1(), "camera6": camera_setup_6()}


@pytest.fixture(scope="module")
def dualcam_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("dualcam")
    gt_dir = root / "gt"
    gt_dir.mkdir()
    write_ground_truth(str(gt_dir))

    poses = [
        scene_pose(mx, my, yaw=k * 2 * np.pi / N_YAWS)
        for mx, my in VIEWPOINTS
        for k in range(N_YAWS)
    ]
    pcd = make_point_map()
    # perfect semantic frames per camera (scale=4: <= 4 px edge error
    # ~4 cm on the ground, well under the 20 cm cell)
    frames = {
        cam: [
            render_frame(p, q, scale=4, cam=calib, palette=MAP_PALETTE)[0]
            for p, q in poses
        ]
        for cam, calib in CAMS.items()
    }
    return {
        "gt_dir": str(gt_dir),
        "root": root,
        "poses": poses,
        "pcd": pcd,
        "frames": frames,
    }


def _run_mapping(scene, cameras, out_name):
    cfg = apply_scene_mapping_cfg(scene_network_cfg())
    cfg.TASK_NAME = out_name
    cfg.OUTPUT_DIR = str(scene["root"] / "out")
    bus = TopicBus()
    node = MappingNode(cfg, bus)
    for i, (position, quaternion) in enumerate(scene["poses"]):
        stamp = float(i)
        bus.publish(
            "/reduced_map", scene["pcd"], stamp=stamp, frame_id="world"
        )
        bus.publish("/current_pose", (position, quaternion), stamp=stamp)
        for cam in cameras:
            bus.publish(
                f"/{cam}/semantic", scene["frames"][cam][i],
                stamp=stamp, frame_id=cam,
            )
    color_map = node.finalize()
    assert node.dropped_frames == 0
    assert node.fused_frames == len(scene["poses"]) * len(cameras)
    return MapEvaluator(ground_truth_dir=scene["gt_dir"]).test_single_map(
        color_map, verbose=False
    )


class TestDualCameraQuality:
    def test_camera6_buys_map_quality(self, dualcam_scene):
        """Identical drive, identical fusion, one extra camera: the dual
        map must beat the single-camera map on mIoU AND missing rate,
        and clear an absolute floor.  Floors pinned from measurement
        (see values in the asserts; margins for library drift)."""
        single = _run_mapping(dualcam_scene, ("camera1",), "dual_single")
        dual = _run_mapping(
            dualcam_scene, ("camera1", "camera6"), "dual_both"
        )
        for name, r in (("single", single), ("dual", dual)):
            print(
                f"{name}: miou={r['miou']:.4f} iou={r['iou']} "
                f"missing={r['missing_rate']:.4f}"
            )

        # the second camera must add, not merely not-hurt: the 5-yaw
        # lattice leaves camera1-only wedges unobserved by construction.
        # Measured: single miou 0.8885 (missing 0.0898), dual miou 0.9846
        # (missing 0.0017) — camera6 buys +0.096 miou on this drive.
        assert dual["miou"] > single["miou"] + 0.05, (single, dual)
        assert dual["missing_rate"] < single["missing_rate"] / 2, (
            single, dual,
        )
        for cls in ("road", "crosswalk", "lane"):
            assert dual["iou"][cls] >= single["iou"][cls] - 0.005, (
                cls, single, dual,
            )

        # absolute dual-camera floor (perfect semantics: residual error
        # is pose-lattice coverage + label quantization at cell edges;
        # measured road 0.9699, crosswalk 0.9988, lane 0.9851 — margins
        # for library drift)
        assert dual["iou"]["road"] >= 0.94, dual
        assert dual["iou"]["crosswalk"] >= 0.96, dual
        assert dual["iou"]["lane"] >= 0.94, dual
        assert dual["missing_rate"] <= 0.01, dual
