"""Measure host-decode / device-compute overlap of streaming bag replay.

VERDICT r02 #7 done-criterion: measured overlap for the double-buffered
bag decode (`runtime/bag_adapter.py::stream_bag_frames`).  Builds a
synthetic camera-resolution bag, then times on the real chip:

    D  = pure decode (drain stream_bag_frames, no device work)
    C  = pure compute (fused pipeline over pre-decoded frames)
    P  = streaming pipeline (decode worker + device fusion concurrently)

Overlap evidence: P < D + C (perfect overlap -> P ~= max(D, C)).  The
decode worker holds the host core while device dispatches run on the TPU,
so overlap manifests even on this 1-CPU host.

Prints one JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
    import tempfile

    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.mapping import (
        PCD_ORIGIN_OFFSET,
        SemanticMappingEngine,
    )
    from vision_semantic_segmentation_tpu.models.build import build_model
    from vision_semantic_segmentation_tpu.runtime.bag_adapter import (
        stream_bag_frames,
    )
    from vision_semantic_segmentation_tpu.runtime.pipeline import FusedFramePipeline
    from vision_semantic_segmentation_tpu.runtime.replay import MappingReplay
    from vision_semantic_segmentation_tpu.runtime.rosbag import (
        CompressedImageMsg,
        Header,
        PointCloud2Msg,
        PointField,
        PoseStampedMsg,
        write_bag,
    )

    cfg = get_cfg_defaults()
    cfg.MAPPING.BOUNDARY = [[100, 300], [800, 1000]]
    cfg.MAPPING.POINT_BUCKET = 2 ** 16
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK

    # full DeepLab at camera res would dwarf decode; the probe isolates the
    # decode/fusion overlap, so use the Dummy head (fusion still real)
    net_cfg.MODEL.TYPE = "Dummy"
    net_cfg.MODEL.COMPUTE_DTYPE = "float32"

    rng = np.random.default_rng(0)
    n_frames = 24
    img_h, img_w = 1440, 1920
    n_pts = 40000

    x0 = 100 - PCD_ORIGIN_OFFSET[0]
    y0 = 800 - PCD_ORIGIN_OFFSET[1]
    pts = np.vstack([
        rng.uniform(x0, x0 + 40, n_pts),
        rng.uniform(y0, y0 + 40, n_pts),
        rng.uniform(-1, 0.5, n_pts),
        rng.uniform(0, 20, n_pts),
    ]).astype(np.float32)
    fields = [
        PointField("x", 0, 7, 1), PointField("y", 4, 7, 1),
        PointField("z", 8, 7, 1), PointField("intensity", 12, 7, 1),
    ]
    msgs = []
    for i in range(n_frames):
        stamp = 10.0 + i
        img = rng.integers(0, 255, (img_h, img_w, 3), dtype=np.uint8)
        msgs.append(("/reduced_map", PointCloud2Msg(
            Header(0, stamp, "/world"), 1, n_pts, fields, 16,
            np.ascontiguousarray(pts.T).tobytes()), stamp))
        msgs.append(("/current_pose", PoseStampedMsg(
            Header(i, stamp, "/world"),
            np.array([x0 - 6.0, y0 + 20.0, 0.0]),
            np.array([0.0, 0.0, 0.0, 1.0])), stamp))
        # JPEG-compressed frames: the realistic recording format, and the
        # case where per-frame decode (cv2.imdecode, ~40-60 ms at camera
        # res) is worth overlapping with device compute
        import cv2

        ok, enc = cv2.imencode(".jpg", img[:, :, ::-1],
                               [cv2.IMWRITE_JPEG_QUALITY, 90])
        assert ok
        msgs.append(("/camera1/image_raw", CompressedImageMsg(
            Header(i, stamp, "camera1"), "jpeg", enc.tobytes()), stamp))
    bag = tempfile.mktemp(suffix=".bag", prefix="overlap_")
    write_bag(bag, msgs)

    model, *_ = build_model(net_cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img_h, img_w, 3), jnp.float32)
    )
    engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
    pipeline = FusedFramePipeline(cfg, variables, engine=engine, distortion="none")
    replay = MappingReplay(cfg, engine=engine)

    def fuse(frames_iter):
        grid = pipeline.init_grid()
        for chunk in replay._chunk_frames(frames_iter, window=8):
            runner = pipeline.build_sequence_runner(
                camera=chunk[0].camera,
                image_hw=tuple(chunk[0].semantic_image.shape[:2]),
                pcd_frame_id=chunk[0].pcd_frame_id,
            )
            grid = runner(grid, replay._stage(chunk, min_len=1))
        float(jnp.sum(grid[:2, :2]))  # completion barrier
        return grid

    # warm-up: compile the runner once
    warm = list(stream_bag_frames(bag))
    fuse(iter(warm[:8]))

    t0 = time.perf_counter()
    frames = list(stream_bag_frames(bag))
    t_decode = time.perf_counter() - t0

    t0 = time.perf_counter()
    fuse(iter(frames))
    t_compute = time.perf_counter() - t0

    t0 = time.perf_counter()
    fuse(stream_bag_frames(bag))
    t_streamed = time.perf_counter() - t0

    print(json.dumps({
        "frames": n_frames,
        "decode_s": round(t_decode, 2),
        "compute_s": round(t_compute, 2),
        "streamed_s": round(t_streamed, 2),
        "sequential_sum_s": round(t_decode + t_compute, 2),
        "overlap_saved_s": round(t_decode + t_compute - t_streamed, 2),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
