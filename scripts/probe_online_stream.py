"""Production-online composition: streamed bag decode + fused node
(VERDICT r04 #7).

The r04 zero-drop 12 Hz measurement (probe_online_device.py) removed the
transport: frames lived in HBM.  This probe puts the WHOLE production
feed path back in the loop — a compressed ROS .bag (JPEG camera frames,
PointCloud2 clouds, poses), host JPEG decode, nearest-stamp sync, the
fused single-dispatch node — and measures what actually binds on this
host, in three parts:

  1. decode-only: cv2.imdecode throughput of the bag's frames on this
     one-core host (is 12 Hz decode even possible here?);
  2. ``run_online(fused=True)`` with INLINE decode (play_bag_timed:
     decode on the pacing thread — the naive feed);
  3. ``run_online(fused=True, decode_ahead=True)`` (play_stream_timed:
     decode + sync on a worker thread via stream_bag_frames, pacing
     thread publishes pre-decoded arrays — the production feed).

Plus the per-frame fused step cost measured directly (host-side wall
time of one upload+dispatch+barrier through the dev tunnel), from which
the max sustainable camera rate ON THIS TRANSPORT is derived.  Through
the dev tunnel the 8.3 MB frame upload (~1-20 MB/s link) — not decode,
not compute — is expected to bind; the JSON says which it was.

Usage: probe_online_stream.py [--hz HZ] [--horizon S] [--quality Q]
                              [--rate R] [--bag PATH [--build-bag]]
Prints one JSON line.  Two-step use on the tunnel (the scene render is
eager jnp; per-op dispatch RTTs make the in-process build pathologically
slow on the TPU backend): build the bag CPU-side first, then probe —

    JAX_PLATFORMS=cpu python scripts/probe_online_stream.py \
        --bag /tmp/stream_probe.bag --build-bag
    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/probe_online_stream.py --bag /tmp/stream_probe.bag
"""
from __future__ import annotations

import json
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def build_bag(path: str, hz: float, horizon_s: float, quality: int):
    """Compressed synthetic bag: 24 distinct full-res JPEG frames cycled
    at ``hz`` for ``horizon_s``, clouds at 1 Hz, poses at ``hz``."""
    import cv2

    from vision_semantic_segmentation_tpu.evaluation.synthetic_scene import (
        make_point_map,
        pose as scene_pose,
        render_frame,
    )
    from vision_semantic_segmentation_tpu.runtime.rosbag import (
        CompressedImageMsg,
        Header,
        PointCloud2Msg,
        PointField,
        PoseStampedMsg,
        write_bag,
    )

    n_frames = 24
    rng = np.random.default_rng(7)
    poses = [
        scene_pose(120, 820, yaw=k * 2 * np.pi / n_frames)
        for k in range(n_frames)
    ]
    jpegs = []
    for position, quaternion in poses:
        img, _ = render_frame(position, quaternion, scale=4)
        # sensor noise: flat synthetic colors JPEG-decode unrealistically
        # fast; noise pushes the bitstream toward a real camera's
        noisy = np.clip(
            img.astype(np.int16) + rng.integers(-12, 13, img.shape), 0, 255
        ).astype(np.uint8)
        ok, buf = cv2.imencode(
            ".jpg", noisy[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality]
        )
        assert ok
        jpegs.append(buf.tobytes())

    pcd = make_point_map()
    fields = [
        PointField("x", 0, 7, 1), PointField("y", 4, 7, 1),
        PointField("z", 8, 7, 1), PointField("intensity", 12, 7, 1),
    ]
    cloud_payload = np.ascontiguousarray(pcd.T).tobytes()

    msgs = []
    n_msgs = int(horizon_s * hz)
    for k in range(n_msgs):
        t = k / hz
        i = k % n_frames
        if k % max(1, round(hz)) == 0:  # clouds at ~1 Hz like a real reduced_map
            msgs.append((
                "/reduced_map",
                PointCloud2Msg(
                    Header(0, t, "/world"), 1, pcd.shape[1], fields, 16,
                    cloud_payload,
                ),
                t,
            ))
        msgs.append((
            "/current_pose",
            PoseStampedMsg(Header(0, t, "/world"), poses[i][0], poses[i][1]),
            t,
        ))
        msgs.append((
            "/avt_cameras/camera1/image_color/compressed",
            CompressedImageMsg(Header(0, t, "camera1"), "jpeg", jpegs[i]),
            t,
        ))
    # trailing cloud+pose so the last images' lookahead window closes
    t_end = horizon_s + 1.0
    msgs.append((
        "/reduced_map",
        PointCloud2Msg(
            Header(0, t_end, "/world"), 1, pcd.shape[1], fields,
            16, cloud_payload,
        ),
        t_end,
    ))
    msgs.append((
        "/current_pose",
        PoseStampedMsg(Header(0, t_end, "/world"), poses[0][0], poses[0][1]),
        t_end,
    ))
    write_bag(path, msgs)
    return jpegs, n_msgs


def main() -> None:
    argv = sys.argv[1:]

    def arg(name, default, cast=float):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    hz = arg("--hz", 12.0)
    horizon_s = arg("--horizon", 8.0)
    quality = arg("--quality", 90, int)
    rate = arg("--rate", 1.0)
    bag_arg = arg("--bag", None, str)

    import cv2
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.mapping.engine import (
        SemanticMappingEngine,
    )
    from vision_semantic_segmentation_tpu.runtime.async_bus import run_online
    from vision_semantic_segmentation_tpu.runtime.pipeline import (
        FusedFramePipeline,
    )
    from vision_semantic_segmentation_tpu.runtime.tuning import init_variables

    if "--build-bag" in argv and bag_arg and osp.exists(bag_arg):
        # an explicit rebuild request wins over reuse (parameters may
        # have changed); without this, --build-bag on an existing path
        # silently reused the stale bag and ran the full probe instead
        os.remove(bag_arg)
    if bag_arg and osp.exists(bag_arg):
        # Reuse a prebuilt bag.  Build it in a CPU-only process first
        # (JAX_PLATFORMS=cpu probe_online_stream.py --bag P --build-bag):
        # the scene render is eager jnp, and through the TPU tunnel every
        # op pays a dispatch round trip — the in-process build measured
        # 17+ min of mostly idle wall where the CPU build takes ~1 min.
        from vision_semantic_segmentation_tpu.runtime.rosbag import (
            RosbagReader,
        )

        bag_path = bag_arg
        payloads = [
            m.message.data
            for m in RosbagReader(bag_path).read_messages(
                topics=["/avt_cameras/camera1/image_color/compressed"]
            )
        ]
        n_images = len(payloads)
        jpegs = list(dict.fromkeys(payloads))  # distinct, in order
        print(f"reusing prebuilt bag {bag_path} ({n_images} images, "
              f"{len(jpegs)} distinct)", flush=True)
    else:
        bag_path = bag_arg or osp.join(
            tempfile.mkdtemp(prefix="stream_probe_"), "stream.bag"
        )
        print(f"writing compressed bag ({hz:g} Hz x {horizon_s:g}s)...",
              flush=True)
        jpegs, n_images = build_bag(bag_path, hz, horizon_s, quality)
        if "--build-bag" in argv:
            print(f"bag built at {bag_path}; exiting (--build-bag)",
                  flush=True)
            return
    bag_mb = osp.getsize(bag_path) / 1e6

    # -- 1. decode-only throughput on this host ----------------------------
    bufs = [np.frombuffer(j, np.uint8) for j in jpegs]
    cv2.imdecode(bufs[0], cv2.IMREAD_COLOR)  # warm the decoder
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        for b in bufs:
            cv2.imdecode(b, cv2.IMREAD_COLOR)[..., ::-1]
    decode_ms = (time.perf_counter() - t0) / (reps * len(bufs)) * 1e3
    decode_hz = 1e3 / decode_ms
    print(f"decode: {decode_ms:.1f} ms/frame = {decode_hz:.1f} Hz "
          f"({'NOT ' if decode_hz >= hz else ''}decode-bound at {hz:g} Hz)",
          flush=True)

    # -- shared engine/pipeline (same programs both runs) ------------------
    cfg = get_cfg_defaults()
    cfg.MAPPING.POINT_BUCKET = 2 ** 16
    cfg.VISION_SEM_SEG.UNDISTORT = True  # production points-mode path
    variables = init_variables(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK)
    engine = SemanticMappingEngine(cfg)
    pipeline = FusedFramePipeline(
        cfg, variables, engine=engine, distortion="points"
    )

    # warm compile AND the dispatch path (first executions of an AOT
    # program run a slow path — r04 finding; 12 throwaway dispatches)
    img0 = cv2.imdecode(bufs[0], cv2.IMREAD_COLOR)[..., ::-1].copy()
    from vision_semantic_segmentation_tpu.evaluation.synthetic_scene import (
        make_point_map,
        pose as scene_pose,
    )

    # the node pads/clips the cloud to MAPPING.POINT_BUCKET (static jit
    # shapes — mapping/engine.py pad_points); warming with the UNPADDED
    # cloud warms a DIFFERENT program, and the node's own program then
    # compiles inside the first timed run (first version of this probe:
    # inline run mapped 2/96 while it paid node-program compile + the
    # slow first dispatches; the next run inherited them warm)
    from vision_semantic_segmentation_tpu.mapping.engine import pad_points

    pcd0, valid0 = pad_points(
        make_point_map().astype(np.float32), engine.point_bucket
    )
    p0, q0 = scene_pose(120, 820, 0.0)
    print("compiling + warming the fused program...", flush=True)
    t0 = time.perf_counter()
    grid = pipeline.init_grid()
    grid, _ = pipeline.step(
        grid, img0, pcd0, valid0, p0, q0, camera="camera1"
    )
    # block_until_ready does NOT force completion through the tunnel
    # (CLAUDE.md) — a small host readback is the only real barrier
    float(jnp.sum(grid[:, :2, :2]))
    warmup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(12):
        grid, _ = pipeline.step(
            grid, img0, pcd0, valid0, p0, q0, camera="camera1"
        )
    float(jnp.sum(grid[:, :2, :2]))
    step_ms = (time.perf_counter() - t0) / 12 * 1e3
    max_hz_transport = 1e3 / step_ms
    print(f"fused step incl. frame upload through the tunnel: "
          f"{step_ms:.0f} ms -> max {max_hz_transport:.2f} Hz on this "
          f"transport (warmup {warmup_s:.0f}s)", flush=True)

    # -- 2 & 3. run_online at rate, inline vs decode-ahead ------------------
    runs = {}
    for label, ahead in (("inline_decode", False), ("decode_ahead", True)):
        print(f"run_online fused=True decode_ahead={ahead} "
              f"rate={rate:g}...", flush=True)
        report = run_online(
            cfg, bag_path, rate=rate, engine=engine, pipeline=pipeline,
            finalize=False, fused=True, decode_ahead=ahead,
        )
        mapped = sum(
            n for t, n in report.processed.items() if "image_raw" in t
        )
        runs[label] = {
            "published": report.published,
            "mapped": mapped,
            "drops": report.drops,
            "dropped_total": report.dropped_total,
            "max_lag_s": round(report.max_lag_s, 3),
            "wall_s": round(report.wall_duration_s, 2),
            "sustained_hz": round(
                mapped / max(report.wall_duration_s, 1e-9), 2
            ),
        }
        print(f"  {label}: {runs[label]}", flush=True)

    bound = (
        "decode" if decode_hz < hz * rate
        else ("transport" if max_hz_transport < hz * rate else "none")
    )
    result = {
        "metric": "online_streamed_bag_hz",
        "camera_hz": hz,
        "rate": rate,
        "images_in_bag": n_images,
        "bag_mb": round(bag_mb, 1),
        "jpeg_quality": quality,
        "decode_ms_per_frame": round(decode_ms, 1),
        "decode_hz": round(decode_hz, 1),
        "fused_step_ms_with_upload": round(step_ms, 1),
        "max_hz_on_this_transport": round(max_hz_transport, 2),
        "binding_constraint": bound,
        "warmup_s": round(warmup_s, 1),
        **runs,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
