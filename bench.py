"""End-to-end throughput benchmark on real TPU hardware.

Measures the production replay fast path at the reference's deployed
configuration: 1440x1920 camera frames -> DeepLabV3+ (ResNeXt50-32x4d,
output stride 8, bf16 conv path) -> argmax -> distortion-aware LiDAR
projection + Bayesian BEV grid fusion (2^17-point bucket), with a full
window of frames fused in ONE device dispatch (lax.scan) and the grid
HBM-resident throughout (runtime/pipeline.py).

Stages (each timed independently; the whole run never exits non-zero):

  * HEADLINE — the default 2000x2000 @ 0.1 m grid (the r01-comparable
    configuration, metric ``e2e_frames_per_sec_1440x1920_seg_plus_fusion``)
    with lens distortion handled on the projected points.
  * FULLROUTE — the reference's full-route experiment: [[0,1000],[0,1400]] m
    at 0.2 m -> 5000x7000x5 grid (ref README.md:173-177) fused through the
    pose-centered update window.  Runs in a time-boxed SUBPROCESS so a
    slow compile or a backend abort degrades to a ``skipped`` field
    instead of losing the whole artifact (the round-2 failure mode).
  * DUALCAM — camera1 + camera6 windows fused into one grid (the
    reference runs both cameras into one map, ref mapping.py:528-541).
  * PARETO — the ``autotune --serving`` sweep's recommended operating
    point (configs/serving_pareto.json) re-timed live, reported with its
    sweep-measured golden-scene mIoU.

Honesty notes:
  * Every window holds DIFFERENT frames (images and point clouds are
    generated on-device per window with distinct PRNG keys) — no
    re-dispatching one cached window.
  * Lens distortion IS handled, via the engine's distortion-on-points
    mode: the plumb-bob forward model applied to every projected point
    (the reference's full-frame cv2.undistort equivalent measured
    66 ms/frame on TPU — more than the DeepLab forward — so the image
    resample is not the production path; see MIGRATION.md).
  * Frame data is generated in HBM rather than staged from host: this dev
    environment reaches the TPU through a tunnel whose host->device path
    moves ~1-20 MB/s (vs multi-GB/s PCIe on a real TPU host), so staging
    would benchmark the tunnel, not the framework.
  * The timed loop ends with a host readback barrier (block_until_ready
    does not force completion under this runtime).
  * ``warmup_s`` (trace+lower+compile+first run) is reported per stage:
    round 2's artifact was lost to a warm-up that outran the driver
    budget — root cause: closure-captured DEVICE constants cost ~39 s of
    tunnel readback EACH at lowering time; all hot closures now capture
    host numpy, taking full-route lowering from 364 s to 33 s (measured,
    scripts/probe_compile_time.py + ROUND_NOTES r03).

Reported alongside frames/s:
  * ``mfu`` — NOMINAL model FLOPs (grouped convs counted at cin/groups
    cost, i.e. the algorithmic cost, not the block-diagonal dense cost the
    MXU actually executes) / measured step time / device peak.
  * ``forward_ms`` / ``fusion_ms`` — per-stage device times measured with
    separately-jitted stage programs on identical shapes (scanned over the
    window: a single dispatch costs ~30-40 ms of tunnel round-trip).

Baseline: the reference pipeline needs the rosbag slowed to 0.1x real time
to drop zero frames of the 12 Hz camera on a CUDA workstation
(ref README.md:194, node:236) => ~1.2 frames/s sustained end-to-end.
``vs_baseline`` is measured frames/s divided by that 1.2 fps anchor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_FPS = 1.2
# XLA compiles through this environment's tunnel are NONDETERMINISTIC in
# time: the same full-route program has measured 21 s and 450 s on an
# idle machine (ROUND_NOTES r03).  The box must absorb a slow-compile
# draw; on timeout the stage degrades to a "skipped" record with the
# child's progress markers.
FULLROUTE_TIMEOUT_S = 600.0


def _progress(msg: str) -> None:
    """Stage progress to stderr (stdout carries only the one JSON line)."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

# bf16 peak TFLOP/s per chip by device kind (public spec sheets)
PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def nominal_model_flops(
    h: int,
    w: int,
    num_classes: int = 19,
    groups: int = 32,
    base_width: int = 4,
) -> int:
    """Nominal matmul FLOPs of DeepLabV3+ / ResNeXt50-32x4d at output
    stride 8 for one (h, w) frame.

    Grouped/depthwise convs are counted at their algorithmic cost
    (2*HWO*cout*cin/groups*k^2); elementwise/BN work is excluded, per MFU
    convention.  Mirrors the architecture in models/{resnet,aspp,decoder}.py
    (ref models/backbone/resnet.py:124-127, aspp.py:51-93, decoder.py:27-41).
    """
    total = 0

    def conv(hh, ww, cin, cout, k, stride=1, g=1, pad_same=True):
        nonlocal total
        if pad_same:
            ho, wo = math.ceil(hh / stride), math.ceil(ww / stride)
        else:  # valid padding (decoder refine convs, torch default pad=0)
            ho, wo = (hh - k + 1) // stride, (ww - k + 1) // stride
        total += 2 * ho * wo * cout * (cin // g) * k * k
        return ho, wo

    # stem + maxpool
    h2, w2 = conv(h, w, 3, 64, 7, stride=2)
    h4, w4 = math.ceil(h2 / 2), math.ceil(w2 / 2)

    # resnext50_32x4d, os8: layer2 strides, layer3/4 dilate (FLOPs unchanged)
    cin, hw = 64, (h4, w4)
    for planes, blocks, stride in [(64, 3, 1), (128, 4, 2), (256, 6, 1), (512, 3, 1)]:
        width = int(planes * base_width / 64) * groups
        cout = planes * 4
        for b in range(blocks):
            s = stride if b == 0 else 1
            conv(hw[0], hw[1], cin, width, 1)
            nhw = conv(hw[0], hw[1], width, width, 3, stride=s, g=groups)
            conv(nhw[0], nhw[1], width, cout, 1)
            if b == 0:
                conv(hw[0], hw[1], cin, cout, 1, stride=s)  # downsample proj
            hw, cin = nhw, cout
    h8, w8 = hw

    # ASPP: 1x1 branch + 3 separable atrous branches + pooled 1x1 + proj
    conv(h8, w8, 2048, 256, 1)
    for _ in range(3):
        conv(h8, w8, 2048, 2048, 3, g=2048)   # depthwise
        conv(h8, w8, 2048, 256, 1)            # pointwise
    total += 2 * 2048 * 256                   # global-pool branch 1x1
    conv(h8, w8, 5 * 256, 256, 1)             # concat projection

    # decoder at the low-level (os4) resolution; refine convs are valid-pad
    conv(h4, w4, 256, 48, 1)
    dh, dw, dc = h4, w4, 256 + 48
    for ch in (256, 256):
        conv(dh, dw, dc, dc, 3, g=dc, pad_same=False)  # depthwise
        dh, dw = dh - 2, dw - 2
        conv(dh, dw, dc, ch, 1)                        # pointwise
        dc = ch
    conv(dh, dw, dc, num_classes, 1)                   # classifier
    return total


def _time_best(fn, readback, repeats=3):
    """Best-of-N wall time of fn() with a host readback barrier."""
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        out = fn()
        readback(out)
        best = min(best, time.perf_counter() - start)
    return best


def _setup_jax():
    import jax

    # persistent compile cache: makes driver re-runs near-instant (NOTE:
    # the cache skips XLA compile only — tracing/lowering always re-runs,
    # which is why closure constants must stay host-side numpy)
    jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    return jax


def _build_pipeline(cfg, img_h, img_w, distortion):
    import jax
    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.mapping import SemanticMappingEngine
    from vision_semantic_segmentation_tpu.models import deeplab_from_cfg
    from vision_semantic_segmentation_tpu.runtime.pipeline import FusedFramePipeline

    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    model = deeplab_from_cfg(net_cfg, dtype=jnp.bfloat16)
    # ONE AOT-compiled init program at a tiny input (param shapes are
    # independent of H/W): un-jitted init executes ~300 ops eagerly, and
    # each eager dispatch in this environment costs ~0.4 s of per-op
    # compile+round-trip (130-180 s measured); the jit dispatch path's
    # compile machinery is minutes for big programs, so AOT both here
    init_fn = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
        )
    )
    key = jax.random.PRNGKey(0)
    variables = init_fn.lower(key).compile()(key)
    engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
    pipeline = FusedFramePipeline(cfg, variables, engine=engine, distortion=distortion)
    return model, pipeline


def _gen_windows(cfg, pipeline, img_h, img_w, window, n_windows):
    """Distinct on-device frame windows near the grid's lower corner.

    Shares the autotuner's generator (ONE copy of the measurement-input
    discipline); span/inset pinned to the r01-artifact values (40 m
    footprint at +100 m inset) so the metric stays comparable across
    rounds.
    """
    from vision_semantic_segmentation_tpu.runtime.tuning import generate_windows

    return generate_windows(
        cfg, (img_h, img_w), window, n_windows,
        span_m=40.0, origin_inset_m=(100.0, 100.0),
    )


def _run_stage(cfg, img_h, img_w, window, n_windows, distortion):
    """Warm up + time the fused sequence runner; returns (fps, warmup_s)."""
    import jax.numpy as jnp

    _, pipeline = _build_pipeline(cfg, img_h, img_w, distortion)
    _progress(f"pipeline built ({img_h}x{img_w}, window={window})")
    windows = _gen_windows(cfg, pipeline, img_h, img_w, window, n_windows)
    _progress("windows generated")

    # AOT compile (lower+compile up front): the jit dispatch path's
    # compile machinery costs minutes in this environment for the same
    # program (measured 710 s vs 48 s at full-route, ROUND_NOTES r03)
    t0 = time.perf_counter()
    run = pipeline.compile_sequence_runner(
        image_hw=(img_h, img_w), window=window
    )
    _progress("sequence runner AOT-compiled")
    grid = pipeline.init_grid()
    grid = run(grid, windows[0])          # first execution
    float(jnp.sum(grid[:2, :2]))
    warmup_s = time.perf_counter() - t0
    _progress(f"warm-up done in {warmup_s:.1f}s")

    # NOTE: the runner donates the grid buffer — always thread the returned
    # grid forward; re-passing a donated array is a runtime error.
    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for frames in windows:
            grid = run(grid, frames)
        float(jnp.sum(grid[:2, :2]))      # readback barrier
        elapsed = min(elapsed, time.perf_counter() - start)
    fps = (window * n_windows) / elapsed
    return fps, warmup_s, pipeline, windows


def _stage_breakdown(cfg, pipeline, windows, img_h, img_w, window, distortion):
    """forward/fusion per-frame device times on the same shapes."""
    import jax
    import jax.numpy as jnp

    model = pipeline.model
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    table = np.asarray(pipeline.channel_table)
    engine = pipeline.engine

    def forward_one(variables, frame_u8):
        xf = frame_u8.astype(jnp.float32) / 255.0
        xf = (xf - mean) / std
        logits = model.apply(variables, xf[None], train=False, upsample_pred=False)
        net_labels = jnp.argmax(logits, axis=-1)[0].astype(jnp.int32)
        return jnp.asarray(table)[jnp.clip(net_labels, 0, table.shape[0] - 1)]

    def forward_window_impl(variables, images):
        def body(_, frame):
            return 0, forward_one(variables, frame)

        _, chs = jax.lax.scan(body, 0, images)
        return chs

    # AOT (see _run_stage): the jit-dispatch compile path is minutes here
    forward_window = (
        jax.jit(forward_window_impl)
        .lower(pipeline.variables, windows[0]["image"])
        .compile()
    )
    channel_imgs = forward_window(pipeline.variables, windows[0]["image"])
    jax.block_until_ready(channel_imgs)
    t_forward = _time_best(
        lambda: forward_window(pipeline.variables, windows[0]["image"]),
        lambda out: float(jnp.sum(out[:2, :2, :2])),
    ) / window

    pointwise = engine._build_pointwise(
        "camera1", pcd_in_velodyne_frame=False, image_is_class_id=True,
        image_full_hw=(img_h, img_w),
        distorted_image=(distortion == "points"),
    )
    apply_update = engine._build_update()

    def fusion_window_impl(grid, pcds, valids, chs, positions, quaternions):
        def body(g, frame):
            pcd, valid, ch, pos, quat = frame
            cell, cls, vis, upd, _ = pointwise(pcd, valid, ch, pos, quat)
            return apply_update(g, cell, cls, pcd[3], upd), None

        grid, _ = jax.lax.scan(
            body, grid, (pcds, valids, chs, positions, quaternions)
        )
        return grid

    fargs = (
        windows[0]["pcd"], windows[0]["valid"], channel_imgs,
        windows[0]["position"], windows[0]["quaternion"],
    )
    fusion_window = (
        jax.jit(fusion_window_impl)
        .lower(pipeline.init_grid(), *fargs)
        .compile()
    )
    fgrid = fusion_window(pipeline.init_grid(), *fargs)
    jax.block_until_ready(fgrid)
    t_fusion = _time_best(
        lambda: fusion_window(fgrid, *fargs),
        lambda out: float(jnp.sum(out[:2, :2])),
    ) / window
    return t_forward, t_fusion


def run_headline(quick: bool) -> dict:
    jax = _setup_jax()

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()  # default 2000x2000 @ 0.1 m grid (r01 headline)
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    img_h, img_w = (512, 768) if quick else (1440, 1920)
    window = 4 if quick else 16
    n_windows = 2 if quick else 4
    # Lens distortion is handled on the POINTS (plumb-bob forward model on
    # ~1e5 projections) rather than by resampling the 2.7M-pixel frame: the
    # image remap measured 66 ms/frame on v5e — more than the DeepLab
    # forward itself.  Quick mode's reduced frames don't match the
    # 1920x1440 calibration, so they run pinhole.
    distortion = "none" if quick else "points"

    fps, warmup_s, pipeline, windows = _run_stage(
        cfg, img_h, img_w, window, n_windows, distortion
    )
    t_forward, t_fusion = _stage_breakdown(
        cfg, pipeline, windows, img_h, img_w, window, distortion
    )

    kind = jax.devices()[0].device_kind
    peak = PEAK_TFLOPS.get(kind)
    peak_assumed = peak is None
    if peak is None:
        peak = 197.0  # assume v5e-class if unknown
    flops = nominal_model_flops(img_h, img_w, net_cfg.DATASET.NUM_CLASSES)
    mfu = (flops * fps) / (peak * 1e12)

    return {
        # r01-comparable metric name (VERDICT r02: keep artifact names
        # stable across rounds); distortion handling is extra work vs r01
        "metric": f"e2e_frames_per_sec_{img_h}x{img_w}_seg_plus_fusion",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "step_ms": round(1000.0 / fps, 2),
        "forward_ms": round(t_forward * 1000.0, 2),
        "fusion_ms": round(t_fusion * 1000.0, 2),
        "warmup_s": round(warmup_s, 1),
        "mfu": round(mfu, 4),
        "nominal_gflops_per_frame": round(flops / 1e9, 1),
        "device_kind": kind,
        "peak_tflops": peak,
        "peak_assumed": peak_assumed,
        "distortion": distortion,
        "grid": "2000x2000@0.1m",
        "distinct_windows": n_windows,
    }


def _camera_pose_for_span(engine, camera: str, x0m, y0m, span):
    """A vehicle pose whose ``camera`` wedge sees the frame span.

    The window generator's default pose faces camera 1 at the span; other
    cameras are mounted differently (camera 6 looks ~90 deg left, ref
    camera.py:120-135), so search vehicle (side, yaw) candidates and keep
    the one whose projection puts the most span points in-image and
    in-range — pure host numpy against the camera's real P/extrinsics.
    """
    from vision_semantic_segmentation_tpu.geometry.transforms import (
        pose_to_matrix,
    )
    from vision_semantic_segmentation_tpu.mapping.engine import (
        velodyne_to_baselink,
    )

    cam = engine.cameras[camera]
    P = np.asarray(cam.P, np.float64)
    w, h = cam.im_size
    T_v2b = velodyne_to_baselink()
    rng = np.random.default_rng(0)
    pts = np.stack([
        rng.uniform(x0m, x0m + span, 512),
        rng.uniform(y0m, y0m + span, 512),
        rng.uniform(-1.0, 0.5, 512),
    ])
    cx, cy = x0m + span / 2.0, y0m + span / 2.0
    d = span / 2.0 + 6.0
    sides = [(cx - d, cy), (cx + d, cy), (cx, cy - d), (cx, cy + d)]
    best = (-1, None, None)
    for px, py in sides:
        for yaw in np.arange(8) * (np.pi / 4):
            pos = np.asarray([px, py, 0.0], np.float32)
            quat = np.asarray(
                [0, 0, np.sin(yaw / 2), np.cos(yaw / 2)], np.float32
            )
            T_b2o = np.asarray(pose_to_matrix(pos, quat), np.float64)
            T_o2v = np.linalg.inv(T_b2o @ T_v2b)
            xyz_v = T_o2v[:3, :3] @ pts + T_o2v[:3, 3:4]
            proj = P @ np.vstack([xyz_v, np.ones(pts.shape[1])])
            z = np.where(proj[2] == 0, 1e-9, proj[2])
            u, v = proj[0] / z, proj[1] / z
            vis = (
                (xyz_v[0] > 0) & (xyz_v[0] < engine.range_max)
                & (u >= 0) & (u < w) & (v >= 0) & (v < h)
            )
            if int(vis.sum()) > best[0]:
                best = (int(vis.sum()), pos, quat)
    return best


def run_dualcam() -> dict:
    """Dual-camera fusion on the real chip (VERDICT r03 #6): camera1 AND
    camera6 frame windows fused into ONE HBM grid, each through its own
    compiled runner with its own calibration/distortion (the reference
    runs both cameras into one map, ref mapping.py:528-541).
    """
    jax = _setup_jax()
    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.mapping import PCD_ORIGIN_OFFSET
    from vision_semantic_segmentation_tpu.runtime.tuning import (
        generate_windows,
    )

    cfg = get_cfg_defaults()
    img_h, img_w = 1440, 1920
    window, n_windows = 8, 2  # per camera: 32 frames total per timed pass
    _, pipeline = _build_pipeline(cfg, img_h, img_w, "points")
    engine = pipeline.engine
    _progress("dualcam pipeline built")

    (bx0, bx1), (by0, by1) = cfg.MAPPING.BOUNDARY
    span = 40.0
    x0m = bx0 + 100.0 - float(PCD_ORIGIN_OFFSET[0])
    y0m = by0 + 100.0 - float(PCD_ORIGIN_OFFSET[1])

    win1 = generate_windows(
        cfg, (img_h, img_w), window, n_windows,
        span_m=span, origin_inset_m=(100.0, 100.0),
    )
    n_vis6, pos6, quat6 = _camera_pose_for_span(
        engine, "camera6", x0m, y0m, span
    )
    _progress(f"camera6 pose found ({n_vis6}/512 span points visible)")
    win6 = generate_windows(
        cfg, (img_h, img_w), window, n_windows, seed=200,
        span_m=span, origin_inset_m=(100.0, 100.0),
        vehicle_pose=(pos6, quat6),
    )

    t0 = time.perf_counter()
    run1 = pipeline.compile_sequence_runner(
        camera="camera1", image_hw=(img_h, img_w), window=window
    )
    run6 = pipeline.compile_sequence_runner(
        camera="camera6", image_hw=(img_h, img_w), window=window
    )
    grid = pipeline.init_grid()
    grid = run1(grid, win1[0])
    grid = run6(grid, win6[0])
    float(jnp.sum(grid[:2, :2]))
    warmup_s = time.perf_counter() - t0
    _progress(f"dualcam warm-up done in {warmup_s:.1f}s")

    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for w1, w6 in zip(win1, win6):
            grid = run1(grid, w1)
            grid = run6(grid, w6)
        float(jnp.sum(grid[:2, :2]))
        elapsed = min(elapsed, time.perf_counter() - start)
    total_frames = 2 * window * n_windows
    fps = total_frames / elapsed
    return {
        "metric": "e2e_frames_per_sec_dualcam_1440x1920",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "step_ms": round(1000.0 / fps, 2),
        "warmup_s": round(warmup_s, 1),
        "cameras": ["camera1", "camera6"],
        "camera6_span_visibility": f"{n_vis6}/512",
        "grid": "2000x2000@0.1m",
        "device_kind": jax.devices()[0].device_kind,
    }


PARETO_JSON = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "configs", "serving_pareto.json"
)


def run_pareto() -> dict:
    """Serving-Pareto recommended operating point (VERDICT r03 #1).

    ``autotune --serving`` sweeps backbone x OUTPUT_STRIDE x IMAGE_SCALE
    x UPSAMPLE_PRED on this hardware: every point timed through the real
    fused runner on-device AND scored for golden-scene map mIoU with a
    per-point trained network (runtime/serving_pareto.py).  This stage
    reads the sweep's artifact (configs/serving_pareto.json, produced by
    scripts/run_serving_sweep.py; if absent the parent emits
    ``"pareto": {"skipped": ...}`` instead of running this stage),
    re-times the RECOMMENDED point's fused runner live and reports it
    next to the sweep-measured quality (quality needs trained weights
    and a ~2 h sweep, so it is not re-scored per bench run).  Mirrors
    the reference's own deployment knob (ref base_cfg.py:91).
    """
    jax = _setup_jax()

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.runtime.serving_pareto import (
        sweep_fps,
    )

    with open(PARETO_JSON) as f:
        sweep = json.load(f)
    rec = sweep["recommended"]
    point = {
        k: rec[k]
        for k in ("backbone", "output_stride", "image_scale", "upsample_pred")
    }
    _progress(f"pareto recommended point: {point}")
    row = sweep_fps(
        get_cfg_defaults(), [point], image_hw=(1440, 1920),
        window=16, n_windows=2, repeats=3, log=_progress,
    )[0]
    return {
        "metric": "serving_pareto_recommended_fps_1440x1920",
        "value": row["fps"],
        "unit": "frames/s",
        "vs_baseline": round(row["fps"] / BASELINE_FPS, 2),
        "point": point,
        "warmup_s": row["warmup_s"],
        "miou_sweep": rec.get("miou"),
        "anchor_miou": sweep.get("anchor_miou"),
        "quality_budget": sweep.get("quality_budget"),
        "sweep_fps": rec.get("fps"),
        "device_kind": jax.devices()[0].device_kind,
    }


def run_fullroute() -> dict:
    """The full-route 5000x7000 stage (invoked as a subprocess)."""
    _setup_jax()
    import jax

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.MAPPING.BOUNDARY = [[0, 1000], [0, 1400]]
    cfg.MAPPING.RESOLUTION = 0.2
    cfg.MAPPING.UPDATE_WINDOW = 1200  # >= 2.2 * RANGE_MAX / RESOLUTION
    img_h, img_w = 1440, 1920
    window, n_windows = 16, 4
    fps, warmup_s, _, _ = _run_stage(cfg, img_h, img_w, window, n_windows, "points")
    return {
        "metric": "e2e_frames_per_sec_1440x1920_fullroute5000x7000",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "step_ms": round(1000.0 / fps, 2),
        "warmup_s": round(warmup_s, 1),
        "grid": "5000x7000@0.2m_window1200",
        "device_kind": jax.devices()[0].device_kind,
    }


def _stage_subprocess(flag: str, timeout_s: float) -> dict:
    """Run one bench stage time-boxed in a child process.

    The tunnel's compile/first-run latency is nondeterministic (measured
    21 s to 450 s for identical programs, plus occasional multi-minute
    first-execution hangs); a child process bounds the damage to
    ``timeout_s`` and surfaces the child's progress markers on timeout.
    """
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired as exc:
        stderr = exc.stderr
        if isinstance(stderr, bytes):
            stderr = stderr.decode(errors="replace")
        return {
            "skipped": f"timeout after {timeout_s:.0f}s",
            "progress": (stderr or "")[-300:],
        }
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    return {
        "skipped": f"rc={proc.returncode}",
        "tail": (proc.stderr or proc.stdout or "")[-400:],
    }


def _stage_with_retry(flag: str, deadline: float, box_s: float = None) -> dict:
    """Attempt a stage up to twice within the remaining wall budget.

    ``box_s`` overrides the per-attempt box (default FULLROUTE_TIMEOUT_S);
    the LAST stage can afford a bigger box since nothing queues behind it
    (r05: a 508 s compile-service warm-up draw left the pareto stage ~90 s
    of its 600 s box — it passed, but without margin).
    """
    result = {}
    for attempt in range(2):
        remaining = deadline - time.monotonic()
        if remaining < 120.0:
            result.setdefault("skipped", "wall budget exhausted")
            return result
        result = _stage_subprocess(flag, min(box_s or FULLROUTE_TIMEOUT_S, remaining))
        if "skipped" not in result:
            return result
        _progress(f"{flag} attempt {attempt + 1} failed: {result.get('skipped')}")
    return result


def main(quick: bool = False) -> None:
    """ONE JSON line, rc 0, always.

    Both heavy stages run as time-boxed subprocesses with one retry under
    a total wall budget — a compile-service hang can degrade a stage to a
    ``skipped`` record but can never lose the artifact.
    """
    if quick:
        # same subprocess box as the heavy stages: a dead tunnel hangs
        # backend INIT (no exception to catch), so in-process try/except
        # alone cannot guarantee the JSON line
        out = _stage_with_retry("--stage-quick", time.monotonic() + 1200.0)
        if "skipped" in out:
            out = {
                "metric": "e2e_frames_per_sec_512x768_seg_plus_fusion",
                "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
                "error": out.get("skipped", "quick stage failed"),
                "progress": out.get("progress", "") or out.get("tail", ""),
            }
        print(json.dumps(out))
        return

    deadline = time.monotonic() + 3000.0  # total wall budget (4 boxed stages)
    out = _stage_with_retry("--stage-headline", deadline)
    if "skipped" in out:
        out = {
            "metric": "e2e_frames_per_sec_1440x1920_seg_plus_fusion",
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "error": out.get("skipped", "headline stage failed"),
            "progress": out.get("progress", "") or out.get("tail", ""),
        }
    out["fullroute"] = _stage_with_retry("--stage-fullroute", deadline)
    out["dualcam"] = _stage_with_retry("--stage-dualcam", deadline)
    if os.path.exists(PARETO_JSON):
        out["pareto"] = _stage_with_retry("--stage-pareto", deadline, box_s=900.0)
    else:
        # the artifact's absence must be self-describing, not silent
        out["pareto"] = {
            "skipped": "configs/serving_pareto.json absent — run "
                       "scripts/run_serving_sweep.py (or autotune --serving)"
        }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--stage-fullroute" in sys.argv:
        # child entry: print the stage dict as one JSON line (errors land
        # on stderr; the parent degrades them to a skipped field)
        print(json.dumps(run_fullroute()))
    elif "--stage-dualcam" in sys.argv:
        print(json.dumps(run_dualcam()))
    elif "--stage-pareto" in sys.argv:
        print(json.dumps(run_pareto()))
    elif "--stage-headline" in sys.argv:
        print(json.dumps(run_headline(False)))
    elif "--stage-quick" in sys.argv:
        print(json.dumps(run_headline(True)))
    else:
        main(quick="--quick" in sys.argv)
