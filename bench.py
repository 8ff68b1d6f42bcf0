"""End-to-end throughput benchmark on real TPU hardware.

Measures the full per-frame pipeline at the reference's deployed
configuration — 1440x1920 camera frame -> DeepLabV3+ (ResNeXt50-32x4d,
output stride 8, bf16 conv path) -> argmax -> nearest-resize to full
resolution -> palette colorize -> LiDAR projection + Bayesian BEV grid
fusion (2^17-point bucket) — with every stage on device and the grid
HBM-resident.

Baseline: the reference pipeline needs the rosbag slowed to 0.1x real time
to drop zero frames of the 12 Hz camera on a CUDA workstation
(ref README.md:194, node:236) => ~1.2 frames/s sustained end-to-end.
``vs_baseline`` is measured frames/s divided by that 1.2 fps anchor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 1.2


def main(quick: bool = False):
    import jax

    # persistent compile cache: the os8 DeepLab at full camera resolution
    # takes minutes to compile; cache makes driver re-runs near-instant
    jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.mapping import (
        PCD_ORIGIN_OFFSET,
        SemanticMappingEngine,
        pad_points,
    )
    from vision_semantic_segmentation_tpu.models import deeplab_from_cfg
    from vision_semantic_segmentation_tpu.ops.colormap import apply_color_map
    from vision_semantic_segmentation_tpu.ops.resize import resize_nearest

    cfg = get_cfg_defaults()
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK

    img_h, img_w = (512, 768) if quick else (1440, 1920)
    n_frames = 10 if quick else 50
    rng = np.random.default_rng(0)

    # ---- model + fused seg program ----------------------------------------
    model = deeplab_from_cfg(net_cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, img_h, img_w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    # The 5 mapped classes keep their palette colors; others map to black
    # so the mapping engine ignores them (ref base_cfg.py:47-57).
    seg_palette = np.zeros((19, 3), np.uint8)
    for net_idx, color in zip(cfg.LABELS, cfg.LABEL_COLORS):
        seg_palette[net_idx] = color
    seg_palette = jnp.asarray(seg_palette)

    @jax.jit
    def segment(variables, frame_u8):
        x = frame_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        logits = model.apply(variables, x[None], train=False, upsample_pred=False)
        labels = jnp.argmax(logits, axis=-1)[0].astype(jnp.int32)
        labels = resize_nearest(labels, (img_h, img_w))
        return apply_color_map(labels, seg_palette)

    # ---- mapping engine ----------------------------------------------------
    engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
    grid = engine.init_grid()
    bucket = cfg.MAPPING.POINT_BUCKET

    # synthetic frames: realistic point count in the mapped region
    x0m = 100 - PCD_ORIGIN_OFFSET[0]
    y0m = 800 - PCD_ORIGIN_OFFSET[1]
    frames = []
    for _ in range(3):
        raw = (rng.random((img_h, img_w, 3)) * 255).astype(np.uint8)
        pts = np.vstack(
            [
                rng.uniform(x0m, x0m + 40, 100_000),
                rng.uniform(y0m, y0m + 40, 100_000),
                rng.uniform(-1, 0.5, 100_000),
                rng.uniform(0, 20, 100_000),
            ]
        ).astype(np.float32)
        pcd, valid = pad_points(pts, bucket)
        frames.append(
            (
                jnp.asarray(raw),
                jnp.asarray(pcd),
                jnp.asarray(valid),
                jnp.asarray([x0m - 6.0, y0m + 20.0, 0.0], jnp.float32),
                jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32),
            )
        )

    def run_frame(grid, frame):
        raw, pcd, valid, pos, quat = frame
        semantic_rgb = segment(variables, raw)
        grid, _, _ = engine.step(grid, pcd, valid, semantic_rgb, pos, quat)
        return grid

    # warmup / compile (the small host readback forces real completion:
    # under the axon tunnel runtime block_until_ready alone does not)
    for frame in frames:
        grid = run_frame(grid, frame)
    float(jnp.sum(grid[:2, :2]))

    start = time.perf_counter()
    for i in range(n_frames):
        grid = run_frame(grid, frames[i % len(frames)])
    float(jnp.sum(grid[:2, :2]))  # readback barrier
    elapsed = time.perf_counter() - start

    fps = n_frames / elapsed
    result = {
        "metric": f"e2e_frames_per_sec_{img_h}x{img_w}_seg_plus_fusion",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
