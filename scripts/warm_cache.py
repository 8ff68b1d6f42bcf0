"""Pre-warm the persistent compile cache for every driver-facing program.

The compile service behind the axon tunnel draws 20 s - 19 min for the
SAME program (ROUND_NOTES r03); warming the cache at round start makes
the driver's bench and compile-check near-instant and immune to slow
draws.  AOT-compiles, in order:

    1. the driver's entry() forward (512x512),
    2. the quick-bench runner (512x768),
    3. the headline runner (1440x1920, 2000^2 dense),
    4. the full-route runner (1440x1920, 5000x7000 windowed),
    5. the dual-camera runners (camera1 + camera6, window=8),
    6. the serving-Pareto recommended point's runner (when
       configs/serving_pareto.json exists).

Run with:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/warm_cache.py
Prints one line per program with its compile seconds.
"""
from __future__ import annotations

import time


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import sys

    sys.path.insert(0, "/root/repo")
    import jax.numpy as jnp

    import bench
    import __graft_entry__ as g
    from vision_semantic_segmentation_tpu.config import get_cfg_defaults

    t0 = time.perf_counter()
    fn, args = g.entry()
    jax.jit(fn).lower(*args).compile()
    print(f"entry forward: {time.perf_counter() - t0:.1f}s", flush=True)

    for name, (h, w, window, fullroute) in {
        "quick": (512, 768, 4, False),
        "headline": (1440, 1920, 16, False),
        "fullroute": (1440, 1920, 16, True),
    }.items():
        cfg = get_cfg_defaults()
        if fullroute:
            cfg.MAPPING.BOUNDARY = [[0, 1000], [0, 1400]]
            cfg.MAPPING.RESOLUTION = 0.2
            cfg.MAPPING.UPDATE_WINDOW = 1200
        distortion = "none" if name == "quick" else "points"
        t0 = time.perf_counter()
        _, pipeline = bench._build_pipeline(cfg, h, w, distortion)
        pipeline.compile_sequence_runner(image_hw=(h, w), window=window)
        print(f"{name} runner: {time.perf_counter() - t0:.1f}s", flush=True)

    # the dual-camera stage (bench --stage-dualcam): window=8 runners for
    # BOTH cameras (distinct programs: calibration constants + window size)
    cfg = get_cfg_defaults()
    t0 = time.perf_counter()
    _, pipeline = bench._build_pipeline(cfg, 1440, 1920, "points")
    for camera in ("camera1", "camera6"):
        pipeline.compile_sequence_runner(
            camera=camera, image_hw=(1440, 1920), window=8
        )
    print(f"dualcam runners: {time.perf_counter() - t0:.1f}s", flush=True)

    # the serving-Pareto stage (bench --stage-pareto): the recommended
    # operating point's runner (distinct program: backbone/stride/scale)
    import json
    import os.path as osp

    if osp.exists(bench.PARETO_JSON):
        import numpy as np

        from vision_semantic_segmentation_tpu.mapping import (
            SemanticMappingEngine,
        )
        from vision_semantic_segmentation_tpu.runtime.pipeline import (
            FusedFramePipeline,
        )
        from vision_semantic_segmentation_tpu.runtime.serving_pareto import (
            _point_cfg,
        )
        from vision_semantic_segmentation_tpu.runtime.tuning import (
            _resolve_distortion, init_variables,
        )

        with open(bench.PARETO_JSON) as f:
            rec = json.load(f)["recommended"]
        point = {
            k: rec[k] for k in
            ("backbone", "output_stride", "image_scale", "upsample_pred")
        }
        t0 = time.perf_counter()
        pc = _point_cfg(get_cfg_defaults(), point)
        engine = SemanticMappingEngine(pc)
        dist = _resolve_distortion(pc, engine, "camera1", (1440, 1920), "auto")
        pipeline = FusedFramePipeline(
            pc, init_variables(pc.VISION_SEM_SEG.SEM_SEG_NETWORK),
            engine=engine, distortion=dist,
        )
        pipeline.compile_sequence_runner(
            camera="camera1", image_hw=(1440, 1920), window=16
        )
        print(f"pareto runner ({point['backbone']} os{point['output_stride']} "
              f"s{point['image_scale']}): {time.perf_counter() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
