"""Composed A/B of the grid-update backends inside the production pipeline.

The scatter fold and radix sort win or lose ONLY as part of the fused
camera+LiDAR scan (the r03 lesson: the Pallas fold halved the isolated
update yet regressed the composed step by breaking XLA's surrounding
fusions).  This probe times the REAL fused sequence runner — DeepLab
forward + projection + grid update, whole window per dispatch — at the
headline config (1440x1920 frames, 2000^2 @ 0.1 m dense grid) and at the
full-route config (5000x7000 @ 0.2 m), across backend combinations:

    matmul+bitonic   the shipped defaults
    scatter+bitonic  fold_method='scatter'
    matmul+radix     sort_method='radix'
    scatter+radix    both
    fullroute rows   windowed matmul (shipped) vs DENSE scatter — the
                     scatter fold makes even the 35M-cell dense update
                     O(points), which would retire UPDATE_WINDOW there

Reuses bench.py's pipeline builder/window generator/timing so numbers are
directly comparable to the bench headline.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fold_composed.py
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def run_combo(name, fold, sort, fullroute=False, window_cells=None):
    from vision_semantic_segmentation_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    if fullroute:
        cfg.MAPPING.BOUNDARY = [[0, 1000], [0, 1400]]
        cfg.MAPPING.RESOLUTION = 0.2
        cfg.MAPPING.UPDATE_WINDOW = window_cells or 0
    cfg.MAPPING.FOLD_METHOD = fold
    cfg.MAPPING.SORT_METHOD = sort
    fps, warmup_s, _, _ = bench._run_stage(
        cfg, 1440, 1920, window=16, n_windows=2, distortion="points"
    )
    row = {
        "combo": name, "fold": fold, "sort": sort,
        "fullroute": fullroute, "update_window": window_cells or 0,
        "fps": round(fps, 2), "ms_per_frame": round(1000.0 / fps, 2),
        "warmup_s": round(warmup_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    jax = bench._setup_jax()
    print(f"# device: {jax.devices()[0].device_kind}", flush=True)

    rows = [
        run_combo("headline matmul+bitonic (default)", "matmul", "bitonic"),
        run_combo("headline scatter+bitonic", "scatter", "bitonic"),
        run_combo("headline matmul+radix", "matmul", "radix"),
        run_combo("headline scatter+radix", "scatter", "radix"),
        run_combo("fullroute windowed matmul (default)", "matmul", "bitonic",
                  fullroute=True, window_cells=1200),
        run_combo("fullroute DENSE scatter", "scatter", "bitonic",
                  fullroute=True, window_cells=0),
        run_combo("fullroute windowed scatter", "scatter", "bitonic",
                  fullroute=True, window_cells=1200),
    ]
    best = max(rows, key=lambda r: r["fps"])
    print(json.dumps({"best": best["combo"], "fps": best["fps"]}))


if __name__ == "__main__":
    main()
