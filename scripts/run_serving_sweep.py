"""Resumable serving-Pareto sweep driver (VERDICT r04 #1).

``autotune --serving`` runs the whole sweep in one process and only
writes its artifact at the end — a single compile-service hang (20 s to
19 min draws for identical programs, ROUND_NOTES r03) near the tail
loses ~2 h of measurements.  This driver runs the SAME sweep functions
(`runtime/serving_pareto.py`) but appends every finished row to a
progress JSONL immediately, so a killed/hung run resumes where it
stopped:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_serving_sweep.py \
        --progress /tmp/serving_sweep.jsonl --scene-dir /tmp/serving_scene

Per-point trained weights are already cached on disk by score_quality
(keyed by backbone/stride/scale under --scene-dir), so quality resumes
skip finished trainings too.  When every point has both an fps and a
quality row, the driver joins them with ``pareto()`` and writes
``configs/serving_pareto.json`` + the recommended-point overlay
``configs/serving_recommended.yaml``.

Rescue flow: the trainer is bit-deterministic, so a point that failed
the overfit floor fails identically on a plain retry (r05: resnet50/
os16/0.5 stuck at lane recall 0.29 under the default lr 3e-3).  Re-run
the driver with a different recipe — it retrains ONLY the still-missing
points (finished rows resume from the JSONL):

    ... run_serving_sweep.py --train-lr 1.5e-3 --train-steps 600

Per-point weights persist as FILES under --scene-dir keyed by
backbone/stride/scale only — after editing train_segmenter itself,
clear --scene-dir (or point at a fresh one) so stale weights don't
short-circuit the retrain.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def load_progress(path):
    fps_rows, quality_rows = {}, {}
    if osp.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                kind = rec.pop("kind")
                key = (rec["backbone"], int(rec["output_stride"]),
                       round(float(rec["image_scale"]), 4),
                       bool(rec["upsample_pred"]))
                (fps_rows if kind == "fps" else quality_rows)[key] = rec
    return fps_rows, quality_rows


def append_progress(path, kind, row):
    with open(path, "a") as f:
        f.write(json.dumps(dict(row, kind=kind)) + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--progress", default="/tmp/serving_sweep.jsonl")
    ap.add_argument("--scene-dir", default="/tmp/serving_scene")
    ap.add_argument("--json", default=osp.join(REPO, "configs", "serving_pareto.json"))
    ap.add_argument("--out", default=osp.join(REPO, "configs", "serving_recommended.yaml"))
    ap.add_argument("--budget", type=float, default=0.95)
    ap.add_argument("--train-steps", type=int, default=400)
    ap.add_argument("--train-lr", type=float, default=None,
                    help="override the trainer's lr for points that still "
                         "need a quality row (rescue knob — see docstring)")
    ap.add_argument("--fps-only", action="store_true")
    ap.add_argument("--allow-partial", action="store_true",
                    help="write the artifact even when some points have no "
                         "quality row (it is marked partial + the missing "
                         "points listed); default refuses, so a failed "
                         "point cannot silently overwrite the committed "
                         "complete frontier")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.runtime.serving_pareto import (
        SceneArtifacts, default_points, generate_windows, pareto, point_key,
        score_quality, serving_overlay_yaml, sweep_fps, write_json,
    )

    cfg = get_cfg_defaults()
    points = default_points()
    fps_done, q_done = load_progress(args.progress)
    print(f"sweep: {len(points)} points; resumed {len(fps_done)} fps rows, "
          f"{len(q_done)} quality rows", flush=True)

    # --- fps phase: one point at a time so each row lands in the JSONL;
    # the frame windows are identical across points — build them once
    windows = None
    for point in points:
        if point_key(point) in fps_done:
            continue
        if windows is None:
            windows = generate_windows(cfg, (1440, 1920), 16, 2)
        row = sweep_fps(cfg, [point], image_hw=(1440, 1920), window=16,
                        n_windows=2, repeats=3, windows=windows,
                        log=lambda m: print(m, flush=True))[0]
        append_progress(args.progress, "fps", row)
        fps_done[point_key(point)] = row

    if args.fps_only:
        print("fps phase complete (--fps-only)", flush=True)
        return

    # --- quality phase
    scene = None
    for point in points:
        if point_key(point) in q_done:
            continue
        if scene is None:
            scene = SceneArtifacts(args.scene_dir,
                                   log=lambda m: print(m, flush=True))
        try:
            row = score_quality(scene, point, cfg=cfg,
                                train_steps=args.train_steps,
                                train_lr=args.train_lr,
                                log=lambda m: print(m, flush=True))
            if args.train_lr is not None:
                row["rescue"] = {"train_lr": args.train_lr,
                                 "train_steps": args.train_steps}
        except Exception as exc:  # one OOM point must not kill the sweep
            print(f"quality point {point} failed: {exc!r} (skipping)",
                  flush=True)
            continue
        append_progress(args.progress, "quality", row)
        q_done[point_key(point)] = row

    missing = [point_key(pt) for pt in points if point_key(pt) not in q_done]
    if missing and not args.allow_partial:
        print("REFUSING to write artifact: quality rows missing for "
              f"{len(missing)} point(s): {missing}\n"
              "Re-run with a rescue recipe (--train-lr/--train-steps) to "
              "fill them, or pass --allow-partial to write a marked "
              "partial frontier.", flush=True)
        sys.exit(3)
    result = pareto(list(fps_done.values()), list(q_done.values()),
                    quality_budget=args.budget)
    if missing:
        result["partial"] = True
        result["missing_quality_points"] = [list(k) for k in missing]
    print(f"wrote {write_json(result, args.json)}", flush=True)
    if result["recommended"] is not None:
        r = result["recommended"]
        with open(args.out, "w") as f:
            f.write(serving_overlay_yaml(r, result))
        print(f"recommended: {r['backbone']} os{r['output_stride']} "
              f"scale={r['image_scale']} up={r['upsample_pred']} -> "
              f"{r['fps']} fps at miou {r.get('miou')} "
              f"(anchor {result['anchor_miou']}); wrote {args.out}",
              flush=True)
    else:
        print("no recommended point (quality rows missing?)", flush=True)


if __name__ == "__main__":
    main()
