"""Workload autotuner for the mapping grid-update backends.

The fastest ``MAPPING.SORT_METHOD`` / ``FOLD_METHOD`` / ``UPDATE_WINDOW``
depend on the workload shape — grid cells vs points per frame vs window
length — and only the COMPOSED number decides: measured on v5e, a Pallas
fold that halved the isolated update regressed the fused step, and the
scatter fold wins or loses with grid size (ROUND_NOTES r03, composed
fold/sort probe).  So instead of hardcoding heuristics, this module
times the REAL fused sequence runner (``runtime/pipeline.py``) on
synthetic on-device frames at the user's exact configuration, and
writes a YAML overlay selecting the measured winner:

    python -m vision_semantic_segmentation_tpu autotune --cfg exp.yaml \\
        --out tuned.yaml
    python -m vision_semantic_segmentation_tpu replay --cfg tuned.yaml ...

This is the framework's equivalent of cuDNN benchmark mode / XLA
autotuning, applied to the mapping pipeline.  The reference has no
equivalent (its update is one hardcoded torch path, ref mapping.py:375).

Timing discipline (CLAUDE.md / ROUND_NOTES measurement rules): frames
are generated ON DEVICE (host staging would benchmark the transport,
not the framework), every runner is AOT-compiled
(``jit().lower().compile()`` — the jit dispatch compile path costs
minutes in tunneled environments where AOT takes ~50 s), windows are
dispatched whole through ``lax.scan``, and each measurement ends with a
small host readback barrier.  Timing is weight-independent, so random
``model.init`` parameters are used when no checkpoint is supplied.
"""
from __future__ import annotations

import math
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# (fold, sort) combinations; defaults first so ties keep the defaults
DEFAULT_COMBOS: Tuple[Tuple[str, str], ...] = (
    ("matmul", "bitonic"),
    ("scatter", "bitonic"),
    ("matmul", "radix"),
    ("scatter", "radix"),
)


def init_variables(net_cfg, compute_dtype=None):
    """Random-init model variables via ONE AOT-compiled init program.

    Param SHAPES are independent of image size, and timing is independent
    of the weight VALUES, so a tiny-input random init stands in for a
    checkpoint.  AOT because un-jitted init executes ~300 ops eagerly at
    ~0.4 s/op through a device tunnel (measured, ROUND_NOTES r03).
    """
    import jax
    import jax.numpy as jnp

    from ..models import build_model

    model = build_model(net_cfg, dtype=compute_dtype or jnp.bfloat16)[0]
    init_fn = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
        )
    )
    key = jax.random.PRNGKey(0)
    return init_fn.lower(key).compile()(key)


def generate_windows(
    cfg,
    image_hw: Tuple[int, int],
    window: int,
    n_windows: int,
    seed: int = 100,
    span_m: Optional[float] = None,
    origin_inset_m: Optional[Tuple[float, float]] = None,
    vehicle_pose: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> List[dict]:
    """Distinct on-device frame windows inside the configured boundary.

    Points land in a span near the boundary's lower corner with the
    vehicle just behind it facing +x (camera1 sees them); every window
    gets a fresh PRNG key so no dispatch re-fuses cached data.

    The default span is ``2 * MAPPING.PCD.RANGE_MAX`` (clipped to the
    boundary): a frame's observable footprint is bounded by the LiDAR
    range, and the UPDATE_WINDOW sweep must be timed against that WORST
    CASE, not a convenient small cluster — otherwise the tuner would
    bless a window that silently clips real data.  ``span_m`` /
    ``origin_inset_m`` override the footprint and its placement
    (bench.py pins span 40 m at a fixed inset for artifact continuity).
    """
    import jax
    import jax.numpy as jnp

    from ..mapping import PCD_ORIGIN_OFFSET

    bucket = int(cfg.MAPPING.POINT_BUCKET)
    (bx0, bx1), (by0, by1) = cfg.MAPPING.BOUNDARY
    range_max = float(cfg.MAPPING.PCD.RANGE_MAX)
    # span scales down for small test grids; margin keeps points interior
    span = float(min(span_m if span_m is not None else 2.0 * range_max,
                     0.8 * (bx1 - bx0), 0.8 * (by1 - by0)))
    inset_x, inset_y = (
        origin_inset_m if origin_inset_m is not None
        else (0.1 * (bx1 - bx0), 0.1 * (by1 - by0))
    )
    x0m = bx0 + inset_x - float(PCD_ORIGIN_OFFSET[0])
    y0m = by0 + inset_y - float(PCD_ORIGIN_OFFSET[1])
    if vehicle_pose is not None:
        # caller-supplied (position, quaternion_xyzw): e.g. a pose chosen
        # so a DIFFERENT camera's wedge covers the span (bench dual-cam)
        pos3, quat4 = vehicle_pose
        position = np.tile(np.asarray(pos3, np.float32), (window, 1))
        quaternion = np.tile(np.asarray(quat4, np.float32), (window, 1))
    else:
        position = np.tile(
            np.asarray([x0m - 6.0, y0m + span / 2.0, 0.0], np.float32),
            (window, 1),
        )
        quaternion = np.tile(np.asarray([0, 0, 0, 1.0], np.float32), (window, 1))
    img_h, img_w = image_hw

    @jax.jit
    def gen_window(key):
        k_img, k_xy, k_zi = jax.random.split(key, 3)
        images = jax.random.randint(
            k_img, (window, img_h, img_w, 3), 0, 256, jnp.uint8
        )
        xy = jax.random.uniform(
            k_xy, (window, 2, bucket),
            minval=jnp.asarray([[x0m], [y0m]], jnp.float32),
            maxval=jnp.asarray([[x0m + span], [y0m + span]], jnp.float32),
        )
        zi = jax.random.uniform(
            k_zi, (window, 2, bucket),
            minval=jnp.asarray([[-1.0], [0.0]], jnp.float32),
            maxval=jnp.asarray([[0.5], [20.0]], jnp.float32),
        )
        return {
            "image": images,
            "pcd": jnp.concatenate([xy, zi], axis=1),  # (window, 4, bucket)
            "valid": jnp.ones((window, bucket), bool),
            "position": jnp.asarray(position),
            "quaternion": jnp.asarray(quaternion),
        }

    windows = [gen_window(jax.random.PRNGKey(seed + i)) for i in range(n_windows)]
    jax.block_until_ready(windows)
    return windows


def time_fused_runner(
    pipeline,
    windows: List[dict],
    image_hw: Tuple[int, int],
    window: int,
    camera: str,
    repeats: int,
) -> Tuple[float, float]:
    """AOT-compile + time a FusedFramePipeline's sequence runner.

    Returns ``(fps, warmup_s)``.  The shared measurement core of the
    grid-update autotuner and the serving-Pareto sweep: whole-window
    dispatch, grid threaded through the donated buffer, small host
    readback as the completion barrier (``block_until_ready`` does not
    force completion through the dev tunnel), best-of-``repeats``.
    """
    import jax.numpy as jnp

    t0 = time.perf_counter()
    run = pipeline.compile_sequence_runner(
        camera=camera, image_hw=tuple(image_hw), window=window
    )
    grid = pipeline.init_grid()
    grid = run(grid, windows[0])  # first execution
    float(jnp.sum(grid[:2, :2]))
    warmup_s = time.perf_counter() - t0

    elapsed = float("inf")
    for _ in range(max(1, repeats)):
        start = time.perf_counter()
        for frames in windows:
            grid = run(grid, frames)
        float(jnp.sum(grid[:2, :2]))  # host readback barrier
        elapsed = min(elapsed, time.perf_counter() - start)
    return (window * len(windows)) / elapsed, warmup_s


def _resolve_distortion(cfg, engine, camera: str, image_hw: Tuple[int, int],
                        distortion: str) -> str:
    """``'auto'`` -> distortion-on-points iff the cfg asks for undistortion
    AND the timed image size matches the camera's calibration (applying
    plumb-bob to points against a mismatched-size frame would just time a
    geometrically meaningless gather)."""
    if distortion != "auto":
        return distortion
    undistort = bool(getattr(cfg.VISION_SEM_SEG, "UNDISTORT", True))
    cam = engine.cameras.get(camera)
    calibrated = (
        cam is not None
        and cam.dist is not None
        and cam.im_size is not None
        and tuple(cam.im_size) == (image_hw[1], image_hw[0])  # im_size is (w, h)
    )
    return "points" if (undistort and calibrated) else "none"


def _time_combo(
    cfg,
    variables,
    fold: str,
    sort: str,
    update_window: Optional[int],
    windows: List[dict],
    image_hw: Tuple[int, int],
    window: int,
    camera: str,
    repeats: int,
    distortion: str,
) -> dict:
    """AOT-compile + time the fused runner for one backend combination."""
    from ..mapping.engine import SemanticMappingEngine
    from .pipeline import FusedFramePipeline

    combo_cfg = cfg.clone()
    combo_cfg.defrost()
    combo_cfg.MAPPING.FOLD_METHOD = fold
    combo_cfg.MAPPING.SORT_METHOD = sort
    if update_window is not None:
        combo_cfg.MAPPING.UPDATE_WINDOW = int(update_window)

    # production-default evidence matrix (cfg-driven, any label count) —
    # the timed program must be exactly what replay/pipeline would run
    engine = SemanticMappingEngine(combo_cfg)
    # a pose-centered window smaller than the frame's worst-case footprint
    # (~2.2 * RANGE_MAX / RESOLUTION cells, config/defaults.py) silently
    # DROPS out-of-window points in production — faster but not
    # semantics-preserving, so such rows never win (see tune())
    uw_val = int(combo_cfg.MAPPING.UPDATE_WINDOW)
    required = math.ceil(
        2.2 * float(combo_cfg.MAPPING.PCD.RANGE_MAX)
        / float(combo_cfg.MAPPING.RESOLUTION)
    )
    grid_max = max(engine.grid_spec.height, engine.grid_spec.width)
    lossy = 0 < uw_val < min(required, grid_max)
    dist = _resolve_distortion(combo_cfg, engine, camera, image_hw, distortion)
    pipeline = FusedFramePipeline(
        combo_cfg, variables, engine=engine, distortion=dist
    )
    fps, warmup_s = time_fused_runner(
        pipeline, windows, image_hw, window, camera, repeats
    )
    return {
        "fold": fold,
        "sort": sort,
        "update_window": uw_val,
        "tuned_update_window": update_window is not None,
        "lossy": lossy,
        "distortion": dist,
        "fps": round(fps, 3),
        "ms_per_frame": round(1000.0 / fps, 3),
        "warmup_s": round(warmup_s, 1),
    }


def tune(
    cfg,
    variables=None,
    image_hw: Tuple[int, int] = (1440, 1920),
    window: int = 16,
    n_windows: int = 2,
    repeats: int = 3,
    combos: Optional[Sequence[Tuple[str, str]]] = None,
    update_windows: Optional[Sequence[int]] = None,
    camera: str = "camera1",
    distortion: str = "auto",
    log=None,
) -> Dict:
    """Measure every backend combination on this device at ``cfg``'s shapes.

    Args:
        cfg: the app config whose MAPPING geometry/bucket define the
          workload; its FOLD/SORT/UPDATE_WINDOW values are the candidates'
          starting point (rows override them).
        variables: model variables; random-initialized when ``None``
          (timing is weight-independent).
        update_windows: optional UPDATE_WINDOW candidates (cells) to sweep
          as an outer product with the (fold, sort) combos; ``None`` keeps
          the cfg's value.
        distortion: 'auto' | 'none' | 'points' (see _resolve_distortion).

    Returns a dict with ``rows`` (one measurement per combination, in run
    order), ``best`` (highest fps among SEMANTICS-PRESERVING rows —
    update windows smaller than the frame's worst-case footprint drop
    points in production and are timed for information only; earlier row
    wins ties, so the shipped defaults survive a wash), and the workload
    descriptor.
    """
    import jax

    if variables is None:
        variables = init_variables(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK)
    windows = generate_windows(cfg, image_hw, window, n_windows)
    combos = tuple(combos) if combos else DEFAULT_COMBOS
    uw_candidates: Sequence[Optional[int]] = (
        tuple(update_windows) if update_windows else (None,)
    )

    rows = []
    for uw in uw_candidates:
        for fold, sort in combos:
            row = _time_combo(
                cfg, variables, fold, sort, uw, windows,
                image_hw, window, camera, repeats, distortion,
            )
            rows.append(row)
            if log:
                log(
                    f"fold={row['fold']:<7} sort={row['sort']:<7} "
                    f"update_window={row['update_window']:<5} "
                    f"{row['fps']:8.2f} fps  ({row['ms_per_frame']:.2f} ms/frame, "
                    f"warmup {row['warmup_s']:.0f}s)"
                    + ("  [LOSSY: drops out-of-window points]"
                       if row["lossy"] else "")
                )
    safe = [r for r in rows if not r["lossy"]]
    if not safe and update_windows:
        raise ValueError(
            "every UPDATE_WINDOW candidate is lossy at this config "
            "(needs >= ceil(2.2 * PCD.RANGE_MAX / RESOLUTION) cells, or 0 "
            "for the dense update) — add a safe candidate"
        )
    if not safe:
        # no sweep requested and the cfg's own UPDATE_WINDOW is lossy:
        # still rank fold/sort, but say so
        if log:
            log("warning: cfg's UPDATE_WINDOW drops out-of-window points "
                "at PCD.RANGE_MAX — ranking backends at that setting")
        safe = rows
    best = max(safe, key=lambda r: r["fps"])
    return {
        "rows": rows,
        "best": best,
        "device_kind": jax.devices()[0].device_kind,
        "image_hw": list(image_hw),
        "window": window,
        "n_windows": n_windows,
        "point_bucket": int(cfg.MAPPING.POINT_BUCKET),
        "boundary": [list(b) for b in cfg.MAPPING.BOUNDARY],
        "resolution": float(cfg.MAPPING.RESOLUTION),
    }


def overlay_yaml(result: Dict) -> str:
    """Render the winning combination as a merge-ready yacs YAML overlay."""
    best = result["best"]
    h, w = result["image_hw"]
    lines = [
        f"# autotuned on {result['device_kind']}: {best['fps']} fps at "
        f"{h}x{w}, window {result['window']}, "
        f"bucket {result['point_bucket']}, grid "
        f"{result['boundary']} @ {result['resolution']} m",
        "MAPPING:",
        f"  FOLD_METHOD: {best['fold']}",
        f"  SORT_METHOD: {best['sort']}",
    ]
    if best.get("tuned_update_window"):
        lines.append(f"  UPDATE_WINDOW: {best['update_window']}")
    return "\n".join(lines) + "\n"


def write_overlay(result: Dict, path: str) -> str:
    with open(path, "w") as f:
        f.write(overlay_yaml(result))
    return path
