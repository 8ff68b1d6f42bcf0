"""Stage-level profiler for the fused pipeline (`profile` CLI).

The reference's only timing surface is the ``model_timer`` decorator on
the video demo's forward (ref core/utils/benchmark.py:17-25,
video_generator.py:126-128).  This module is the framework-native
counterpart: it times, at the USER's exact configuration on the local
device,

  * the dispatch/readback overhead (a NULL scan — subtracted from
    every stage, the T>=16 NULL-correction rule from ROUND_NOTES),
  * the segmentation forward (the fused step's own undistort/scale/
    normalize/DeepLab/argmax prologue, via
    ``FusedFramePipeline._build_segmentation`` so the timed program
    cannot drift from production),
  * the full fused e2e step (forward + projection + label gather +
    Bayesian grid fusion),

and derives the fusion cost as their difference.  Measurement
discipline (CLAUDE.md): frames are generated ON DEVICE, every program
is AOT-compiled (``jit().lower().compile()``), a whole T-frame window
scans per dispatch with the stage output carry-threaded (blocks loop
hoisting), and each measurement ends with a small host readback.

    python -m vision_semantic_segmentation_tpu profile --cfg exp.yaml
"""
from __future__ import annotations

import time
from typing import List, Optional, Tuple

__all__ = ["profile_stages", "format_report"]


def _aot_scan_ms(
    per_frame, variables, windows: List[dict], window: int, repeats: int
) -> float:
    """Best-of-``repeats`` ms/frame for ``per_frame(variables, frame) ->
    scalar f32`` scanned over each window with a carry-threaded sum."""
    import jax
    import jax.numpy as jnp

    def run_impl(v, frames):
        def body(acc, frame):
            return acc + per_frame(v, frame), ()

        acc, _ = jax.lax.scan(body, jnp.zeros(()), frames)
        return acc

    run = jax.jit(run_impl).lower(variables, windows[0]).compile()
    float(run(variables, windows[0]))  # first execution
    best = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        for frames in windows:
            acc = run(variables, frames)
        float(acc)  # host readback barrier
        best = min(best, time.perf_counter() - t0)
    return best / (window * len(windows)) * 1e3


def profile_stages(
    cfg,
    variables=None,
    image_hw: Tuple[int, int] = (1440, 1920),
    window: int = 16,
    n_windows: int = 2,
    repeats: int = 3,
    camera: str = "camera1",
    distortion: str = "auto",
    confidence_weighting: bool = False,
    log=None,
) -> dict:
    """Time the pipeline stages at ``cfg``'s shapes on the local device.

    Returns a dict with raw and NULL-corrected per-stage ms/frame, the
    derived fusion cost, and the end-to-end throughput.  ``distortion``
    follows the autotuner's ``'auto'`` rule (points mode iff the cfg
    asks for undistortion and the timed size matches the camera's
    calibration).  Timing is weight-independent; random-init variables
    are used when none are supplied.
    """
    import jax
    import jax.numpy as jnp

    from ..mapping.engine import SemanticMappingEngine
    from .pipeline import FusedFramePipeline
    from .tuning import _resolve_distortion, generate_windows, init_variables

    if window < 1 or n_windows < 1:
        raise ValueError(
            f"window and n_windows must be >= 1 (got window={window}, "
            f"n_windows={n_windows})"
        )
    if variables is None:
        variables = init_variables(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK)
    engine = SemanticMappingEngine(cfg)
    dist = _resolve_distortion(cfg, engine, camera, image_hw, distortion)
    pipeline = FusedFramePipeline(
        cfg, variables, engine=engine, distortion=dist,
        confidence_weighting=confidence_weighting,
    )
    windows = generate_windows(cfg, image_hw, window, n_windows)

    # NULL: the dispatch round-trip amortized over the window — reads one
    # pixel so the scan cannot be constant-folded away.  The full variables
    # tree is passed (and ignored) so per-dispatch argument handling is
    # identical to the forward/e2e measurements it corrects.
    null_ms = _aot_scan_ms(
        lambda v, fr: fr["image"][0, 0, 0].astype(jnp.float32) * 0.0,
        pipeline.variables, windows, window, repeats,
    )
    if log:
        log(f"{'NULL (dispatch overhead/frame)':38s} {null_ms:8.2f} ms")

    seg = pipeline._build_segmentation(camera, tuple(image_hw))
    fwd_raw = _aot_scan_ms(
        lambda v, fr: jnp.argmax(seg(v, fr["image"]), axis=-1)
        .astype(jnp.float32)
        .reshape(-1)[0],
        pipeline.variables, windows, window, repeats,
    )
    fwd_ms = max(fwd_raw - null_ms, 0.0)
    if log:
        log(f"{'forward (seg prologue + argmax)':38s} {fwd_ms:8.2f} ms"
            f"  (raw {fwd_raw:.2f})")

    # e2e: the production sequence runner, grid carry-threaded (donated)
    t0 = time.perf_counter()
    run = pipeline.compile_sequence_runner(
        camera=camera, image_hw=tuple(image_hw), window=window
    )
    grid = pipeline.init_grid()
    grid = run(grid, windows[0])
    float(jnp.sum(grid[:2, :2]))
    warmup_s = time.perf_counter() - t0
    elapsed = float("inf")
    for _ in range(max(1, repeats)):
        start = time.perf_counter()
        for frames in windows:
            grid = run(grid, frames)
        float(jnp.sum(grid[:2, :2]))
        elapsed = min(elapsed, time.perf_counter() - start)
    e2e_raw = elapsed / (window * len(windows)) * 1e3
    e2e_ms = max(e2e_raw - null_ms, 0.0)
    fusion_ms = max(e2e_ms - fwd_ms, 0.0)
    fps = 1000.0 / e2e_raw
    if log:
        log(f"{'e2e fused step':38s} {e2e_ms:8.2f} ms  (raw {e2e_raw:.2f})")
        log(f"{'fusion (e2e - forward, derived)':38s} {fusion_ms:8.2f} ms")
        log(f"{'throughput':38s} {fps:8.2f} fps  (warmup {warmup_s:.0f}s)")

    return {
        "device_kind": jax.devices()[0].device_kind,
        "image_hw": list(image_hw),
        "window": window,
        "n_windows": n_windows,
        "repeats": repeats,
        "camera": camera,
        "distortion": dist,
        "confidence_weighting": bool(confidence_weighting),
        "boundary": [list(b) for b in cfg.MAPPING.BOUNDARY],
        "resolution": float(cfg.MAPPING.RESOLUTION),
        "point_bucket": int(cfg.MAPPING.POINT_BUCKET),
        "null_ms": round(null_ms, 3),
        "forward_ms": round(fwd_ms, 3),
        "forward_ms_raw": round(fwd_raw, 3),
        "e2e_ms": round(e2e_ms, 3),
        "e2e_ms_raw": round(e2e_raw, 3),
        "fusion_ms": round(fusion_ms, 3),
        "e2e_fps": round(fps, 3),
        "warmup_s": round(warmup_s, 1),
    }


def format_report(result: dict) -> str:
    """One-paragraph human summary of a :func:`profile_stages` result."""
    h, w = result["image_hw"]
    return (
        f"{result['device_kind']} @ {h}x{w} (distortion={result['distortion']}, "
        f"window {result['window']}): forward {result['forward_ms']:.2f} ms, "
        f"fusion {result['fusion_ms']:.2f} ms, e2e {result['e2e_ms_raw']:.2f} "
        f"ms/frame = {result['e2e_fps']:.2f} fps "
        f"(dispatch overhead {result['null_ms']:.2f} ms/frame, "
        f"warmup {result['warmup_s']:.0f}s)"
    )
