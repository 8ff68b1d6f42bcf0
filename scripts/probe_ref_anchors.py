"""Measure the reference's published per-op perf anchors on the v5e.

The reference repo publishes exactly three per-op timings (BASELINE.md):

- demo-video model throughput: 10 FPS @ 476x356 on a CUDA GPU
  (ref video_generator.py:126-128, model_timer around the predict call)
- MeanIOU metric cost: 0.16 s per (8, 21, 513, 513) batch, CPU numpy
  (ref models/metrics.py:16-17)
- argmax of (8, 513, 513, 21): 0.03 s torch-GPU / 0.2 s numpy-CPU
  (ref models/metrics.py:41-43)

This probe times our equivalents on the TPU with the repo's standard
methodology: T-step carry-threaded lax.scan per dispatch, a NULL scan at
the same T subtracted, small host readback to force completion
(CLAUDE.md measurement rules — `block_until_ready` lies through the
tunnel).
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")

from vision_semantic_segmentation_tpu.config import get_demo_cfg_defaults
from vision_semantic_segmentation_tpu.models.build import build_model
from vision_semantic_segmentation_tpu.models.metrics import confusion_matrix_update

T = 16


def timed(run, args, n=3):
    out = run(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / T * 1e3  # ms per scan step


def scan_program(step):
    """T-step scan carry-threading a scalar digest of step's output.

    Extra positional args of the returned runner are passed through to
    ``step`` as traced ARGUMENTS — device arrays (model params!) must
    ride this path, never a closure: every closure-captured jnp array is
    read back through the tunnel at ~39 s at lowering (CLAUDE.md).
    """

    def run(seed, *args):
        def body(carry, _):
            out = step(carry, *args)
            return jnp.float32(jnp.sum(out) * 1e-9) + carry * 0.0, ()

        final, _ = jax.lax.scan(body, seed, None, length=T)
        return final

    return run


def main():
    print(f"device: {jax.devices()[0].device_kind}, T={T} null-corrected")
    rng = np.random.default_rng(0)

    null = jax.jit(scan_program(lambda c: c)).lower(jnp.float32(0.0)).compile()
    null_ms = timed(null, (jnp.float32(0.0),))

    # 1) demo-video model path: preprocess+forward+argmax @ 476x356
    #    (the reference's model_timer scope: predict only, no codec IO).
    cfg = get_demo_cfg_defaults()
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    model, _, _, _ = build_model(net_cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 476, 356, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    ).lower().compile()()
    frame = rng.integers(0, 255, (1, 476, 356, 3)).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def video_step(carry, variables):
        x = frame / 255.0
        x = (x - mean) / std + carry * 0.0
        logits = model.apply(variables, x, train=False, upsample_pred=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.float32)

    run = jax.jit(scan_program(video_step)).lower(
        jnp.float32(0.0), variables
    ).compile()
    ms = timed(run, (jnp.float32(0.0), variables)) - null_ms
    print(f"video model path 476x356 (ref 10 FPS CUDA): "
          f"{ms:6.2f} ms = {1e3 / ms:6.1f} FPS  ({1e3 / ms / 10:.1f}x ref)")

    # 2) MeanIOU update on (8, 513, 513) preds/labels, 21 classes
    #    (ref: 0.16 s numpy CPU per batch)
    # host-numpy closures embed free; device ones cost ~39 s/array
    preds = rng.integers(0, 21, (8, 513, 513)).astype(np.int32)
    labels = rng.integers(0, 21, (8, 513, 513)).astype(np.int32)

    def miou_step(carry):
        p = preds + jnp.int32(carry * 0.0)
        return confusion_matrix_update(p, labels, 21)

    run = jax.jit(scan_program(miou_step)).lower(jnp.float32(0.0)).compile()
    ms = timed(run, (jnp.float32(0.0),)) - null_ms
    print(f"MeanIOU update (8,513,513) 21cls (ref 160 ms CPU): "
          f"{ms:6.2f} ms  ({160 / ms:.0f}x ref)")

    # 3) argmax over (8, 513, 513, 21) logits (ref: 30 ms GPU / 200 ms CPU)
    logits = rng.standard_normal((8, 513, 513, 21)).astype(np.float32)

    def argmax_step(carry):
        return jnp.argmax(logits + carry * 0.0, axis=-1).astype(jnp.float32)

    run = jax.jit(scan_program(argmax_step)).lower(jnp.float32(0.0)).compile()
    ms = timed(run, (jnp.float32(0.0),)) - null_ms
    print(f"argmax (8,513,513,21) (ref 30 ms GPU / 200 ms CPU): "
          f"{ms:6.2f} ms  ({30 / ms:.0f}x GPU ref)")


if __name__ == "__main__":
    main()
