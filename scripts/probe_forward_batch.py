"""Does batching frames through the flagship forward beat batch-1?

The production pipeline runs DeepLabV3+ ResNeXt50-32x4d os8 one frame
per scan step (runtime/pipeline.py).  At 1440x1920 the spatial extent is
already huge (os8 plane 180x240 = 43k rows against the 128-wide MXU), so
batch>1 should gain little on the MXU — but the half-peak pointwise
convs (probe_bn_fusion.py: 1x1 512->512 at ~102 TFLOP/s) might batch
better, and XLA gets more freedom to overlap.  If batch-2 per-frame ms
is meaningfully below batch-1, restructuring the fused scan to process
frame PAIRS (updates are additive and order-independent across frames —
the same property frame-parallel replay exploits) is the follow-up.

Methodology: T>=16 carry-threaded scans, NULL subtracted, params passed
as ARGUMENTS (never closures — CLAUDE.md tunnel rules), AOT compiles.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")

from vision_semantic_segmentation_tpu.config import get_cfg_defaults
from vision_semantic_segmentation_tpu.models.build import build_model

T = 16
H, W = 1440, 1920


def main():
    print(f"device: {jax.devices()[0].device_kind}  {H}x{W} bf16, T={T}")
    rng = np.random.default_rng(0)

    cfg = get_cfg_defaults().VISION_SEM_SEG.SEM_SEG_NETWORK
    model, _, _, _ = build_model(cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    ).lower().compile()()

    def scan_program(batch):
        frame = rng.standard_normal((batch, H, W, 3)).astype(np.float32)

        def run(seed, params):
            def body(carry, _):
                x = frame + carry * 0.0
                logits = model.apply(params, x, train=False, upsample_pred=False)
                out = jnp.argmax(logits, axis=-1).astype(jnp.float32)
                return jnp.float32(jnp.sum(out) * 1e-9) + carry * 0.0, ()

            final, _ = jax.lax.scan(body, seed, None, length=T)
            return final

        return run

    def null_run(seed, params):
        def body(carry, _):
            return carry, ()

        final, _ = jax.lax.scan(body, seed, None, length=T)
        return final

    def timed(run, n=3):
        out = run(jnp.float32(0.0), variables)
        _ = float(out)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = run(jnp.float32(0.0), variables)
            _ = float(out)
            best = min(best, time.perf_counter() - t0)
        return best / T * 1e3

    null = jax.jit(null_run).lower(jnp.float32(0.0), variables).compile()
    null_ms = timed(null)
    print(f"null scan: {null_ms:.3f} ms/step")

    base = None
    for batch in (1, 2, 4):
        try:
            run = jax.jit(scan_program(batch)).lower(
                jnp.float32(0.0), variables
            ).compile()
            ms = timed(run) - null_ms
        except Exception as e:  # noqa: BLE001 - OOM is an expected outcome
            print(f"batch {batch}: failed ({type(e).__name__})", flush=True)
            continue
        per = ms / batch
        if base is None:
            base = per
        print(
            f"batch {batch}: {ms:7.2f} ms = {per:6.2f} ms/frame "
            f"({base / per:.2f}x vs batch 1)",
            flush=True,
        )


if __name__ == "__main__":
    main()
