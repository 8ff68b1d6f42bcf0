"""Composed ASPP: shifted-XLA depthwise vs the Pallas slab-f32 kernel.

The isolated-branch probes (probe_depthwise_hoist.py) put the slab-f32
kernel ~15% below the per-tap Pallas kernel and ~35% below the shifted
XLA form in compute terms — but the evidence-fold kernel taught that
custom-call boundaries can regress the COMPOSED program (ROUND_NOTES
r03).  This probe times the full ASPP module (pointwise branch, three
depthwise-separable atrous branches, global pooling, concat + project)
at the production os8 shape with the depthwise path toggled via
layers.PALLAS_DEPTHWISE.

Methodology (T=4 postmortem in probe_bn_fusion.py): T=16 xs-threaded
scan, NULL program measured at the same T to subtract the tunnel
dispatch round-trip, AOT lower+compile.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")

from vision_semantic_segmentation_tpu.models import layers
from vision_semantic_segmentation_tpu.models.aspp import ASPP

T = 16
H, W, C = 180, 240, 2048


def scan_time(name, apply_fn, variables, xs, n=3):
    def run_impl(v, xx):
        def body(acc, frame):
            out = apply_fn(v, frame[None])
            return acc + jnp.sum(out.astype(jnp.float32).reshape(-1)[:1]), ()

        acc, _ = jax.lax.scan(body, jnp.zeros(()), xx)
        return acc

    run = jax.jit(run_impl).lower(variables, xs).compile()
    _ = float(run(variables, xs))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        acc = run(variables, xs)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    ms = best / T * 1e3
    print(f"{name:52s} {ms:8.3f} ms/frame", flush=True)
    return ms


def main():
    print(f"device: {jax.devices()[0].device_kind}  T={T}  ({H},{W},{C}) bf16")
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.standard_normal((T, H, W, C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    ovh = scan_time("NULL (dispatch overhead / T)", lambda v, xi: xi[:, :1, :1, :1] + 1.0,
                    {}, xs)

    aspp = ASPP(out_channels=256, atrous_dilation=(1, 12, 24, 36),
                dtype=jnp.bfloat16)

    results = {}
    for flag in (False, True):
        layers.PALLAS_DEPTHWISE = flag
        va = aspp.init(jax.random.PRNGKey(0), xs[:1], train=False)
        name = "pallas slab-f32 depthwise" if flag else "shifted XLA depthwise"
        ms = scan_time(f"ASPP composed, {name}",
                       lambda v, xi: aspp.apply(v, xi, train=False), va, xs)
        results[flag] = ms
    layers.PALLAS_DEPTHWISE = False

    print(f"\ncompute (ovh-corrected): shifted {results[False] - ovh:.3f} ms, "
          f"pallas {results[True] - ovh:.3f} ms, "
          f"delta {results[False] - results[True]:+.3f} ms/frame")


if __name__ == "__main__":
    main()
