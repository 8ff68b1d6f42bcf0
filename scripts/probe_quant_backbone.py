"""Quantized (int8 PTQ) backbone + full forward vs bf16 at 1440x1920.

Decision evidence for the int8 serving mode (models/quant.py): measures
the deployed ResNeXt50-32x4d os8 backbone and the full DeepLab forward,
bf16 vs int8-backbone, on the real chip.  Anchors: bf16 backbone 26.8 ms
(ROUND_NOTES r03), int8 roofline 7.5 ms (scripts/roofline_backbone.py),
per-conv int8 speedups 1.44-1.79x (scripts/probe_int8_conv.py).

Methodology: T-frame xs-threaded scans, NULL-corrected, AOT.
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
from vision_semantic_segmentation_tpu.models import deeplab_from_cfg
from vision_semantic_segmentation_tpu.models.quant import (
    backbone_module,
    quant_backbone_apply,
    quant_deeplab_apply,
    quantize_deeplab,
    _sub_variables,
)

T = 16
H, W = 1440, 1920


def scan_time(name, fn, *args, n=3):
    def run_impl(xs, *rest):
        def body(acc, frame):
            out = fn(frame[None], *rest)
            return acc + jnp.sum(out.astype(jnp.float32).reshape(-1)[:1]), ()

        acc, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return acc

    run = jax.jit(run_impl).lower(*args).compile()
    _ = float(run(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        acc = run(*args)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    ms = best / T * 1e3
    print(f"{name:48s} {ms:8.2f} ms/frame", flush=True)
    return ms


def main():
    print(f"device: {jax.devices()[0].device_kind}  T={T}  {H}x{W}")
    rng = np.random.default_rng(0)
    cfg = get_cfg_defaults()
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    model = deeplab_from_cfg(net_cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    print("init...", flush=True)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    ).lower().compile()()

    xs = jnp.asarray(rng.standard_normal((T, H, W, 3)).astype(np.float32))

    print("calibrate + quantize...", flush=True)
    t0 = time.perf_counter()
    qpack = quantize_deeplab(model, variables, [np.asarray(xs[:1])])
    print(f"  quantize_deeplab: {time.perf_counter() - t0:.1f} s", flush=True)

    ovh = scan_time("NULL (dispatch overhead / T)",
                    lambda f: f[:, :1, :1, :] + 1.0, xs)

    bb = backbone_module(model)
    bvars = _sub_variables(variables, "backbone")

    tb = scan_time(
        "bf16 backbone",
        lambda f, v: bb.apply(v, f, train=False)["feature"], xs, bvars)
    tq = scan_time(
        "int8 backbone",
        lambda f, v, q: quant_backbone_apply(bb, v, q, f)["feature"],
        xs, bvars, qpack)
    print(f"  backbone compute: bf16 {tb - ovh:.2f} vs int8 {tq - ovh:.2f} ms"
          f" -> {(tb - ovh) / (tq - ovh):.2f}x", flush=True)

    tf = scan_time(
        "bf16 full forward (argmax)",
        lambda f, v: jnp.argmax(
            model.apply(v, f, train=False, upsample_pred=False), -1),
        xs, variables)
    tqf = scan_time(
        "int8-backbone full forward (argmax)",
        lambda f, v, q: jnp.argmax(
            quant_deeplab_apply(model, v, q, f, upsample_pred=False), -1),
        xs, variables, qpack)
    print(f"  forward compute: bf16 {tf - ovh:.2f} vs int8 {tqf - ovh:.2f} ms"
          f" -> {(tf - ovh) / (tqf - ovh):.2f}x", flush=True)


if __name__ == "__main__":
    main()
