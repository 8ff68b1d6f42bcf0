"""Measure the fused multi-branch ASPP depthwise kernel on the real chip.

VERDICT r02 #4: ASPP's three dilated depthwise branches each re-read the
os8 feature map (~3.5 ms/branch floor); one Pallas pass sharing a single
HBM read is the one fusion not yet tried.  This probe times, at the
production ASPP shape (1440x1920 input -> os8 (180, 240, 2048) bf16,
dilations 12/24/36, ref aspp.py:51-64):

    A. 3x shifted XLA form (ShiftedDepthwiseConv default)
    B. 3x single-branch Pallas kernel (depthwise3x3_dilated)
    C. 1x fused multi-branch Pallas kernel (aspp_depthwise3x3_multi)

Each timing scans the op WINDOW times inside one jitted dispatch (the
dev tunnel costs ~30-40 ms per dispatch) and ends with a host readback.
Prints one JSON line with per-call milliseconds.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.ops.pallas.depthwise import (
        aspp_depthwise3x3_multi,
        depthwise3x3_dilated,
    )

    h, w, c = 180, 240, 2048
    dilations = (12, 24, 36)
    window = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.bfloat16)
    ks = [
        jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.1, jnp.float32)
        for _ in dilations
    ]

    def shifted_one(xx, k, d):
        xp = jnp.pad(xx, ((0, 0), (d, d), (d, d), (0, 0)))
        acc = None
        kf = k.astype(jnp.float32)
        for ti in range(3):
            for tj in range(3):
                sl = jax.lax.slice(
                    xp, (0, ti * d, tj * d, 0), (1, ti * d + h, tj * d + w, c)
                )
                term = sl.astype(jnp.float32) * kf[ti, tj, 0]
                acc = term if acc is None else acc + term
        return acc.astype(xx.dtype)

    def time_scanned(fn, label):
        @jax.jit
        def run(xx):
            def body(carry, _):
                outs = fn(carry)
                # FULL reduction of every output: a corner-slice consumer
                # would let XLA narrow the shifted form to a 1x1 compute
                # (slices propagate through elementwise ops) and fake a win
                s = sum(o.astype(jnp.float32).sum() for o in outs)
                return carry + (s * 1e-30).astype(carry.dtype), ()

            carry, _ = jax.lax.scan(body, xx, None, length=window)
            return carry

        out = run(x)
        jax.block_until_ready(out)
        float(jnp.sum(out[:, :2, :2, :2].astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x)
            float(jnp.sum(out[:, :2, :2, :2].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best / window * 1000.0

    t_shifted = time_scanned(
        lambda xx: [shifted_one(xx, k, d) for k, d in zip(ks, dilations)],
        "shifted",
    )
    t_single = time_scanned(
        lambda xx: [depthwise3x3_dilated(xx, k, d) for k, d in zip(ks, dilations)],
        "pallas3",
    )
    t_fused = time_scanned(
        lambda xx: aspp_depthwise3x3_multi(xx, ks, dilations), "fused"
    )

    # numerics: fused vs single-branch pallas must be bit-identical
    outs_f = aspp_depthwise3x3_multi(x, ks, dilations)
    maxerr = 0.0
    for o, k, d in zip(outs_f, ks, dilations):
        ref = depthwise3x3_dilated(x, k, d)
        maxerr = max(
            maxerr,
            float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32)))),
        )

    print(json.dumps({
        "shape": [h, w, c],
        "dilations": list(dilations),
        "ms_3x_shifted_xla": round(t_shifted, 2),
        "ms_3x_pallas_single": round(t_single, 2),
        "ms_fused_pallas": round(t_fused, 2),
        "fused_maxerr_vs_single": maxerr,
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
