"""Measure int8 ASPP+decoder at production shapes (VERDICT r03 #5).

ROUND_NOTES r03 refuted int8 ASPP/decoder "by extrapolation: same
composition pattern, smaller convs" — the only refutation in the repo
without a number.  This probe supplies the number: the composed
ASPP+decoder stage (the whole post-backbone head, ref aspp.py:51-93 +
decoder.py at the deployed widths, os8 production shapes: feature
(180, 240, 2048), low-level (360, 480, 256)) timed in bf16 vs int8.

Quantization design mirrors the shipped backbone path (models/quant.py):
MXU (pointwise / dense 3x3) convs in s8xs8->s32 with per-cout requantize
epilogues; the 3x3 DEPTHWISE atrous branches stay bf16 in BOTH variants
(they are VPU/relayout-bound — probe_aspp_fused — where int8 has no MXU
peak to unlock and grouped int8 would need a 2048-group diagonal
expansion).

Decision gate (VERDICT): if the composed int8 head is not >=1.15x the
bf16 head, the extrapolated refutation is CONFIRMED by measurement and
the claim is retired with a number; if it is, wire it into `quantize`.

Methodology: carry-threaded T>=16 scans, NULL-corrected, AOT
lower+compile (CLAUDE.md measurement rules).
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")

T = 32
FEAT_HW = (180, 240)      # os8 feature grid at 1440x1920
LOW_HW = (360, 480)       # os4 low-level grid
DILATIONS = (12, 24, 36)


def carry_time(name, step, x0, n=3):
    def run_impl(x):
        def body(carry, _):
            return step(carry), ()

        out, _ = jax.lax.scan(body, x, None, length=T)
        return jnp.sum(out.astype(jnp.float32).reshape(-1)[:1])

    run = jax.jit(run_impl).lower(x0).compile()
    _ = float(run(x0))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        acc = run(x0)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    ms = best / T * 1e3
    print(f"{name:46s} {ms:8.3f} ms/frame", flush=True)
    return ms


def conv(x, w, dilation=(1, 1), padding="SAME", groups=1, prefer=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=prefer,
    )


def resize_bilinear(x, hw):
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[3]), method="bilinear"
    )


class Weights:
    """Host-numpy weights (device-array closure constants cost ~39 s/array
    at every lowering through the tunnel — CLAUDE.md)."""

    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)

        def w(*shape, scale=0.02):
            return (rng.standard_normal(shape) * scale).astype(np.float32)

        # ASPP: 1x1 branch, 3 separable atrous (depthwise + pointwise),
        # pooled branch, projection (5*256 concat -> 256)
        self.b0 = w(1, 1, 2048, 256)
        self.dw = [w(3, 3, 1, 2048) for _ in DILATIONS]
        self.pw = [w(1, 1, 2048, 256) for _ in DILATIONS]
        self.pool = w(1, 1, 2048, 256)
        self.proj = w(1, 1, 1280, 256)
        # decoder: low 1x1 256->48, two refine separables (304->256,
        # 256->256: depthwise + pointwise like the model), classifier 1x1
        self.low = w(1, 1, 256, 48)
        self.r1dw = w(3, 3, 1, 304)
        self.r1pw = w(1, 1, 304, 256)
        self.r2dw = w(3, 3, 1, 256)
        self.r2pw = w(1, 1, 256, 256)
        self.cls = w(1, 1, 256, 19)

        self.mxu_names = [
            "b0", "pw0", "pw1", "pw2", "pool", "proj",
            "low", "r1pw", "r2pw", "cls",
        ]

    def mxu_kernels(self):
        return {
            "b0": self.b0, "pw0": self.pw[0], "pw1": self.pw[1],
            "pw2": self.pw[2], "pool": self.pool, "proj": self.proj,
            "low": self.low, "r1pw": self.r1pw, "r2pw": self.r2pw,
            "cls": self.cls,
        }


def make_head(weights, quantized: bool):
    """The composed ASPP+decoder head.  bf16 throughout, except (when
    ``quantized``) the MXU convs run s8xs8->s32 with per-cout requantize:
    absmax weight scales baked host-side, activations quantized at a
    fixed calibrated scale (value irrelevant to timing)."""
    kern = weights.mxu_kernels()
    if quantized:
        q = {}
        for name, k in kern.items():
            s = np.abs(k).max(axis=(0, 1, 2)) / 127.0 + 1e-12
            q[name] = (
                np.clip(np.round(k / s), -127, 127).astype(np.int8),
                s.astype(np.float32),
            )

        def mxu(name, x, relu=True):
            wi, s = q[name]
            xi = jnp.clip(
                jnp.round(x.astype(jnp.float32) * 16.0), -127, 127
            ).astype(jnp.int8)
            y = conv(xi, jnp.asarray(wi), prefer=jnp.int32)
            yf = y.astype(jnp.float32) * (jnp.asarray(s) / 16.0)
            yf = jax.nn.relu(yf) if relu else yf
            return yf.astype(jnp.bfloat16)
    else:
        def mxu(name, x, relu=True):
            y = conv(x, jnp.asarray(kern[name]).astype(jnp.bfloat16))
            y = y.astype(jnp.float32)
            y = jax.nn.relu(y) if relu else y
            return y.astype(jnp.bfloat16)

    dws = [np.asarray(d) for d in weights.dw]
    r1dw, r2dw = np.asarray(weights.r1dw), np.asarray(weights.r2dw)

    def head(feat, low_feat):
        # ASPP (ref aspp.py:51-93)
        branches = [mxu("b0", feat)]
        for i, d in enumerate(DILATIONS):
            dw = conv(
                feat, jnp.asarray(dws[i]).astype(jnp.bfloat16),
                dilation=(d, d), groups=2048,
            )
            dw = jax.nn.relu(dw.astype(jnp.float32)).astype(jnp.bfloat16)
            branches.append(mxu(f"pw{i}", dw))
        pooled = jnp.mean(feat.astype(jnp.float32), axis=(1, 2), keepdims=True)
        pooled = mxu("pool", pooled.astype(jnp.bfloat16))
        pooled = jnp.broadcast_to(
            pooled, (feat.shape[0], *FEAT_HW, 256)
        )
        x = jnp.concatenate(branches + [pooled], axis=-1)
        x = mxu("proj", x)
        # decoder
        low = mxu("low", low_feat)
        x = resize_bilinear(x.astype(jnp.float32), LOW_HW).astype(jnp.bfloat16)
        x = jnp.concatenate([x, low], axis=-1)
        for dwk, pwn, g in ((r1dw, "r1pw", 304), (r2dw, "r2pw", 256)):
            dw = conv(
                x, jnp.asarray(dwk).astype(jnp.bfloat16), groups=g
            )
            dw = jax.nn.relu(dw.astype(jnp.float32)).astype(jnp.bfloat16)
            x = mxu(pwn, dw)
        return mxu("cls", x, relu=False)

    return head


def main():
    print(f"device: {jax.devices()[0].device_kind}  T={T}")
    print(f"shapes: feat (1,{FEAT_HW[0]},{FEAT_HW[1]},2048) "
          f"low (1,{LOW_HW[0]},{LOW_HW[1]},256)")
    rng = np.random.default_rng(1)
    weights = Weights()

    feat0 = jnp.asarray(
        rng.standard_normal((1, *FEAT_HW, 2048)).astype(np.float32)
    ).astype(jnp.bfloat16)
    low0 = np.abs(rng.standard_normal((1, *LOW_HW, 256))).astype(np.float32)
    low_host = low0  # closure constant stays host numpy

    ovh = carry_time("NULL (dispatch overhead / T)",
                     lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32))

    results = {}
    for quantized in (False, True):
        head = make_head(weights, quantized)

        def step(feat, head=head):
            out = head(feat, jnp.asarray(low_host).astype(jnp.bfloat16))
            # thread the head output back into the carry so the scan body
            # cannot be hoisted (CLAUDE.md measurement rule)
            bump = jnp.mean(out.astype(jnp.float32)) * 1e-6
            return (feat.astype(jnp.float32) + bump).astype(jnp.bfloat16)

        label = "int8 MXU convs" if quantized else "bf16"
        results[quantized] = carry_time(
            f"ASPP+decoder head [{label}]", step, feat0
        ) - ovh

    speedup = results[False] / results[True]
    print(
        f"\ncomposed head: bf16 {results[False]:.3f} ms vs int8 "
        f"{results[True]:.3f} ms -> {speedup:.2f}x "
        f"({'>=1.15x: wire into quantize' if speedup >= 1.15 else 'refutation CONFIRMED by measurement'})"
    )


if __name__ == "__main__":
    main()
