"""Is XLA's s8xs8->s32 conv path worth building a quantized serving mode on?

The backbone's big pointwise convs are HBM-bandwidth-bound in bf16
(1x1 512->512 measures ~102 TFLOP/s ~= its roofline; probe_bn_fusion.py),
so no bf16 kernel can speed them up — but int8 halves the traffic AND
doubles the MXU peak (v5e: 394 TOPS).  This probe times
jax.lax.conv_general_dilated with int8 operands + preferred s32 output,
INCLUDING a realistic per-layer requantize (scale, round, clip to int8)
so the carry threads, against the same-shape bf16 conv.

Decision gate: if int8 (incl. requant) is not >=1.4x bf16 at the
production shapes, the quantized path is refuted before it is built.

Methodology: carry-threaded T=64 scans, NULL-corrected (probe_bn_fusion
postmortem), AOT lower+compile.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")

T = 64


def carry_time(name, step, x0, n=3, flops=None):
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
    eff = f"  ({flops / (best / T) / 1e12:6.1f} TOP/s eff)" if flops else ""
    print(f"{name:52s} {ms:8.3f} ms/frame{eff}", flush=True)
    return ms


def conv(x, w, dilation=(1, 1), padding=((0, 0), (0, 0)), prefer=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer,
    )


def main():
    print(f"device: {jax.devices()[0].device_kind}  T={T}")
    rng = np.random.default_rng(0)

    ovh = carry_time("NULL (dispatch overhead / T)",
                     lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32))

    shapes = [
        ("1x1 512->512 @180x240", (180, 240, 512), (1, 1, 512, 512), (1, 1)),
        ("1x1 2048->1024 @180x240 (layer4 conv1, requant to 2048)",
         (180, 240, 2048), (1, 1, 2048, 2048), (1, 1)),
        ("3x3d4 128->128 tile @180x240", (180, 240, 128), (3, 3, 128, 128),
         (4, 4)),
        ("3x3 dense 512->512 @180x240 (layer3-ish)",
         (180, 240, 512), (3, 3, 512, 512), (2, 2)),
    ]

    for name, xs, ws, dil in shapes:
        d = dil[0]
        pad = ((d, d), (d, d)) if ws[0] == 3 else ((0, 0), (0, 0))
        flops = 2 * xs[0] * xs[1] * ws[0] * ws[1] * ws[2] * ws[3]

        # bf16 baseline: conv + BN-ish affine + relu, carry bf16
        xb = jnp.asarray(
            rng.standard_normal((1, *xs)).astype(np.float32)
        ).astype(jnp.bfloat16)
        wb = jnp.asarray(
            (rng.standard_normal(ws) * 0.02).astype(np.float32)
        ).astype(jnp.bfloat16)
        scale_b = jnp.float32(0.98)

        def step_bf16(x, wb=wb, dil=dil, pad=pad, s=scale_b):
            y = conv(x, wb, dil, pad)
            return jax.nn.relu(y.astype(jnp.float32) * s).astype(jnp.bfloat16)

        tb = carry_time(f"bf16 {name}", step_bf16, xb, flops=flops) - ovh

        # int8: s8 conv -> s32, scale+relu+requant back to s8 (per-channel
        # scale vector - the production quantized-layer epilogue)
        xi = jnp.asarray(
            rng.integers(-127, 128, (1, *xs), dtype=np.int8)
        )
        wi = jnp.asarray(rng.integers(-127, 128, ws, dtype=np.int8))
        sc = jnp.asarray(
            (0.001 + rng.random(ws[3]).astype(np.float32) * 0.001)
        )

        def step_i8(x, wi=wi, dil=dil, pad=pad, sc=sc):
            y32 = conv(x, wi, dil, pad, prefer=jnp.int32)
            yf = jax.nn.relu(y32.astype(jnp.float32) * sc)
            return jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)

        ti = carry_time(f"int8 {name} (incl. requant)", step_i8, xi,
                        flops=flops) - ovh
        print(f"{'':52s} compute bf16 {tb:.3f} vs int8 {ti:.3f} ms "
              f"-> {tb / ti:.2f}x", flush=True)


if __name__ == "__main__":
    main()
