"""Does an int8 residual stream unlock the quantized backbone's win?

The composed int8 backbone measures only 1.16x over bf16 (22.96 vs
19.82 ms; scripts/probe_quant_backbone.py) although its convs run
1.44-1.79x faster in isolation — the gap is the float residual stream:
every block reads/writes the full-width bf16 activation (88-177 MB at
1440x1920) for the identity add plus a quantize pass at conv1.

This probe times ONE bottleneck block (layer3 and layer4 shapes) three
ways, carry-threaded so the interchange dtype is real:
  (a) bf16 block (baseline),
  (b) int8 convs, float residual (= models/quant.py today),
  (c) int8 convs AND int8 residual: the block consumes and emits int8;
      the identity dequantizes from int8 (44 MB read instead of 177).

If (c) does not reach ~1.4x over (a), the int8-residual redesign is
refuted before it is built.
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


def carry_time(name, step, x0, n=3):
    def run_impl(x, args):
        def body(carry, _):
            return step(carry, args), ()

        out, _ = jax.lax.scan(body, x, None, length=T)
        return jnp.sum(out.astype(jnp.float32).reshape(-1)[:1])

    x0, args = x0
    run = jax.jit(run_impl).lower(x0, args).compile()
    _ = float(run(x0, args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        acc = run(x0, args)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    ms = best / T * 1e3
    print(f"{name:56s} {ms:8.3f} ms/frame", flush=True)
    return ms


def conv(x, w, dilation=(1, 1), padding=((0, 0), (0, 0)), prefer=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer,
    )


def grouped_tiles(x, w_t, dilation, padding, prefer=None):
    T_ = w_t.shape[2]
    cin_t = x.shape[-1] // T_
    outs = [
        conv(jax.lax.slice_in_dim(x, t * cin_t, (t + 1) * cin_t, axis=3),
             w_t[:, :, t], dilation, padding, prefer)
        for t in range(T_)
    ]
    return jnp.concatenate(outs, axis=-1)


def main():
    print(f"device: {jax.devices()[0].device_kind}  T={T}")
    rng = np.random.default_rng(0)
    H, W = 180, 240

    ovh = carry_time("NULL (dispatch overhead / T)",
                     lambda x, a: x + 1.0, (jnp.zeros((8, 128), jnp.float32), ()))

    for cname, cfull, width, tiles, d in [
        ("layer3", 1024, 512, 4, 2),
        ("layer4", 2048, 1024, 8, 4),
    ]:
        pad = ((d, d), (d, d))
        # weights
        w1 = (rng.standard_normal((1, 1, cfull, width)) * 0.02).astype(np.float32)
        w2t = (rng.standard_normal((3, 3, tiles, 128, width // tiles)) * 0.02
               ).astype(np.float32)
        w3 = (rng.standard_normal((1, 1, width, cfull)) * 0.02).astype(np.float32)
        s1 = (0.001 + rng.random(width) * 0.001).astype(np.float32)
        s2 = (0.001 + rng.random(width) * 0.001).astype(np.float32)
        s3 = (0.001 + rng.random(cfull) * 0.001).astype(np.float32)

        # (a) bf16
        xb = jnp.asarray(rng.standard_normal((1, H, W, cfull)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        args_b = tuple(jnp.asarray(w).astype(jnp.bfloat16)
                       for w in (w1, w2t, w3))

        def step_bf16(x, args, d=d, pad=pad):
            w1b, w2b, w3b = args
            y = jax.nn.relu(conv(x, w1b))
            y = jax.nn.relu(grouped_tiles(y, w2b, (d, d), pad))
            y = conv(y, w3b)
            return jax.nn.relu(
                y.astype(jnp.float32) * 0.98 + x.astype(jnp.float32)
            ).astype(jnp.bfloat16)

        ta = carry_time(f"(a) bf16 {cname} block", step_bf16, (xb, args_b)) - ovh

        w1q = jnp.asarray(np.clip(np.round(w1 / 0.0002), -127, 127
                                  ).astype(np.int8))
        w2q = jnp.asarray(np.clip(np.round(w2t / 0.0002), -127, 127
                                  ).astype(np.int8))
        w3q = jnp.asarray(np.clip(np.round(w3 / 0.0002), -127, 127
                                  ).astype(np.int8))
        sv1, sv2, sv3 = (jnp.asarray(s) for s in (s1, s2, s3))
        args_q = (w1q, w2q, w3q, sv1, sv2, sv3)

        # (b) int8 convs, float (bf16) residual carry
        def step_i8_floatres(x, args, d=d, pad=pad):
            w1q, w2q, w3q, sv1, sv2, sv3 = args
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 8.0), -127, 127
                          ).astype(jnp.int8)
            y = conv(xq, w1q, prefer=jnp.int32)
            y = jnp.clip(jnp.round(y.astype(jnp.float32) * sv1), 0, 127
                         ).astype(jnp.int8)
            y = grouped_tiles(y, w2q, (d, d), pad, prefer=jnp.int32)
            y = jnp.clip(jnp.round(y.astype(jnp.float32) * sv2), 0, 127
                         ).astype(jnp.int8)
            y = conv(y, w3q, prefer=jnp.int32)
            yf = y.astype(jnp.float32) * sv3
            return jax.nn.relu(yf + x.astype(jnp.float32)).astype(jnp.bfloat16)

        tb = carry_time(f"(b) int8 convs, bf16 residual {cname}",
                        step_i8_floatres, (xb, args_q)) - ovh

        # (c) int8 convs AND int8 residual carry
        xi = jnp.asarray(rng.integers(-127, 128, (1, H, W, cfull),
                                      dtype=np.int8))

        def step_i8_i8res(x, args, d=d, pad=pad):
            w1q, w2q, w3q, sv1, sv2, sv3 = args
            y = conv(x, w1q, prefer=jnp.int32)
            y = jnp.clip(jnp.round(y.astype(jnp.float32) * sv1), 0, 127
                         ).astype(jnp.int8)
            y = grouped_tiles(y, w2q, (d, d), pad, prefer=jnp.int32)
            y = jnp.clip(jnp.round(y.astype(jnp.float32) * sv2), 0, 127
                         ).astype(jnp.int8)
            y = conv(y, w3q, prefer=jnp.int32)
            # epilogue: dequant conv out + dequant identity, relu, requant
            yf = y.astype(jnp.float32) * sv3 + x.astype(jnp.float32) * 0.01
            return jnp.clip(jnp.round(yf * 12.7), 0, 127).astype(jnp.int8)

        tc = carry_time(f"(c) int8 convs + int8 residual {cname}",
                        step_i8_i8res, (xi, args_q)) - ovh
        print(f"    {cname}: (a) {ta:.3f}  (b) {tb:.3f} ({ta / tb:.2f}x)  "
              f"(c) {tc:.3f} ({ta / tc:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
