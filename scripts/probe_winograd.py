"""Measure Winograd F(2x2,3x3) vs direct conv at the backbone's hot shapes.

The tile-diagonal grouped conv leaves the backbone at the MXU roofline for
*executed* FLOPs; Winograd is the remaining algorithmic lever (2.25x fewer
multiplies for dense stride-1 3x3s).  This probe implements F(2x2,3x3)
with XLA ops only — input/output transforms as elementwise adds, the core
contraction as 16 batched (tiles x Cin) @ (Cin x Cout) matmuls — and times
it against lax direct conv at the ResNeXt-os8 layer shapes (dilated convs
run as dilation^2 interleaved phases).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_winograd.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def winograd_transform_weights(w):
    """(3, 3, Cin, Cout) -> (4, 4, Cin, Cout) = G g G^T (float32)."""
    G = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    w = w.astype(jnp.float32)
    # U[a,b] = sum_{k,l} G[a,k] G[b,l] w[k,l]
    return jnp.einsum("ak,bl,klio->abio", G, G, w)


def _input_transform(d):
    """(T, 4, 4, C) tiles -> B^T d B, expressed as adds/subs."""
    # rows: B^T d   (b0=d0-d2, b1=d1+d2, b2=d2-d1, b3=d1-d3)
    r0 = d[:, 0] - d[:, 2]
    r1 = d[:, 1] + d[:, 2]
    r2 = d[:, 2] - d[:, 1]
    r3 = d[:, 1] - d[:, 3]
    rows = jnp.stack([r0, r1, r2, r3], axis=1)  # (T, 4, 4, C)
    c0 = rows[:, :, 0] - rows[:, :, 2]
    c1 = rows[:, :, 1] + rows[:, :, 2]
    c2 = rows[:, :, 2] - rows[:, :, 1]
    c3 = rows[:, :, 1] - rows[:, :, 3]
    return jnp.stack([c0, c1, c2, c3], axis=2)  # (T, 4, 4, C)


def _output_transform(m):
    """(T, 4, 4, Cout) -> A^T m A -> (T, 2, 2, Cout)."""
    r0 = m[:, 0] + m[:, 1] + m[:, 2]
    r1 = m[:, 1] - m[:, 2] - m[:, 3]
    rows = jnp.stack([r0, r1], axis=1)  # (T, 2, 4, C)
    c0 = rows[:, :, 0] + rows[:, :, 1] + rows[:, :, 2]
    c1 = rows[:, :, 1] - rows[:, :, 2] - rows[:, :, 3]
    return jnp.stack([c0, c1], axis=2)  # (T, 2, 2, C)


def conv3x3_winograd_nodil(x, U, dtype=jnp.bfloat16):
    """'same' 3x3 stride-1 conv of (H, W, Cin) with transformed weights
    U (4,4,Cin,Cout).  Output (H, W, Cout)."""
    h, w, cin = x.shape
    cout = U.shape[-1]
    ph = (h + 1) // 2 * 2
    pw = (w + 1) // 2 * 2
    # 'same' halo of 1, plus round-up padding on the far side
    xp = jnp.pad(x, ((1, ph - h + 1), (1, pw - w + 1), (0, 0)))
    th, tw = ph // 2, pw // 2
    # gather overlapping 4x4 patches at stride 2: (th, tw, 4, 4, C)
    patches = jnp.stack(
        [
            jnp.stack(
                [xp[a : a + 2 * th : 2, b : b + 2 * tw : 2] for b in range(4)],
                axis=2,
            )
            for a in range(4)
        ],
        axis=2,
    )  # (th, tw, 4, 4, C)
    tiles = patches.reshape(th * tw, 4, 4, cin)
    V = _input_transform(tiles.astype(jnp.float32)).astype(dtype)  # (T,4,4,Cin)
    # 16 batched matmuls: M[a,b] = V[:,a,b,:] @ U[a,b]
    M = jnp.einsum(
        "tabi,abio->tabo", V, U.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    Y = _output_transform(M)  # (T, 2, 2, Cout) f32
    out = Y.reshape(th, tw, 2, 2, cout).transpose(0, 2, 1, 3, 4).reshape(ph, pw, cout)
    return out[:h, :w]


def conv3x3_winograd(x, w, dilation=1, dtype=jnp.bfloat16):
    U = winograd_transform_weights(w)
    if dilation == 1:
        return conv3x3_winograd_nodil(x, U, dtype)
    d = dilation
    h, wd, cin = x.shape
    ph = (h + d - 1) // d * d
    pw = (wd + d - 1) // d * d
    xp = jnp.pad(x, ((0, ph - h), (0, pw - wd), (0, 0)))
    # dilation^2 interleaved phases, each a stride-1 winograd conv
    phases = xp.reshape(ph // d, d, pw // d, d, cin).transpose(1, 3, 0, 2, 4)
    out = jax.vmap(
        jax.vmap(lambda xph: conv3x3_winograd_nodil(xph, U, dtype))
    )(phases)
    cout = w.shape[-1]
    out = out.transpose(2, 0, 3, 1, 4).reshape(ph, pw, cout)
    return out[:h, :wd]


def direct(x, w, dilation=1, dtype=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        x[None].astype(dtype),
        w.astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )[0]


def bench(fn, *args, iters=8):
    f = jax.jit(fn, static_argnums=(2,))
    out = f(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[:2, :2]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(jnp.sum(out[:2, :2]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main():
    rng = np.random.default_rng(0)
    shapes = [
        # (H, W, C, dilation, label)  — ResNeXt50-os8 grouped-3x3 tiles run
        # as C/128 dense 128->128 convs; also the full-width dense view
        (360, 480, 128, 1, "layer1 tile"),
        (180, 240, 256, 1, "layer2 tile x2"),
        (180, 240, 512, 2, "layer3 tile x4"),
        (180, 240, 1024, 4, "layer4 tile x8"),
    ]
    for h, w, c, dil, label in shapes:
        x = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
        t_dir, out_d = bench(direct, x, wgt, dil)
        t_win, out_w = bench(conv3x3_winograd, x, wgt, dil)
        err = float(
            jnp.max(jnp.abs(out_w - out_d))
            / (jnp.max(jnp.abs(out_d)) + 1e-9)
        )
        print(
            f"{label:16s} C={c:5d} d={dil}: direct {t_dir*1e3:7.2f} ms  "
            f"winograd {t_win*1e3:7.2f} ms  speedup {t_dir/t_win:4.2f}x  "
            f"rel-err {err:.2e}"
        )


if __name__ == "__main__":
    main()
