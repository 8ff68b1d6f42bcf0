"""Hoisted-W-slice depthwise kernel: cut the relayout count 3x.

The shipped Pallas depthwise kernel (ops/pallas/depthwise.py) slices the
input at an unaligned W offset once PER TAP — 9 sublane relayouts per W
chunk — and ties the shifted XLA form at the ~3.5 ms/branch VPU floor
(ROUND_NOTES r02 finding 5).  But only THREE distinct W offsets exist
(tj * dilation): hoisting the W slice out of the row-tap loop — slice the
full padded-H column slab once per tj, then take H subranges on the
UNTILED major axis (free) — does the same math with 3 relayouts per
chunk, of which the tj=0 one is aligned when the chunk size is a sublane
multiple.  ~2.6x less relayout volume; if relayout dominates the 3.5 ms,
this should land well under it.

Variants at the production shape (180, 240, 2048) bf16:
  * shifted XLA form (shipped ASPP default)
  * shipped per-tap Pallas kernel
  * hoisted kernel, W_CHUNK 32 / 64 / 120
"""
import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from vision_semantic_segmentation_tpu.ops.pallas.depthwise import (
    _LANE_BLOCK,
    _VMEM_LIMIT,
    depthwise3x3_dilated,
)

T = 8
H, W, C = 180, 240, 2048


def _hoisted_kernel(out_h, out_w, d, w_chunk, x_ref, w_ref, o_ref):
    for cw in range(0, out_w, w_chunk):
        wc = min(w_chunk, out_w - cw)
        acc = None
        for tj in range(3):
            # ONE unaligned sublane slice per column offset (was: per tap)
            col = x_ref[:, cw + tj * d : cw + tj * d + wc, :]
            for ti in range(3):
                # value-level slice on the untiled major (H) axis: free
                sl = jax.lax.slice(
                    col, (ti * d, 0, 0), (ti * d + out_h, wc, _LANE_BLOCK)
                )
                term = sl.astype(jnp.float32) * w_ref[ti * 3 + tj, :]
                acc = term if acc is None else acc + term
        o_ref[:, cw : cw + wc, :] = acc.astype(o_ref.dtype)


def hoisted(x, kernel, d, w_chunk):
    _, h, w, c = x.shape
    w_out = -(-w // 8) * 8
    w_in = w_out + 2 * d
    xp = jnp.pad(x[0], ((d, d), (d, w_in - w - d), (0, 0)))
    w_flat = kernel.astype(jnp.float32).reshape(9, c)
    out = pl.pallas_call(
        functools.partial(_hoisted_kernel, h, w_out, d, w_chunk),
        grid=(c // _LANE_BLOCK,),
        in_specs=[
            pl.BlockSpec((h + 2 * d, w_in, _LANE_BLOCK), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, _LANE_BLOCK), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, w_out, _LANE_BLOCK), lambda j: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w_out, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, w_flat)
    return out[None, :, :w]


def _hoisted_f32col_kernel(out_h, out_w, d, w_chunk, x_ref, w_ref, o_ref):
    """Hoisted + convert each W column to f32 ONCE (3 converts/element
    instead of 9); taps become pure f32 FMAs."""
    for cw in range(0, out_w, w_chunk):
        wc = min(w_chunk, out_w - cw)
        acc = None
        for tj in range(3):
            col = x_ref[:, cw + tj * d : cw + tj * d + wc, :].astype(jnp.float32)
            for ti in range(3):
                sl = jax.lax.slice(
                    col, (ti * d, 0, 0), (ti * d + out_h, wc, _LANE_BLOCK)
                )
                term = sl * w_ref[ti * 3 + tj, :]
                acc = term if acc is None else acc + term
        o_ref[:, cw : cw + wc, :] = acc.astype(o_ref.dtype)


def _slab_f32_kernel(out_h, out_w, d, w_chunk, x_ref, w_ref, o_ref, xf_ref):
    """Convert the whole padded slab to f32 once into VMEM scratch
    (~1.9 converts/element amortized), then 9 pure-FMA taps."""
    xf_ref[:] = x_ref[:].astype(jnp.float32)
    for cw in range(0, out_w, w_chunk):
        wc = min(w_chunk, out_w - cw)
        acc = None
        for tj in range(3):
            col = xf_ref[:, cw + tj * d : cw + tj * d + wc, :]
            for ti in range(3):
                sl = jax.lax.slice(
                    col, (ti * d, 0, 0), (ti * d + out_h, wc, _LANE_BLOCK)
                )
                term = sl * w_ref[ti * 3 + tj, :]
                acc = term if acc is None else acc + term
        o_ref[:, cw : cw + wc, :] = acc.astype(o_ref.dtype)


def hoisted_variant(x, kernel, d, w_chunk, kind):
    _, h, w, c = x.shape
    w_out = -(-w // 8) * 8
    w_in = w_out + 2 * d
    xp = jnp.pad(x[0], ((d, d), (d, w_in - w - d), (0, 0)))
    w_flat = kernel.astype(jnp.float32).reshape(9, c)
    kern = {"f32col": _hoisted_f32col_kernel, "slab": _slab_f32_kernel}[kind]
    scratch = (
        [pltpu.VMEM((h + 2 * d, w_in, _LANE_BLOCK), jnp.float32)]
        if kind == "slab"
        else []
    )
    out = pl.pallas_call(
        functools.partial(kern, h, w_out, d, w_chunk),
        grid=(c // _LANE_BLOCK,),
        in_specs=[
            pl.BlockSpec((h + 2 * d, w_in, _LANE_BLOCK), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, _LANE_BLOCK), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, w_out, _LANE_BLOCK), lambda j: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w_out, c), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, w_flat)
    return out[None, :, :w]


def shifted_xla(x, kernel, d):
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    acc = None
    for i in range(3):
        for j in range(3):
            sl = xp[:, i * d : i * d + h, j * d : j * d + w, :]
            term = sl * kernel.reshape(9, -1)[i * 3 + j].astype(x.dtype)
            acc = term if acc is None else acc + term
    return acc


def scan_time(name, fn, x, kern, n=3):
    # thread the output through the carry so the scan can't hoist the
    # loop-invariant computation (output shape == input shape here)
    def run_impl(xx, kk):
        def body(carry, _):
            out = fn(carry, kk).astype(carry.dtype)
            return out, ()

        out, _ = jax.lax.scan(body, xx, None, length=T)
        return jnp.sum(out.astype(jnp.float32).reshape(-1)[:1])

    run = jax.jit(run_impl).lower(x, kern).compile()
    _ = float(run(x, kern))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        acc = run(x, kern)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best / T * 1e3:8.2f} ms", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}  shape ({H},{W},{C}) bf16")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    kern = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32) * 0.1)

    # correctness: same taps, different f32 accumulation order -> <=1 bf16 ulp
    for d in (12, 24, 36):
        ref = np.asarray(depthwise3x3_dilated(x, kern, d).astype(jnp.float32))
        for kind in ("f32col", "slab"):
            got = np.asarray(
                hoisted_variant(x, kern, d, 32, kind).astype(jnp.float32)
            )
            err = np.abs(ref - got).max()
            print(f"d={d} {kind} maxerr vs shipped pallas: {err} (<=1 bf16 ulp ok)")

    for d in (12, 24, 36):
        print(f"--- dilation {d} ---")
        scan_time("shipped pallas (per-tap slices)",
                  lambda xx, kk: depthwise3x3_dilated(xx, kk, d), x, kern)
        scan_time("hoisted f32-column (3 converts/elt)",
                  lambda xx, kk: hoisted_variant(xx, kk, d, 32, "f32col"), x, kern)
        scan_time("f32-slab scratch (1.9 converts/elt)",
                  lambda xx, kk: hoisted_variant(xx, kk, d, 32, "slab"), x, kern)


if __name__ == "__main__":
    main()
