"""Dilated depthwise 3x3 conv kernel (Pallas) — MEASURED SLOWER; kept as
a documented experiment (not on the default path, like GroupedConvEinsum).

ASPP's atrous branches run depthwise 3x3 convs with dilations up to 36
over a (180, 240, 2048) feature map (ref aspp.py:51-64).  Expressed as
shifted multiply-adds, XLA re-reads the input once per tap (up to 9x HBM
traffic at full camera resolution).  This kernel streams the input from
HBM once per row tile: tiles with a 2*dilation halo are DMA'd into VMEM
(BlockSpec tiles cannot overlap, so the halo read is a manual
``make_async_copy`` — same pattern as render.py), channels ride the
128-lane axis in 128-channel slabs, and all nine taps are applied to the
loaded value in registers.

v5e measurements at (180, 240, 2048) bf16 vs the shifted XLA form:
d=12 6.4 vs 3.9 ms, d=24 6.8 vs 3.6 ms.  Two reasons it loses:
(1) the serialized DMA->compute per program (no double buffering), and
(2) VMEM limits the row tile to ~10-50 rows while the halo is 2*d rows,
so for d >= 24 the halo RE-READ amplification rivals or exceeds the 9x
tap traffic the kernel was meant to eliminate (at d=36 no tile fits at
all — ``supports`` returns False).  XLA's fused shifted form already
runs near effective bandwidth.  ShiftedDepthwiseConv therefore defaults
to the shifted path; set ``use_pallas=True`` to opt in.

Tap offsets (multiples of the dilation) are not sublane-aligned, so the
shifts happen at *value* level (lax.slice on the loaded array) — Mosaic
lowers those to in-register relayouts, while ref-level strided slices
would hit the (8, 128) tiling alignment requirement.

Only stride-1, pad == dilation, 3x3, C % 128 == 0 (the ASPP
configuration); callers fall back to the shifted formulation otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_VMEM_BUDGET = 8 * 1024 * 1024
_LANE_BLOCK = 128


def _kernel(tile_h, out_w, d, x_hbm, w_ref, o_ref, scratch, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[
            pl.ds(i * tile_h, tile_h + 2 * d),
            slice(None),
            pl.ds(j * _LANE_BLOCK, _LANE_BLOCK),
        ],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    # row slabs via REF slices (dim 0 is untiled -> arbitrary offsets ok);
    # only the W shifts need value-level slices.  Keeps the VMEM stack at
    # ~one row slab + a couple of output-tile temporaries instead of a
    # full scratch copy + 9 materialized taps.
    acc = None
    for ti in range(3):
        row = scratch[ti * d : ti * d + tile_h, :, :]
        for tj in range(3):
            sl = jax.lax.slice(
                row, (0, tj * d, 0), (tile_h, tj * d + out_w, _LANE_BLOCK)
            )
            term = sl * w_ref[ti * 3 + tj, :]
            acc = term if acc is None else acc + term
    o_ref[...] = acc


def _plan(h, w, d, itemsize):
    """(tile_h, w_out, w_in) sized to the VMEM budget, or None.

    Budget counts the scratch slab PLUS the live vector temporaries the
    Mosaic stack holds (~2 row slabs + ~3 output tiles) — intermediates
    live in VMEM, not just the declared scratch.
    """
    w_out = -(-w // 8) * 8
    w_in = w_out + 2 * d
    elems = _VMEM_BUDGET // (itemsize * _LANE_BLOCK)
    tile_h = (elems - 2 * d * w_in) // (3 * w_in + 3 * w_out)
    if tile_h < 8:
        return None
    return min(tile_h, h), w_out, w_in


def supports(h, w, c, dilation, itemsize) -> bool:
    """Whether the kernel applies (lane-full channel slabs, tile fits VMEM)."""
    return c % _LANE_BLOCK == 0 and _plan(h, w, dilation, itemsize) is not None


def depthwise3x3_dilated(
    x: Array,
    kernel: Array,
    dilation: int,
    interpret: bool = False,
) -> Array:
    """Depthwise 3x3, stride 1, pad = dilation (same-size output).

    Args:
        x: (1, H, W, C) feature map (C on the lane axis, C % 128 == 0).
        kernel: (3, 3, 1, C) depthwise weights (flax layout).
        dilation: atrous rate (also the per-side spatial zero padding).
    """
    assert x.ndim == 4 and x.shape[0] == 1, "single-frame NHWC expected"
    _, h, w, c = x.shape
    d = dilation
    plan = _plan(h, w, d, x.dtype.itemsize)
    assert c % _LANE_BLOCK == 0 and plan is not None, f"unsupported {(h, w, c, d)}"
    tile_h, w_out, w_in = plan
    num_tiles = pl.cdiv(h, tile_h)

    # zero pad: conv padding (d each side) plus slack so the last row tile
    # and the w_out-wide tap slices stay in bounds (cropped afterwards)
    xp = jnp.pad(
        x[0],
        ((d, num_tiles * tile_h - h + d), (d, w_in - w - d), (0, 0)),
    )
    w_flat = kernel.astype(x.dtype).reshape(9, c)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_h, w_out, d),
        grid=(num_tiles, c // _LANE_BLOCK),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full input stays in HBM
            pl.BlockSpec((9, _LANE_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, w_out, _LANE_BLOCK), lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tile_h, w_out, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * d, w_in, _LANE_BLOCK), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w_flat)
    return out[None, :h, :w]
