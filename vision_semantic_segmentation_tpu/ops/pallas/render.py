"""Fused BEV finalize kernel (Pallas).

The map finalize path (ref mapping.py:332-340) runs three passes over the
evidence grid: 3x3 box smoothing (renderer.py:175-189), argmax coloring and
the zero-evidence mask (renderer.py:32-59).  For the full-route grid
(5000x7000x5 = 700 MB, README.md:173-177) every extra HBM pass costs ~ms,
so this kernel fuses all of it into ONE streaming pass:

    HBM (C, H+2, W) planar grid --DMA--> VMEM row tiles
      -> per-channel 3x3 mean (separable taps in registers)
      -> running argmax over C + evidence sum
      -> packed RGBA palette select
    --> (H, W) uint32 output

Layout notes (pallas_guide.md): channels-first planar so the W axis rides
the 128-lane dimension; the +-1-row halo is read by overlapping manual
DMAs (BlockSpec tiles cannot overlap); the caller pre-pads rows/cols with
reflect-101 so the kernel has no edge cases.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _pack_colors(label_colors: np.ndarray) -> np.ndarray:
    """(C, 3) RGB -> (C,) packed little-endian RGBA uint32 (alpha 255)."""
    c = np.asarray(label_colors, dtype=np.uint32)
    return (c[:, 0] | (c[:, 1] << 8) | (c[:, 2] << 16) | np.uint32(0xFF000000)).astype(
        np.uint32
    )


def _render_kernel(num_classes, tile_h, width, out_width, grid_hbm, colors_ref, out_ref, scratch, sem):
    i = pl.program_id(0)

    # overlapping halo DMA: Mosaic requires HBM slice extents aligned to
    # the (8, 128) tiling, so read T+8 rows and use the first T+2
    dma = pltpu.make_async_copy(
        grid_hbm.at[:, pl.ds(i * tile_h, tile_h + 8), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    best_val = None
    best_packed = None
    total = None
    for c in range(num_classes):
        plane = scratch[c]  # (T+8, W_in) f32
        # separable 3x3 mean: 3 horizontal taps then 3 vertical taps
        # (compute at the padded output width; padding columns are garbage
        # but sliced away by the caller)
        horiz = (
            plane[:, 0:out_width]
            + plane[:, 1 : out_width + 1]
            + plane[:, 2 : out_width + 2]
        )
        sm = (
            horiz[0:tile_h, :] + horiz[1 : tile_h + 1, :] + horiz[2 : tile_h + 2, :]
        ) * (1.0 / 9.0)
        packed_c = colors_ref[0, c]
        if best_val is None:
            best_val = sm
            best_packed = jnp.full(sm.shape, packed_c, jnp.uint32)
            total = sm
        else:
            better = sm > best_val  # strict: ties keep the lower index (argmax)
            best_val = jnp.where(better, sm, best_val)
            best_packed = jnp.where(better, jnp.uint32(packed_c), best_packed)
            total = total + sm
    out_ref[...] = jnp.where(total != 0.0, best_packed, jnp.uint32(0))


def render_bev_map_fused(
    grid: Array,
    label_colors: np.ndarray,
    tile_h: int = 0,
    interpret: bool = False,
) -> Array:
    """Smooth + argmax-render the grid in one fused pass.

    Equivalent to ``render_bev_map(apply_filter(grid), label_colors)``
    (ref mapping.py:332-334) but returns packed RGBA uint32; use
    :func:`unpack_rgba_image` for (H, W, 3) uint8.

    Args:
        grid: planar (C, H, W) float32 evidence grid (the engine's device
            layout — an (H, W, C) grid would tile-pad C to 128 lanes).
        label_colors: (C, 3) uint8 palette.
    """
    num_classes, h, w = grid.shape
    assert num_classes == len(label_colors)

    if tile_h <= 0:
        # size the row tile to the ~16MB VMEM budget: the halo scratch is
        # C*(T+8)*(W+130) f32 plus a handful of (T, W) working buffers
        budget = 8 * 1024 * 1024 / 4  # floats
        per_row = num_classes * (w + 130) + 8 * w
        tile_h = int(budget / per_row) - 8
        tile_h = max(8, min(64, (tile_h // 8) * 8))

    # reflect-101 pad on the spatial dims (cv2 filter2D border)
    planar = jnp.pad(grid, ((0, 0), (1, 1), (1, 1)), mode="reflect")  # (C, H+2, W+2)

    num_tiles = pl.cdiv(h, tile_h)
    # Mosaic DMA slices must be (8, 128)-tile aligned: every tile
    # over-reads T+8 rows, and the width pads up to a lane multiple
    pad_rows = num_tiles * tile_h + 8 - planar.shape[1]
    w_out = -(-w // 128) * 128
    w_in = w_out + 128  # room for the +2 horizontal taps, lane-aligned
    planar = jnp.pad(
        planar, ((0, 0), (0, max(pad_rows, 0)), (0, w_in - (w + 2)))
    )

    colors = jnp.asarray(_pack_colors(label_colors))[None, :]  # (1, C) for SMEM

    kernel = functools.partial(_render_kernel, num_classes, tile_h, w, w_out)
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full grid stays in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, w_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tile_h, w_out), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((num_classes, tile_h + 8, w_in), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(planar, colors)
    return out[:h, :w]


def unpack_rgba_image(packed: Array) -> Array:
    """(H, W) packed uint32 -> (H, W, 3) uint8 RGB."""
    packed = jnp.asarray(packed)
    return jnp.stack(
        [
            (packed & 0xFF).astype(jnp.uint8),
            ((packed >> 8) & 0xFF).astype(jnp.uint8),
            ((packed >> 16) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )
