"""Fused evidence fold: ``grid += evidence @ observations`` in ONE pass.

The dense grid update's final step multiplies the (C, H*W) observation
buffer by the tiny (C, C) evidence matrix and adds into the planar grid
(mapping/engine.py).  As separate XLA ops the skinny dot materializes a
full (C, H*W) delta: read obs + write delta + read delta + read grid +
write grid = 5 passes (measured 3.4-3.7 ms at 2000^2 on v5e, ~10x the
raw traffic).  This kernel reads each obs tile once, folds the 5x5
evidence as 25 unrolled multiply-adds in registers, and accumulates into
the grid tile in place (input/output aliased): 3 passes, no delta.

Layout: planar (C, H, W) f32, C small (the 5 map channels).  Rows chunk
into VMEM-sized blocks; W stays whole per block (Mosaic pads the trailing
lane tile).  bench-measured: full dense update 11.8 -> 9.3 ms at
2000^2/2^17 with this kernel in place (scripts/probe_update_breakdown.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# rows per block, sized so (2 in + 1 out alias) * C * _ROWS * W * 4B fits
# VMEM with double-buffering margin at the full-route W=7000
_ROWS = 64


def _kernel(num_cls, e_ref, obs_ref, grid_ref, out_ref):
    obs = obs_ref[...]
    acc = [grid_ref[c].astype(jnp.float32) for c in range(num_cls)]
    for c in range(num_cls):
        for i in range(num_cls):
            acc[c] = acc[c] + e_ref[0, c * num_cls + i] * obs[i]
    for c in range(num_cls):
        out_ref[c] = acc[c].astype(out_ref.dtype)


def evidence_fold_add(
    grid: Array, observations: Array, evidence, interpret: bool = False
) -> Array:
    """Return ``grid + evidence @ observations`` (planar, fused, in-place).

    Args:
        grid: (C, H, W) f32 planar grid (donated into the output).
        observations: (C, H, W) f32 per-class observation planes.
        evidence: (C, C) host/np evidence matrix (column i = additive
            evidence when class i is observed, ref mapping.py:424).
    """
    import numpy as np

    num_cls, h, w = grid.shape
    assert observations.shape == grid.shape
    e_flat = jnp.asarray(
        np.asarray(evidence, dtype=np.float32).reshape(1, num_cls * num_cls)
    )
    rows = min(_ROWS, h)
    grid_spec = pl.GridSpec(
        grid=(pl.cdiv(h, rows),),
        in_specs=[
            pl.BlockSpec((1, num_cls * num_cls), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((num_cls, rows, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_cls, rows, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_cls, rows, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, num_cls),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(grid.shape, grid.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(e_flat, observations, grid)
