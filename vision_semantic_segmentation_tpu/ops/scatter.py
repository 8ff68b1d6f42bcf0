"""Masked scatter-add onto the BEV grid.

The heart of the Bayesian map update (ref `/root/reference/src/mapping.py:391-444`):
every labeled 3-D point adds a column of the log-probability confusion
matrix to its grid cell.  On TPU this is a single XLA scatter-add with the
mask folded into the *index* (invalid points get index -1 and are dropped
by ``mode='drop'``) — no host loop, no per-class python iteration,
deterministic accumulation order.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def masked_scatter_add_rows(
    grid: Array, cell_idx: Array, rows: Array, valid: Array
) -> Array:
    """grid[(cell_idx // W), (cell_idx %% W), :] += rows where valid.

    Args:
        grid: (H, W, C) accumulator.
        cell_idx: (N,) int32 flattened cell index (row * W + col).
        rows: (N, C) per-point additive contribution.
        valid: (N,) bool; invalid points are dropped.

    Returns:
        Updated (H, W, C) grid.
    """
    h, w, c = grid.shape
    flat = grid.reshape(h * w, c)
    idx = jnp.where(valid, cell_idx, h * w)
    flat = flat.at[idx].add(rows, mode="drop")
    return flat.reshape(h, w, c)


def masked_scatter_add_channel(
    grid: Array, cell_idx: Array, channel: int, amount: Array, valid: Array
) -> Array:
    """grid[..., channel] += amount at each valid point's cell.

    Used for the LiDAR lane-intensity boost (ref mapping.py:431-437).
    """
    h, w, c = grid.shape
    flat = grid.reshape(h * w, c)
    idx = jnp.where(valid, cell_idx, h * w)
    flat = flat.at[idx, channel].add(amount, mode="drop")
    return flat.reshape(h, w, c)


def bincount_2d(cell_idx: Array, valid: Array, num_cells: int) -> Array:
    """Count valid points per cell — useful for diagnostics/weighting."""
    idx = jnp.where(valid, cell_idx, num_cells)
    counts = jnp.zeros((num_cells,), dtype=jnp.int32)
    return counts.at[idx].add(1, mode="drop")
