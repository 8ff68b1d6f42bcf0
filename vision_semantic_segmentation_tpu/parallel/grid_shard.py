"""Spatially sharded BEV grid updates — the context-parallel analogue.

The reference's global map can reach 5000x7000x5 cells (README.md:173-177);
SURVEY.md section 5 identifies the grid as the framework's "long axis" to
shard.  Here the grid's row axis (the map x/boundary axis) is partitioned
over a mesh axis: each device owns a row band kept resident in its HBM,
the cheap per-point math is replicated, and every device scatter-adds only
the points that fall inside its band — no cross-device traffic at all
during accumulation (cell ownership routes updates), and a single
all-gather only if/when the full map is rendered.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..mapping.engine import SemanticMappingEngine
from ..ops.scatter import masked_scatter_add_channel, masked_scatter_add_rows

Array = jnp.ndarray


def make_sharded_step(
    engine: SemanticMappingEngine,
    mesh: Mesh,
    axis: str = "grid",
    camera: str = "camera1",
    pcd_in_velodyne_frame: bool = False,
) -> Callable:
    """Build a jitted frame step whose grid is row-sharded over ``axis``.

    Returns ``step(grid_sharded, pcd, valid, image, position, quaternion)``
    where ``grid_sharded`` has NamedSharding P(axis) on its row dim.
    Per-point semantics match the engine's 'accumulate' mode (per-point
    adds; the reference-quirk dedup is a single-device parity concern).
    """
    pointwise = engine._build_pointwise(camera, pcd_in_velodyne_frame)
    evidence_T = jnp.asarray(engine.evidence.T)
    spec = engine.grid_spec
    h, w = spec.height, spec.width
    lane = engine.lane_channel
    use_intensity = engine.use_intensity and lane >= 0
    nshards = mesh.shape[axis]
    assert h % nshards == 0, f"grid rows {h} must divide into {nshards} shards"
    band = h // nshards

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P()),
        out_specs=P(axis),
    )
    def _sharded_update(grid_band, pcd, valid, image, position, quaternion):
        cell, cls, vis, upd, boost = pointwise(pcd, valid, image, position, quaternion)
        shard_id = jax.lax.axis_index(axis)
        row = cell // w
        local_row = row - shard_id * band
        in_band = (local_row >= 0) & (local_row < band)
        local_cell = local_row * w + cell % w

        rows = evidence_T[jnp.clip(cls, 0)]
        grid_band = masked_scatter_add_rows(
            grid_band, local_cell, rows, upd & in_band
        )
        if use_intensity:
            grid_band = masked_scatter_add_channel(
                grid_band, local_cell, lane,
                jnp.full(local_cell.shape, 2.0, grid_band.dtype),
                boost & in_band,
            )
        return grid_band

    return jax.jit(_sharded_update)


def init_sharded_grid(engine: SemanticMappingEngine, mesh: Mesh, axis: str = "grid") -> Array:
    """Allocate the evidence grid directly sharded across device HBMs."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(engine.init_grid(), sharding)


def gather_grid(grid_sharded: Array) -> Array:
    """Materialize the full grid on the host (render/eval path)."""
    return jax.device_get(grid_sharded)
