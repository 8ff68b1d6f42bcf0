"""Spatially sharded BEV grid updates — the context-parallel analogue.

The reference's global map can reach 5000x7000x5 cells (README.md:173-177);
SURVEY.md section 5 identifies the grid as the framework's "long axis" to
shard.  Here the planar grid's row axis (the map x/boundary axis) is partitioned
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
    evidence_T = jnp.asarray(engine.evidence.T)  # row i = evidence column i
    spec = engine.grid_spec
    h, w = spec.height, spec.width
    num_cls = evidence_T.shape[0]
    lane = engine.lane_channel
    use_intensity = engine.use_intensity and lane >= 0
    nshards = mesh.shape[axis]
    assert h % nshards == 0, f"grid rows {h} must divide into {nshards} shards"
    band = h // nshards

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P(), P(), P(), P()),
        out_specs=P(None, axis),
    )
    def _sharded_update(grid_band, pcd, valid, image, position, quaternion):
        # grid_band: (C, band, W) planar slice owned by this device
        cell, cls, vis, upd, boost = pointwise(pcd, valid, image, position, quaternion)
        shard_id = jax.lax.axis_index(axis)
        row = cell // w
        local_row = row - shard_id * band
        in_band = (local_row >= 0) & (local_row < band)
        local_cell = local_row * w + cell % w
        ok = upd & in_band

        flat = grid_band.reshape(num_cls, band * w)
        idx = jnp.where(ok, jnp.clip(cls, 0) * (band * w) + local_cell,
                        num_cls * band * w)
        contrib = jnp.ones_like(local_cell, dtype=grid_band.dtype)
        obs = jnp.zeros((num_cls * band * w,), grid_band.dtype)
        obs = obs.at[idx].add(contrib, mode="drop")
        delta = jnp.matmul(
            jnp.asarray(engine.evidence, jnp.float32),
            obs.reshape(num_cls, band * w),
            precision=jax.lax.Precision.HIGHEST,
        )
        flat = flat + delta
        if use_intensity:
            bidx = jnp.where(boost & in_band, local_cell, band * w)
            bbuf = jnp.zeros((band * w,), grid_band.dtype)
            bbuf = bbuf.at[bidx].add(2.0, mode="drop")
            flat = flat.at[lane].add(bbuf)
        return flat.reshape(num_cls, band, w)

    return jax.jit(_sharded_update)


def init_sharded_grid(engine: SemanticMappingEngine, mesh: Mesh, axis: str = "grid") -> Array:
    """Allocate the planar (C, H, W) grid row-sharded across device HBMs."""
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.device_put(engine.init_grid(), sharding)


def gather_grid(grid_sharded: Array) -> Array:
    """Materialize the full grid on the host (render/eval path)."""
    return jax.device_get(grid_sharded)
