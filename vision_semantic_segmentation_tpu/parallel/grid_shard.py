"""Spatially sharded BEV grid updates — the context-parallel analogue.

The reference's global map can reach 5000x7000x5 cells (README.md:173-177);
SURVEY.md section 5 identifies the grid as the framework's "long axis" to
shard.  Here the planar grid's row axis (the map x/boundary axis) is partitioned
over a mesh axis: each device owns a row band kept resident in its HBM,
the cheap per-point math is replicated, and every device scatter-adds only
the points that fall inside its band — no cross-device traffic at all
during accumulation (cell ownership routes updates), and a single
all-gather only if/when the full map is rendered.

The per-band update is the engine's own fast path
(``SemanticMappingEngine._build_dense_update``: sort + segmented scan +
unique-index scatter + one MXU matmul), so both duplicate-semantics modes
('reference' fancy-index dedupe and 'accumulate') and the LiDAR lane boost
behave identically to the single-device step.  Cells are owned by exactly
one band, so per-band dedupe equals global dedupe.

Windowed mode (``MAPPING.UPDATE_WINDOW`` > 0) is honored: every device
computes the same global pose-centered window from the replicated
pointwise results, then updates only its band's intersection with it via
a dynamic slab slice — per-frame cost stays independent of the global
grid size, exactly as in the unsharded engine.
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


def make_band_updater(engine: SemanticMappingEngine, nshards: int) -> Callable:
    """Per-frame update of one device's (C, band, W) row band.

    Returns ``update(grid_band, shard_id, cell, cls, intensity, upd,
    weights=None) -> grid_band`` applying the engine's fast dense update to
    the band (or, in ``MAPPING.UPDATE_WINDOW`` mode, to the band's
    intersection with the pose-centered global window via a dynamic slab
    slice).  Shared by the grid-sharded step and the composed
    sharded-grid + frame-parallel runner, so every path keeps identical
    duplicate/window semantics.
    """
    dense_update = engine._build_dense_update()
    spec = engine.grid_spec
    h, w = spec.height, spec.width
    num_cls = engine.evidence.shape[0]
    assert h % nshards == 0, f"grid rows {h} must divide into {nshards} shards"
    band = h // nshards

    win = int(engine.update_window) if engine.update_window else 0
    windowed = 0 < win < max(h, w)
    # global window extents (matching engine._build_update) and the
    # per-band slab extents
    win_r = min(win, h)
    win_c = min(win, w)
    slab_r = min(win_r, band)

    def update(grid_band, shard_id, cell, cls, intensity, upd, weights=None):
        row = cell // w
        col = cell % w
        local_row = row - shard_id * band
        in_band = (local_row >= 0) & (local_row < band)
        ok = upd & in_band

        if not windowed:
            local_cell = local_row * w + col
            return dense_update(
                grid_band, local_cell, cls, intensity, ok, band, w, weights=weights
            )

        # Global window center from ALL updated points — the pointwise
        # inputs are replicated, so every shard computes identical r0/c0.
        n_upd = jnp.maximum(jnp.sum(upd), 1)
        r_mean = jnp.sum(jnp.where(upd, row, 0)) // n_upd
        c_mean = jnp.sum(jnp.where(upd, col, 0)) // n_upd
        r0 = jnp.clip(r_mean - win_r // 2, 0, max(h - win_r, 0))
        c0 = jnp.clip(c_mean - win_c // 2, 0, max(w - win_c, 0))
        # parity with the unsharded window: only points inside the GLOBAL
        # window are applied (the band slab may extend past it)
        in_gwin = (
            (row >= r0) & (row < r0 + win_r) & (col >= c0) & (col < c0 + win_c)
        )

        # this band's slab: covers the window∩band rows (possibly more)
        r0_local = jnp.clip(r0 - shard_id * band, 0, band - slab_r)
        lr = local_row - r0_local
        lc = col - c0
        in_slab = (lr >= 0) & (lr < slab_r) & (lc >= 0) & (lc < win_c)
        ok_w = ok & in_gwin & in_slab
        local_cell = lr * win_c + lc

        slab = jax.lax.dynamic_slice(
            grid_band, (0, r0_local, c0), (num_cls, slab_r, win_c)
        )
        slab = dense_update(
            slab, local_cell, cls, intensity, ok_w, slab_r, win_c, weights=weights
        )
        return jax.lax.dynamic_update_slice(grid_band, slab, (0, r0_local, c0))

    return update


def make_sharded_step(
    engine: SemanticMappingEngine,
    mesh: Mesh,
    axis: str = "grid",
    camera: str = "camera1",
    pcd_in_velodyne_frame: bool = False,
    confidence_weighting: bool = False,
) -> Callable:
    """Build a jitted frame step whose grid is row-sharded over ``axis``.

    Returns ``step(grid_sharded, pcd, valid, image, position, quaternion)``
    where ``grid_sharded`` has NamedSharding P(None, axis) on its row dim.
    Matches the single-device ``engine.step`` bit-for-bit in both
    duplicate-semantics modes (see tests/test_parallel.py).

    With ``confidence_weighting`` the step takes a trailing (N,) per-point
    ``weights`` argument (replicated, like the other pointwise inputs) and
    applies the engine's confidence-weighted update — identical semantics
    to the unsharded ``weights=`` path, since every cell is owned by
    exactly one band.
    """
    pointwise = engine._build_pointwise(camera, pcd_in_velodyne_frame)
    update_band = make_band_updater(engine, mesh.shape[axis])

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P(), P(), P(), P())
        + ((P(),) if confidence_weighting else ()),
        out_specs=P(None, axis),
    )
    def _sharded_update(grid_band, pcd, valid, image, position, quaternion, *wts):
        # grid_band: (C, band, W) planar slice owned by this device
        weights = wts[0] if confidence_weighting else None
        cell, cls, vis, upd, _ = pointwise(pcd, valid, image, position, quaternion)
        shard_id = jax.lax.axis_index(axis)
        return update_band(
            grid_band, shard_id, cell, cls, pcd[3], upd, weights=weights
        )

    return jax.jit(_sharded_update, donate_argnums=(0,))


def make_sharded_frame_parallel_run(
    engine: SemanticMappingEngine,
    mesh: Mesh,
    data_axis: str = "data",
    grid_axis: str = "grid",
    camera: str = "camera1",
    pcd_in_velodyne_frame: bool = False,
    confidence_weighting: bool = False,
) -> Callable:
    """Sharded grid x frame parallelism COMPOSED over a 2D mesh.

    The two scaling axes of the framework in one program (sp x fp,
    VERDICT r02 #10): grid rows shard over ``grid_axis`` (memory scales —
    the full-route 5000x7000 grid splits across HBMs, SURVEY.md section 5),
    while frames shard over ``data_axis`` (throughput scales — per-frame
    contributions add, parallel/frame_parallel.py).  Each device scans ITS
    frames into a partial of ITS row band; one psum over ``data_axis``
    combines the partials per band.  No cross-band traffic ever (cell
    ownership routes updates), exact up to f32 re-association of the
    per-band sum.

    Returns ``run(grid_sharded, pcds, valids, images, positions,
    quaternions[, weights])`` with the frame arrays stacked on a leading
    axis divisible by the ``data_axis`` size, and the grid sharded
    P(None, grid_axis).  Windowed mode is honored per frame.
    """
    from .frame_parallel import _mark_varying

    pointwise = engine._build_pointwise(camera, pcd_in_velodyne_frame)
    update_band = make_band_updater(engine, mesh.shape[grid_axis])

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, grid_axis),
            P(data_axis), P(data_axis), P(data_axis), P(data_axis), P(data_axis),
        )
        + ((P(data_axis),) if confidence_weighting else ()),
        out_specs=P(None, grid_axis),
    )
    def _run(grid_band, pcds, valids, images, positions, quaternions, *weights):
        shard_id = jax.lax.axis_index(grid_axis)

        def body(band, frame):
            pcd, valid, image, position, quaternion = frame[:5]
            w = frame[5] if confidence_weighting else None
            cell, cls, vis, upd, _ = pointwise(pcd, valid, image, position, quaternion)
            return update_band(
                band, shard_id, cell, cls, pcd[3], upd, weights=w
            ), None

        local = _mark_varying(jnp.zeros_like(grid_band), data_axis)
        local, _ = jax.lax.scan(
            body, local,
            (pcds, valids, images, positions, quaternions) + tuple(weights),
        )
        return grid_band + jax.lax.psum(local, data_axis)

    return jax.jit(_run, donate_argnums=(0,))


def init_sharded_grid(engine: SemanticMappingEngine, mesh: Mesh, axis: str = "grid") -> Array:
    """Allocate the planar (C, H, W) grid row-sharded across device HBMs."""
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.device_put(engine.init_grid(), sharding)


def gather_grid(grid_sharded: Array) -> Array:
    """Materialize the full grid on the host (render/eval path)."""
    return jax.device_get(grid_sharded)
