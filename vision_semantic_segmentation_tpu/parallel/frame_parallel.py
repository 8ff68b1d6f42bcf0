"""Frame-parallel offline replay — data parallelism over recorded frames.

The reference replays a recorded drive strictly sequentially
(`/root/reference/src/mapping_replay.py:175-211`): every frame's update is
an *addition* of per-frame evidence into the global grid, and the
reference's duplicate-collapse quirk applies within a single frame only
(ref mapping.py:424).  Per-frame contributions therefore commute, and a
whole bag can fuse data-parallel across a device mesh:

    frames sharded over the 'data' axis
      -> each device scans ITS frames into a local partial grid
      -> one psum -> the replicated global grid

This is exact up to float32 re-association of the cross-device sum (each
device's frames accumulate in recorded order; the psum reorders only the
final per-device partials).  Combine with ``parallel.grid_shard`` when the
grid itself exceeds one device's HBM; this module is the throughput lever
when the grid fits but the bag is long.
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


def _mark_varying(x, axis: str):
    """Mark ``x`` device-varying along ``axis``.

    ``jax.lax.pvary`` is deprecated in favor of ``pcast(..., to='varying')``
    (JAX >= 0.9); keep a fallback for older versions.
    """
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis,), to="varying")
    return jax.lax.pvary(x, (axis,))


def make_frame_parallel_run(
    engine: SemanticMappingEngine,
    mesh: Mesh,
    axis: str = "data",
    camera: str = "camera1",
    pcd_in_velodyne_frame: bool = False,
    confidence_weighting: bool = False,
) -> Callable:
    """Build ``run(grid, pcds, valids, images, positions, quaternions)``.

    All frame arrays are stacked on a leading frame axis that must divide
    the mesh ``axis`` size; the grid is replicated in and out.
    ``MAPPING.UPDATE_WINDOW`` is honored: each device's per-frame update
    then runs on a pose-centered slab of its local partial grid, exactly
    as in the unsharded engine (the partial grids still sum globally).

    With ``confidence_weighting`` the runner takes a trailing
    ``weights`` argument — stacked (T, N) per-point evidence weights
    (e.g. the network's softmax confidence at each point's pixel) sharded
    like the frames.
    """
    pointwise = engine._build_pointwise(camera, pcd_in_velodyne_frame)
    apply_update = engine._build_update()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis))
        + ((P(axis),) if confidence_weighting else ()),
        out_specs=P(),
    )
    def _run(grid, pcds, valids, images, positions, quaternions, *weights):
        def body(g, frame):
            pcd, valid, image, position, quaternion = frame[:5]
            w = frame[5] if confidence_weighting else None
            cell, cls, vis, upd, _ = pointwise(pcd, valid, image, position, quaternion)
            return apply_update(g, cell, cls, pcd[3], upd, weights=w), None

        # the zeros carry must be marked device-varying: the scanned frames
        # differ per device, so the carry out varies along the data axis
        local = _mark_varying(jnp.zeros_like(grid), axis)
        local, _ = jax.lax.scan(
            body, local,
            (pcds, valids, images, positions, quaternions) + tuple(weights),
        )
        return grid + jax.lax.psum(local, axis)

    return jax.jit(_run, donate_argnums=(0,))


def stack_frames(engine: SemanticMappingEngine, frames, mesh: Mesh, axis: str = "data"):
    """Stack FrameRecords for the frame-parallel runner, padded to a
    multiple of the mesh axis with zero-validity frames (no-ops)."""
    import numpy as np

    from ..mapping.engine import pad_points

    if not frames:
        raise ValueError("stack_frames: empty frame sequence")
    n_dev = mesh.shape[axis]
    pcds, valids, images, positions, quaternions = [], [], [], [], []
    for f in frames:
        pcd, valid = pad_points(
            np.asarray(f.pcd, np.float32), engine.point_bucket
        )
        pcds.append(pcd)
        valids.append(valid)
        images.append(np.asarray(f.semantic_image))
        positions.append(np.asarray(f.position, np.float32))
        quaternions.append(np.asarray(f.quaternion, np.float32))
    while len(pcds) % n_dev:
        pcds.append(np.zeros_like(pcds[0]))
        valids.append(np.zeros_like(valids[0]))
        images.append(np.zeros_like(images[0]))
        positions.append(np.zeros_like(positions[0]))
        quaternions.append(np.array([0, 0, 0, 1], np.float32))
    sharding = NamedSharding(mesh, P(axis))
    return tuple(
        jax.device_put(np.stack(x), sharding)
        for x in (pcds, valids, images, positions, quaternions)
    )
