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


def make_frame_parallel_run(
    engine: SemanticMappingEngine,
    mesh: Mesh,
    axis: str = "data",
    camera: str = "camera1",
    pcd_in_velodyne_frame: bool = False,
) -> Callable:
    """Build ``run(grid, pcds, valids, images, positions, quaternions)``.

    All frame arrays are stacked on a leading frame axis that must divide
    the mesh ``axis`` size; the grid is replicated in and out.  Windowed
    mode is not used here — each device touches the whole grid once per
    scan step (dense update), which is the right trade for offline
    throughput replay.
    """
    pointwise = engine._build_pointwise(camera, pcd_in_velodyne_frame)
    dense_update = engine._build_dense_update()
    spec = engine.grid_spec
    h, w = spec.height, spec.width

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def _run(grid, pcds, valids, images, positions, quaternions):
        def body(g, frame):
            pcd, valid, image, position, quaternion = frame
            cell, cls, vis, upd, _ = pointwise(pcd, valid, image, position, quaternion)
            return dense_update(g, cell, cls, pcd[3], upd, h, w), None

        # the zeros carry must be marked device-varying: the scanned frames
        # differ per device, so the carry out varies along the data axis
        local = jax.lax.pvary(jnp.zeros_like(grid), (axis,))
        local, _ = jax.lax.scan(
            body, local, (pcds, valids, images, positions, quaternions)
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
