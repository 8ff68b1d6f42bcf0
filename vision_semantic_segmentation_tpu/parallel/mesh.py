"""Device mesh construction and sharding helpers.

The reference's parallelism surface is DataParallel / DDP+NCCL
(SURVEY.md section 2.11).  The TPU-native replacement is one global
``jax.sharding.Mesh`` whose axes are:

  * ``data`` — batch data parallelism (DDP equivalent; gradient psum is
    implicit in XLA SPMD over ICI)
  * ``grid`` — spatial sharding of the BEV map rows (the framework's
    context-parallel analogue, SURVEY.md section 5)

No process groups, no rendezvous code: multi-host launch reduces to
``jax.distributed.initialize()`` before mesh creation.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Args:
        axis_sizes: size per axis; defaults to all devices on one axis.
        axis_names: e.g. ('data',) or ('data', 'grid').
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == len(devices), (
        f"mesh {tuple(axis_sizes)} != {len(devices)} devices"
    )
    device_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(device_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding: leading axis split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def grid_row_sharding(mesh: Mesh, axis: str = "grid") -> NamedSharding:
    """BEV grid sharding: rows (the x/boundary axis) split over devices."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along the leading dim."""
    sharding = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_stacked_batches(mesh: Mesh, batches, axis: str = "data"):
    """Place (K, B, ...) stacked per-step batches: dim 0 = scan step
    (replicated), dim 1 = batch (sharded along ``axis``)."""
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batches)


def shard_spatial_batch(
    mesh: Mesh,
    batch,
    data_axis: Optional[str] = "data",
    spatial_axis: str = "spatial",
    steps_axis: bool = False,
):
    """Place a batch with the batch dim over ``data_axis`` AND image rows
    over ``spatial_axis`` (image (B, H, W, C) and label (B, H, W) share one
    spec — H is dim 1 of both).  ``steps_axis``: a leading K
    (steps-per-dispatch) axis stays unsharded.  Companion of
    :func:`..parallel.train_step.jit_spatial_train_step`."""
    spec = (P(None, data_axis, spatial_axis) if steps_axis
            else P(data_axis, spatial_axis))
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
