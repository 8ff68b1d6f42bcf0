"""AOT export of compiled pipeline programs (serving / cold-start path).

``jax.export`` serializes a lowered program (StableHLO) to bytes; loading
it back skips Python tracing and JAX lowering entirely — the serving
process pays only the XLA backend compile, which the persistent compile
cache also covers.  For this framework that matters twice over:

  * production serving: a deployment artifact that starts in seconds
    instead of re-tracing the fused camera+LiDAR program at boot;
  * this dev environment: tracing/lowering is host-side and was the
    dominant warm-up cost (ROUND_NOTES r03's 39 s/constant readback
    postmortem) — an exported program sidesteps the whole phase.

The export captures the full fused sequence runner: undistort/scale ->
DeepLab forward -> argmax -> point projection -> evidence update, scanned
over a frame window with the grid donated (donation survives the
round-trip — verified in tests).

Portability: a serialized program is tied to the ambient jax/StableHLO
version compatibility window and to the platform it was lowered for
(`Exported.platforms`); load-time errors surface as ValueError.
"""
from __future__ import annotations

import io
import json
import struct
from typing import Callable, Tuple

import numpy as np

_MAGIC = b"VSSTEXP1"


def export_sequence_runner(
    pipeline,
    path: str,
    image_hw: Tuple[int, int],
    window: int,
    camera: str = "camera1",
    pcd_frame_id: str = "",
) -> str:
    """Serialize the fused sequence runner for ``window``-frame dispatches.

    Args:
        pipeline: a :class:`~.pipeline.FusedFramePipeline` (its model
            variables' VALUES are not captured — they are an argument of
            the exported program, supplied again at load time).
        path: output file.
        image_hw: camera frame size the program is specialized to.
        window: frames per dispatch (the scan length).

    Returns ``path``.
    """
    import jax
    from jax import export as jex
    import jax.numpy as jnp
    from functools import partial

    engine = pipeline.engine
    spec = engine.grid_spec
    bucket = engine.point_bucket
    step = pipeline._build(camera, tuple(image_hw), pcd_frame_id == "velodyne")

    def run_impl(variables, grid, frames):
        def body(g, frame):
            g, _ = step(
                variables, g, frame["image"], frame["pcd"], frame["valid"],
                frame["position"], frame["quaternion"],
            )
            return g, ()

        grid, _ = jax.lax.scan(body, grid, frames)
        return grid

    sd = jax.ShapeDtypeStruct
    var_shapes = jax.tree.map(
        lambda a: sd(a.shape, a.dtype), pipeline.variables
    )
    grid_shape = sd((spec.num_classes, spec.height, spec.width), jnp.float32)
    frame_shapes = {
        "image": sd((window, image_hw[0], image_hw[1], 3), jnp.uint8),
        "pcd": sd((window, 4, bucket), jnp.float32),
        "valid": sd((window, bucket), jnp.bool_),
        "position": sd((window, 3), jnp.float32),
        "quaternion": sd((window, 4), jnp.float32),
    }
    exported = jex.export(jax.jit(run_impl, donate_argnums=(1,)))(
        var_shapes, grid_shape, frame_shapes
    )
    blob = exported.serialize()

    meta = json.dumps({
        "image_hw": list(image_hw),
        "window": window,
        "camera": camera,
        "pcd_frame_id": pcd_frame_id,
        "grid_shape": [spec.num_classes, spec.height, spec.width],
        "point_bucket": bucket,
        "distortion": pipeline.distortion,
        "platforms": list(exported.platforms),
    }).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(meta)))
        f.write(meta)
        f.write(blob)
    return path


def load_sequence_runner(path: str, variables) -> Tuple[Callable, dict]:
    """Load an exported runner; returns (run, meta).

    ``run(grid, frames) -> grid`` with the same contract as
    ``FusedFramePipeline.build_sequence_runner`` (grid donated);
    ``variables`` must match the exporting pipeline's tree/shapes.
    No tracing of the pipeline happens — only the thin ``Exported.call``
    wrapper is staged.
    """
    import jax
    from jax import export as jex

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a vsst export file")
        (meta_len,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(meta_len).decode())
        blob = f.read()
    exported = jex.deserialize(bytearray(blob))
    call = jax.jit(exported.call, donate_argnums=(1,))

    def run(grid, frames):
        return call(variables, grid, frames)

    return run, meta
