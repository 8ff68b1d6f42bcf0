"""Spatial (model-parallel) sharded inference of the segmentation forward.

The reference serves its network on a single GPU — it has no model
parallelism at all (SURVEY.md section 2.11; ref
vision_semantic_segmentation_node.py runs one torch module in-process).
On a TPU slice the idiomatic way to cut single-frame latency below what
one chip can deliver is GSPMD *spatial partitioning*: shard the image's
row axis over a mesh axis and let XLA insert the halo exchanges
(ICI collective-permutes) every conv window needs at shard edges.

Design notes (TPU-first):
  * Parameters stay replicated: ResNeXt50-32x4d is ~50 MB in bf16,
    negligible next to the 1440x1920 activation footprint the sharding
    divides by the mesh size.
  * Every op in the forward is GSPMD-partitionable along H: convs get
    halos, the matmul-based resizes (ops/resize.py) contract the sharded
    H axis through an interpolation matrix, ASPP's global pooling becomes
    an all-reduce, BN at inference is elementwise affine.
  * Numerics: spatial partitioning does not re-associate any reduction —
    each output pixel's conv window sum is computed in the same order —
    so sharded == single-device results bit-for-bit (asserted in
    tests/test_spatial_infer.py).

This complements the existing axes: dp (batch), fp (frames), sp (grid
rows).  ``mp`` shards the *network forward* itself.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jnp.ndarray


def make_spatial_forward(
    model,
    mesh: Mesh,
    axis: str = "grid",
    upsample_pred: bool = False,
    argmax: bool = True,
    donate_image: bool = False,
    band_output: Optional[bool] = None,
):
    """Build a jitted forward with image rows sharded over ``mesh[axis]``.

    Args:
        model: a flax module with ``apply(variables, image, train,
            upsample_pred)`` returning NHWC logits (models/deeplab.py).
        mesh: the device mesh; ``axis`` names the sharded dimension.
        upsample_pred: bilinearly upsample logits to input resolution
            before the argmax (VISION_SEM_SEG.UPSAMPLE_PRED semantics).
        argmax: return int32 class ids (N, H', W') instead of logits.
        band_output: force the result to materialize row-banded (each
            chip holds only its band).  Requires the output row count to
            divide by the mesh axis — guaranteed when ``upsample_pred``
            and the input divides, NOT at decoder resolution (the
            valid-pad refine shrinks rows, models/decoder.py).  Default:
            banded iff ``upsample_pred``, else compiler-chosen.

    Returns:
        ``forward(variables, image)`` — image (N, H, W, 3) float32.
    """
    if band_output is None:
        band_output = upsample_pred
    replicated = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P(None, axis))
    out_sharding = row_sharded if band_output else None

    def forward_impl(variables, image):
        logits = model.apply(
            variables, image, train=False, upsample_pred=upsample_pred
        )
        if argmax:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return logits

    return jax.jit(
        forward_impl,
        in_shardings=(replicated, row_sharded),
        out_shardings=out_sharding,
        donate_argnums=(1,) if donate_image else (),
    )


def shard_image(mesh: Mesh, image: Array, axis: str = "grid") -> Array:
    """Place an (N, H, W, C) image with rows banded over ``axis``."""
    return jax.device_put(image, NamedSharding(mesh, P(None, axis)))


def replicate_variables(mesh: Mesh, variables):
    """Replicate a variable pytree across the mesh (explicit placement
    avoids a broadcast inside every forward dispatch)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), variables)
