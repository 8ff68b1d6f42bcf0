"""vision_semantic_segmentation_tpu — TPU-native probabilistic semantic mapping.

A brand-new JAX/XLA/Pallas framework with the capabilities of UCSD AVL's
``vision_semantic_segmentation`` (arXiv:2006.04894): DeepLabV3+ semantic
segmentation, LiDAR-camera fusion, Bayesian BEV grid mapping, rendering,
evaluation, deterministic replay, and the full training stack — redesigned
TPU-first so frames stream camera -> segmentation -> projection -> map
entirely on-device.

Subpackages
-----------
config      typed yacs-compatible configuration tree
geometry    batched JAX projective geometry (camera, plane, homography, SE3)
ops         TPU compute primitives (align-corners resize, warps, filters,
            scatter grid updates, Pallas kernels)
models      DeepLabV3+ model family in flax.linen + torch weight converter
mapping     the probabilistic BEV mapping engine + renderer + stitching
inference   jitted SemanticSegmentation predictor + convex-hull extraction
runtime     deterministic replay driver and in-process node/topic adapter
train       data pipeline, optimizers, checkpointing, SPMD trainer
parallel    device-mesh / sharding utilities (data-parallel + grid sharding)
evaluation  BEV map quality harness (IoU / accuracy / missing rate)
utils       logging, file IO, timers, seeding
"""

__version__ = "0.1.0"
