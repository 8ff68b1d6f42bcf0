"""Jitted semantic segmentation predictor.

Rebuild of `/root/reference/src/semantic_segmentation.py:20-57`: build the
model from config, load weights, and run preprocess + forward + argmax per
frame.  TPU-first differences:

  * preprocessing (scale to [0,1], ImageNet normalize — the reference's
    ToTensor+Normalize, ref :35-39) is fused INTO the jitted forward, so a
    raw uint8 frame is the only host->device transfer;
  * the conv path can run in bfloat16 (params stay fp32);
  * input sizes are bucketed: each distinct (H, W) compiles once and is
    cached, avoiding the recompile-per-shape trap (SURVEY.md section 7).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.build import build_model
from ..models.convert import load_npz, load_torch_checkpoint
from ..ops.colormap import MAPILLARY_19_PALETTE, apply_color_map
from ..ops.resize import resize_area, resize_nearest

Array = jnp.ndarray

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class SemanticSegmentation:
    """End-to-end segmentation: uint8 RGB frame -> label map.

    Args:
        cfg: network config node (demo tree).
        variables: optional pre-loaded flax variables; otherwise
            ``cfg.MODEL.WEIGHT`` is loaded (.npz native, .pth via the
            torch converter).
        compute_dtype: 'bfloat16' (default, MXU-native) or 'float32'.
    """

    def __init__(self, cfg, variables=None, compute_dtype: Optional[str] = None):
        if compute_dtype is None:
            compute_dtype = (
                cfg.MODEL.COMPUTE_DTYPE if "COMPUTE_DTYPE" in cfg.MODEL else "bfloat16"
            )
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.model, self.loss_fn, self.train_metric, self.val_metric = build_model(
            cfg, dtype=dtype
        )
        self.cfg = cfg

        if variables is None:
            weight = cfg.MODEL.WEIGHT
            if not weight:
                raise ValueError("cfg.MODEL.WEIGHT is empty and no variables given")
            if weight.endswith(".pth"):
                variables = load_torch_checkpoint(weight)
            else:
                variables = load_npz(weight)
        self.variables = jax.tree.map(jnp.asarray, variables)

        # Spatially-sharded (model-parallel) serving: every frame's rows
        # band over a ('grid',) mesh and GSPMD inserts the conv halo
        # exchanges over ICI — the idiomatic way to cut single-frame
        # latency below one chip (parallel/spatial_infer.py design notes;
        # exact: spatial partitioning re-associates no reduction).  0/1 =
        # off.  Prefer H % shards == 0 input heights.
        shards = (
            int(cfg.MODEL.SPATIAL_SHARDS) if "SPATIAL_SHARDS" in cfg.MODEL else 0
        )
        self._mesh = None
        if shards > 1:
            devices = jax.devices()
            if len(devices) < shards:
                raise ValueError(
                    f"MODEL.SPATIAL_SHARDS={shards} needs {shards} devices; "
                    f"{len(devices)} visible"
                )
            from jax.sharding import Mesh

            from ..parallel.spatial_infer import replicate_variables

            self._mesh = Mesh(np.asarray(devices[:shards]), ("grid",))
            self.variables = replicate_variables(self._mesh, self.variables)

        # host numpy, captured by the jitted forwards: a jnp device array
        # captured as a closure constant costs a ~39 s tunnel readback at
        # every lowering in this dev environment (ROUND_NOTES r03)
        self._mean = np.asarray(IMAGENET_MEAN, dtype=np.float32)
        self._std = np.asarray(IMAGENET_STD, dtype=np.float32)
        # LRU-bounded per-shape compile cache: streaming variable-resolution
        # inputs would otherwise accumulate compiled programs without limit
        # (SURVEY.md section 7 "fixed input buckets").  Each entry is its own
        # jit fn, so eviction releases the compiled executable.
        from collections import OrderedDict

        self._max_shapes = int(
            cfg.MODEL.MAX_SHAPE_CACHE if "MAX_SHAPE_CACHE" in cfg.MODEL else 8
        )
        self._forward_cache: "OrderedDict[Tuple[int, int, bool], callable]" = (
            OrderedDict()
        )
        # int8 PTQ pack (models/quant.py); set by quantize() or loaded from
        # cfg.MODEL.QPACK; passed to the jitted forwards as an ARGUMENT
        # (closure-captured device arrays cost ~39 s/array at every
        # lowering here, ROUND_NOTES r03)
        self.qpack = None
        if "QPACK" in cfg.MODEL and cfg.MODEL.QPACK:
            from ..models.quant import load_qpack

            self.qpack = load_qpack(cfg.MODEL.QPACK)

    # -- int8 serving mode ---------------------------------------------------
    def quantize(self, calib_images) -> None:
        """Switch to the int8-backbone serving path (models/quant.py).

        Calibrates activation scales on ``calib_images`` (uint8 RGB frames
        as fed to :meth:`segmentation`) and quantizes the backbone; all
        subsequent forwards run the int8 path.  Measured 1.44-1.79x on the
        backbone's heavy convs (scripts/probe_int8_conv.py); quality is
        pinned by tests/test_quant.py + the golden E2E.
        """
        from ..models.quant import quantize_deeplab

        frames = []
        for img in calib_images:
            x = np.asarray(img).astype(np.float32) / 255.0
            x = (x - self._mean) / self._std
            frames.append(x[None] if x.ndim == 3 else x)
        self.qpack = quantize_deeplab(self.model, self.variables, frames)
        self._forward_cache.clear()

    def _model_logits(self, variables, qpack, x, upsample_pred: bool):
        """Float or int8-backbone forward; quantization is decided at
        trace time by whether a qpack is present."""
        if qpack is None:
            return self.model.apply(
                variables, x, train=False, upsample_pred=upsample_pred
            )
        from ..models.quant import quant_deeplab_apply

        return quant_deeplab_apply(
            self.model, variables, qpack, x, upsample_pred=upsample_pred
        )

    # -- compiled paths ------------------------------------------------------
    def _jit_forward(self, fn):
        """jit ``fn(variables, qpack, image_u8)``; with spatial serving on,
        pin (replicated, replicated, row-banded) in_shardings so GSPMD
        partitions the forward along H (image must arrive NHWC 4-d)."""
        if self._mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self._mesh, P())
        row = NamedSharding(self._mesh, P(None, "grid"))
        return jax.jit(fn, in_shardings=(rep, rep, row))

    def _stage_image(self, image) -> Array:
        """Host image -> dispatch-ready array (batch dim required when the
        in_shardings spec is the 4-d row-banded one)."""
        arr = jnp.asarray(image)
        if self._mesh is not None and arr.ndim == 3:
            arr = arr[None]
        return arr

    def _forward(self, upsample_pred: bool):
        quantized = self.qpack is not None

        def fwd(variables, qpack, image_u8):
            x = image_u8.astype(jnp.float32) / 255.0
            x = (x - self._mean) / self._std
            if x.ndim == 3:
                x = x[None]
            logits = self._model_logits(
                variables, qpack if quantized else None, x, upsample_pred
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        return self._jit_forward(fwd)

    def segmentation(self, image: np.ndarray, upsample_pred: bool = False) -> np.ndarray:
        """uint8 RGB (H, W, 3) -> int32 label map (ref :41-57).

        Matches the reference's ``upsample_pred=False`` default: the label
        map is at the decoder's output resolution; callers resize it
        (ref vision_semantic_segmentation_node.py:109).
        """
        key = (image.shape[0], image.shape[1], upsample_pred)
        if key not in self._forward_cache:
            while len(self._forward_cache) >= self._max_shapes:
                self._forward_cache.popitem(last=False)
            self._forward_cache[key] = self._forward(upsample_pred)
        else:
            self._forward_cache.move_to_end(key)
        preds = self._forward_cache[key](
            self.variables, self.qpack, self._stage_image(image)
        )
        return np.asarray(preds[0] if preds.shape[0] == 1 else preds)

    def segmentation_with_confidence(
        self, image: np.ndarray, upsample_pred: bool = False
    ):
        """uint8 RGB frame -> (label map, per-pixel confidence).

        The fused softmax-confidence head: argmax labels plus the winning
        class's softmax probability, computed inside ONE jitted program
        (no second forward, no logits round-trip to host).  Confidence
        feeds the engine's weighted Bayesian update
        (``FusedFramePipeline(confidence_weighting=True)``).
        """
        key = ("conf", image.shape[0], image.shape[1], upsample_pred)
        if key not in self._forward_cache:
            while len(self._forward_cache) >= self._max_shapes:
                self._forward_cache.popitem(last=False)
            quantized = self.qpack is not None

            def fwd(variables, qpack, image_u8):
                x = image_u8.astype(jnp.float32) / 255.0
                x = (x - self._mean) / self._std
                if x.ndim == 3:
                    x = x[None]
                logits = self._model_logits(
                    variables, qpack if quantized else None, x, upsample_pred
                )
                labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                conf = jnp.max(jax.nn.softmax(logits.astype(jnp.float32), axis=-1), axis=-1)
                return labels, conf

            self._forward_cache[key] = self._jit_forward(fwd)
        else:
            self._forward_cache.move_to_end(key)
        labels, conf = self._forward_cache[key](
            self.variables, self.qpack, self._stage_image(image)
        )
        squeeze = labels.shape[0] == 1
        labels = np.asarray(labels[0] if squeeze else labels)
        conf = np.asarray(conf[0] if squeeze else conf)
        return labels, conf

    def logits(self, image: np.ndarray, upsample_pred: bool = False) -> Array:
        """Raw logits path for downstream fusion (confidence-aware mapping)."""
        x = jnp.asarray(image).astype(jnp.float32) / 255.0
        x = (x - self._mean) / self._std
        if x.ndim == 3:
            x = x[None]
        return self.model.apply(self.variables, x, train=False, upsample_pred=upsample_pred)


def colorize_labels(labels: Array, palette: np.ndarray = MAPILLARY_19_PALETTE) -> Array:
    """Label map -> RGB via the dataset palette (ref node:114,
    mapillary_visualization.py:70-89)."""
    return apply_color_map(jnp.asarray(labels), jnp.asarray(palette))


def preprocess_frame(
    image: np.ndarray,
    undistort_map: Optional[np.ndarray] = None,
    image_scale: float = 1.0,
) -> jnp.ndarray:
    """Node-side frame prep: undistort + INTER_AREA downscale (ref node:85-96).

    Device-side; returns the scaled uint8 image ready for segmentation.
    """
    from ..ops.warp import undistort as undistort_op

    x = jnp.asarray(image)
    if undistort_map is not None:
        x = undistort_op(x, jnp.asarray(undistort_map))
    if image_scale < 1.0:
        out_hw = (int(x.shape[0] * image_scale), int(x.shape[1] * image_scale))
        x = resize_area(x, out_hw)
    return x


def postprocess_labels(labels: Array, out_hw: Tuple[int, int]) -> Array:
    """Resize the label map back to full resolution, INTER_NEAREST (ref node:109)."""
    return resize_nearest(labels, out_hw)
