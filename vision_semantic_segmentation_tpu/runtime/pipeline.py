"""Single-dispatch fused frame pipeline.

The production hot path: raw uint8 camera frame + point cloud + pose ->
updated BEV grid, compiled as ONE jitted program per camera so each frame
costs exactly one device dispatch:

    undistort/scale -> normalize -> DeepLab forward -> argmax -> label
    upsample -> point projection -> label gather -> evidence update

The class-id shortcut skips the reference's RGB colorize/palette-match
round-trip while remaining mathematically identical: the network-class ->
mapped-channel lookup composes the palette write (ref node:114) with the
engine's palette match (ref mapping.py:414-424).  The RGB topic path in
runtime/node.py keeps exact reference dataflow for parity; this pipeline
is the performance path (bench.py).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from ..inference.predictor import IMAGENET_MEAN, IMAGENET_STD
from ..mapping.engine import SemanticMappingEngine
from ..models.build import build_model
from ..ops.resize import resize_area

Array = jnp.ndarray


def network_to_channel_table(cfg, num_network_classes: int = 19) -> np.ndarray:
    """(num_network_classes,) -> mapped grid channel, -1 when unmapped.

    Composes cfg.LABELS (network index of each mapped channel,
    ref base_cfg.py:47): e.g. network class 2 (road) -> channel 0.
    """
    table = np.full(num_network_classes, -1, dtype=np.int32)
    for channel, net_idx in enumerate(cfg.LABELS):
        table[net_idx] = channel
    return table


class FusedFramePipeline:
    """One-dispatch camera+LiDAR fusion step against the HBM grid."""

    def __init__(
        self,
        cfg,
        variables,
        engine: Optional[SemanticMappingEngine] = None,
        compute_dtype=jnp.bfloat16,
        undistort: bool = False,
        distortion: Optional[str] = None,
        confidence_weighting: bool = False,
    ):
        """Args:
            distortion: how lens distortion is handled per frame —
              * ``'none'``   — input frames are already rectified/pinhole;
              * ``'image'``  — fold the per-camera inverse-distortion remap
                (ref node:85-87) into the fused program.  Reference-exact
                dataflow, but the 2.7M-pixel bilinear gather costs more
                than the DeepLab forward on TPU (66 ms vs 43 ms measured
                at 1440x1920);
              * ``'points'`` — segment the RAW frame and apply the
                plumb-bob forward model to the ~1e5 projected points
                instead (engine ``distorted_image`` mode).  Geometrically
                equivalent label association at negligible cost — the
                TPU-first production path.
            undistort: deprecated alias for ``distortion='image'``.
            confidence_weighting: scale each point's Bayesian evidence by
              the network's softmax confidence at its pixel (the fused
              softmax-confidence head).  A deduped (cell, class) hit
              carries its strongest point's confidence; with every
              confidence at 1 this reduces exactly to the reference
              update.  Extension beyond the reference (which weights all
              observations equally).
        """
        if distortion is None:
            distortion = "image" if undistort else "none"
        assert distortion in ("none", "image", "points"), distortion
        self.distortion = distortion
        self.confidence_weighting = bool(confidence_weighting)
        self.cfg = cfg
        self.engine = engine or SemanticMappingEngine(cfg)
        # closure constants stay HOST numpy (device-array constants cost a
        # ~39 s tunnel readback EACH at lowering time — engine._build_pointwise)
        self._undistort_maps = {}
        if distortion == "image":
            for cam_name, cam in self.engine.cameras.items():
                if cam.dist is not None and cam.im_size is not None:
                    self._undistort_maps[cam_name] = cam.undistort_maps()
        self.model = build_model(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK, dtype=compute_dtype)[0]
        self.variables = jax.tree.map(jnp.asarray, variables)
        self.image_scale = float(cfg.VISION_SEM_SEG.IMAGE_SCALE)
        # VISION_SEM_SEG.UPSAMPLE_PRED (config/defaults.py): bilinearly
        # upsample logits to the (scaled) input size before the argmax, so
        # the channel image the engine gathers from has 4x finer class
        # boundaries than the decoder's os4 map.  The reference always
        # argmaxes at decoder resolution (ref semantic_segmentation.py:55,
        # upsample_pred=False) — the serving-Pareto sweep measures what
        # this knob costs/buys per operating point.
        self.upsample_pred = (
            bool(cfg.VISION_SEM_SEG.UPSAMPLE_PRED)
            if "UPSAMPLE_PRED" in cfg.VISION_SEM_SEG
            else False
        )
        self.channel_table = network_to_channel_table(
            cfg, cfg.VISION_SEM_SEG.SEM_SEG_NETWORK.DATASET.NUM_CLASSES
        )
        self._step_cache: Dict[Tuple, Callable] = {}
        self._runner_cache: Dict[Tuple, Callable] = {}

    def init_grid(self) -> Array:
        return self.engine.init_grid()

    def _build_segmentation(self, camera: str, image_hw: Tuple[int, int]):
        """The segmentation prologue of the fused step: raw uint8 frame ->
        logits ``(1, h', w', C)`` (undistort/scale/normalize/forward, ref
        node:82-110).  Shared by :meth:`_build` and the stage profiler
        (`runtime/profiling.py`) so the timed forward can never drift from
        the production program."""
        model = self.model
        mean = np.asarray(IMAGENET_MEAN, dtype=np.float32)
        std = np.asarray(IMAGENET_STD, dtype=np.float32)
        scale = self.image_scale
        full_hw = image_hw
        upsample_pred = self.upsample_pred
        undistort_map = self._undistort_maps.get(camera)

        def seg(variables, frame_u8):
            x = frame_u8
            if undistort_map is not None:
                from ..ops.warp import undistort as undistort_op

                x = undistort_op(x, undistort_map)
            if scale < 1.0:
                x = resize_area(x, (int(full_hw[0] * scale), int(full_hw[1] * scale)))
            xf = x.astype(jnp.float32) / 255.0
            xf = (xf - mean) / std
            # with upsample_pred the logits (hence the channel image the
            # engine gathers from) are at the scaled-input resolution; the
            # engine's nearest-downscaled gather indices handle either size
            return model.apply(
                variables, xf[None], train=False, upsample_pred=upsample_pred
            )

        return seg

    def _build(self, camera: str, image_hw: Tuple[int, int], velodyne_frame: bool):
        confidence = self.confidence_weighting
        pointwise = self.engine._build_pointwise(
            camera, velodyne_frame, image_is_class_id=True, image_full_hw=image_hw,
            distorted_image=(self.distortion == "points"),
            return_pixels=confidence,
        )
        apply_update = self.engine._build_update()
        seg = self._build_segmentation(camera, image_hw)
        table = np.asarray(self.channel_table)

        @partial(jax.jit, donate_argnums=(1,))
        def step(variables, grid, frame_u8, pcd, valid, position, quaternion):
            # NOTE: model variables are explicit arguments, not closure
            # captures — closed-over arrays become executable-embedded
            # constants, which this runtime handles pathologically for
            # ~100MB parameter trees.
            # segmentation (ref node:82-110, fused)
            logits = seg(variables, frame_u8)
            net_labels = jnp.argmax(logits, axis=-1)[0].astype(jnp.int32)
            # channel image stays at decoder resolution; the engine gathers
            # with nearest-downscaled indices (exact INTER_NEAREST
            # equivalence, no full-res upsample materialized)
            channel_img = jnp.asarray(table)[jnp.clip(net_labels, 0, table.shape[0] - 1)]

            # projection + gather + evidence update (ref mapping.py:357-444)
            if confidence:
                # softmax in f32: bf16 logits carry ~2-3 significant digits
                # and saturate near 1.0, which would quantize the per-point
                # evidence weights (negligible cost vs the forward)
                conf_img = jnp.max(
                    jax.nn.softmax(logits.astype(jnp.float32), axis=-1), axis=-1
                )[0]
                cell, cls, vis, upd, _, gy, gx = pointwise(
                    pcd, valid, channel_img, position, quaternion
                )
                weights = conf_img[gy, gx]
                grid = apply_update(grid, cell, cls, pcd[3], upd, weights=weights)
            else:
                cell, cls, vis, upd, _ = pointwise(
                    pcd, valid, channel_img, position, quaternion
                )
                grid = apply_update(grid, cell, cls, pcd[3], upd)
            return grid, net_labels

        return step

    def step(self, grid, frame_u8, pcd, valid, position, quaternion,
             camera: str = "camera1", pcd_frame_id: str = ""):
        """Fuse one raw frame; returns (grid, network label map)."""
        image_hw = (frame_u8.shape[0], frame_u8.shape[1])
        key = (camera, image_hw, pcd_frame_id == "velodyne")
        if key not in self._step_cache:
            self._step_cache[key] = self._build(camera, image_hw, key[2])
        return self._step_cache[key](
            self.variables,
            grid,
            jnp.asarray(frame_u8),
            jnp.asarray(pcd),
            jnp.asarray(valid),
            jnp.asarray(position, jnp.float32),
            jnp.asarray(quaternion, jnp.float32),
        )

    # -- whole-sequence runner ----------------------------------------------
    def build_sequence_runner(
        self,
        camera: str = "camera1",
        image_hw: Tuple[int, int] = (1440, 1920),
        pcd_frame_id: str = "",
    ) -> Callable:
        """ONE-dispatch replay over a stacked frame window via ``lax.scan``.

        Host<->device traffic per window is a single upload of the stacked
        inputs; the grid never leaves HBM between frames.  This is the
        replay/bench fast path (the per-frame dispatch path remains for
        streaming/online use).

        Returns ``run(grid, frames) -> grid`` where ``frames`` is a dict of
        stacked arrays: image (T,H,W,3) u8, pcd (T,4,N), valid (T,N),
        position (T,3), quaternion (T,4).

        The runner is cached per (camera, image_hw, cloud-frame): repeated
        calls return the SAME jitted wrapper, so a chunked replay traces
        once per distinct window shape instead of once per chunk.
        """
        key = (camera, tuple(image_hw), pcd_frame_id == "velodyne")
        cached = self._runner_cache.get(key)
        if cached is not None:
            return cached
        step = self._build(camera, image_hw, pcd_frame_id == "velodyne")
        self_variables = self.variables

        @partial(jax.jit, donate_argnums=(1,))
        def run_impl(variables, grid, frames):
            def body(g, frame):
                # nested jit inlines under the outer trace
                g, _ = step(
                    variables, g, frame["image"], frame["pcd"], frame["valid"],
                    frame["position"], frame["quaternion"],
                )
                return g, ()

            grid, _ = jax.lax.scan(body, grid, frames)
            return grid

        def run(grid, frames):
            return run_impl(self_variables, grid, frames)

        self._runner_cache[key] = run
        return run

    def compile_sequence_runner(
        self,
        camera: str = "camera1",
        image_hw: Tuple[int, int] = (1440, 1920),
        pcd_frame_id: str = "",
        window: int = 16,
    ) -> Callable:
        """AOT-compiled sequence runner for a FIXED window length.

        ``jit(...).lower(...).compile()`` up front, returning a callable
        around the Compiled object.  Semantically identical to
        :meth:`build_sequence_runner` specialized to ``window`` frames —
        but it bypasses the jit dispatch path's compile machinery, which
        in this dev environment costs minutes where the AOT compile of
        the SAME program takes ~50 s (measured r03: full-route jit first
        call 710 s vs lower+compile 48 s; the axon shim's staged
        cache/compile cycle owns the difference).  bench.py uses this;
        production replay keeps the jit path (which is fine on real
        hosts and flexible over window lengths).
        """
        import jax

        engine = self.engine
        spec = engine.grid_spec
        bucket = engine.point_bucket
        step = self._build(camera, tuple(image_hw), pcd_frame_id == "velodyne")

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
        var_shapes = jax.tree.map(lambda a: sd(a.shape, a.dtype), self.variables)
        grid_shape = sd((spec.num_classes, spec.height, spec.width), jnp.float32)
        frame_shapes = {
            "image": sd((window, image_hw[0], image_hw[1], 3), jnp.uint8),
            "pcd": sd((window, 4, bucket), jnp.float32),
            "valid": sd((window, bucket), jnp.bool_),
            "position": sd((window, 3), jnp.float32),
            "quaternion": sd((window, 4), jnp.float32),
        }
        compiled = (
            jax.jit(run_impl, donate_argnums=(1,))
            .lower(var_shapes, grid_shape, frame_shapes)
            .compile()
        )
        self_variables = self.variables

        def run(grid, frames):
            return compiled(self_variables, grid, frames)

        return run
