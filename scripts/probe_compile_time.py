"""Bisect the full-route fused-program XLA compile-time blow-up.

Round-2 postmortem (VERDICT r02 "weak" #2): the fused sequence runner at
the full-route 5000x7000 grid (MAPPING.UPDATE_WINDOW=1200) took >10 min
to compile on the v5e, while the 2000^2 dense variant compiles in
minutes.  This probe AOT-lowers (`jit(...).lower(...).compile()`) the
runner under controlled variants to isolate which structural ingredient
owns the compile time:

    python scripts/probe_compile_time.py VARIANT

Variants:
    fullroute      5000x7000 grid, win=1200, scan T=16, DeepLab fused
    fullroute_t1   same but T=1 (no scan)
    fullroute_nonet  same grid/window/scan, fusion only (no DeepLab)
    default        2000^2 grid, dense update, scan T=16 (the r01 config)
    default_win    2000^2 grid, win=1200, scan T=16
    slab           (5,1200,1200) slab-only program: scan T=16 over the
                   slab with dense update, big grid never inside the scan

Each run uses a THROWAWAY compile cache so timings are honest cold
compiles.  Prints one JSON line {variant, lower_s, compile_s}.
"""
from __future__ import annotations

import json
import sys
import tempfile
import time


def main(variant: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp(prefix="probe_cc_"))
    import jax.numpy as jnp
    import numpy as np

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.mapping import SemanticMappingEngine
    from vision_semantic_segmentation_tpu.models import deeplab_from_cfg
    from vision_semantic_segmentation_tpu.runtime.pipeline import FusedFramePipeline

    cfg = get_cfg_defaults()
    fullroute = variant.startswith("fullroute") or variant == "slab"
    if fullroute:
        cfg.MAPPING.BOUNDARY = [[0, 1000], [0, 1400]]
        cfg.MAPPING.RESOLUTION = 0.2
        cfg.MAPPING.UPDATE_WINDOW = 1200
    elif variant == "default_win":
        cfg.MAPPING.UPDATE_WINDOW = 1200

    img_h, img_w = 1440, 1920
    T = 1 if variant.endswith("_t1") else 16
    bucket = cfg.MAPPING.POINT_BUCKET
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
    spec = engine.grid_spec

    sd = jax.ShapeDtypeStruct
    frames = {
        "image": sd((T, img_h, img_w, 3), jnp.uint8),
        "pcd": sd((T, 4, bucket), jnp.float32),
        "valid": sd((T, bucket), jnp.bool_),
        "position": sd((T, 3), jnp.float32),
        "quaternion": sd((T, 4), jnp.float32),
    }

    t0 = time.perf_counter()
    if variant == "fullroute_nonet":
        pointwise = engine._build_pointwise(
            "camera1", pcd_in_velodyne_frame=False, image_is_class_id=True,
            image_full_hw=(img_h, img_w), distorted_image=True,
        )
        apply_update = engine._build_update()

        def fusion_window(grid, pcds, valids, chs, positions, quaternions):
            def body(g, frame):
                pcd, valid, ch, pos, quat = frame
                cell, cls, vis, upd, _ = pointwise(pcd, valid, ch, pos, quat)
                return apply_update(g, cell, cls, pcd[3], upd), None

            grid, _ = jax.lax.scan(
                body, grid, (pcds, valids, chs, positions, quaternions)
            )
            return grid

        dh, dw = img_h // 4 - 4, img_w // 4 - 4  # decoder-res class image
        lowered = jax.jit(fusion_window, donate_argnums=(0,)).lower(
            sd((spec.num_classes, spec.height, spec.width), jnp.float32),
            frames["pcd"], frames["valid"], sd((T, dh, dw), jnp.int32),
            frames["position"], frames["quaternion"],
        )
    elif variant == "slab":
        pointwise = engine._build_pointwise(
            "camera1", pcd_in_velodyne_frame=False, image_is_class_id=True,
            image_full_hw=(img_h, img_w), distorted_image=True,
        )
        dense_update = engine._build_dense_update()
        win = 1200
        model = deeplab_from_cfg(net_cfg, dtype=jnp.bfloat16)
        variables = sdtree_of_model(jax, jnp, model, img_h, img_w)
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
        w = spec.width

        def slab_window(variables, slab, r0, c0, frames):
            def body(s, frame):
                xf = frame["image"].astype(jnp.float32) / 255.0
                xf = (xf - mean) / std
                logits = model.apply(variables, xf[None], train=False, upsample_pred=False)
                ch = jnp.argmax(logits, axis=-1)[0].astype(jnp.int32) % 5
                cell, cls, vis, upd, _ = pointwise(
                    frame["pcd"], frame["valid"], ch,
                    frame["position"], frame["quaternion"],
                )
                row, col = cell // w, cell % w
                lr, lc = row - r0, col - c0
                in_win = (lr >= 0) & (lr < win) & (lc >= 0) & (lc < win)
                s = dense_update(
                    s, lr * win + lc, cls, frame["pcd"][3], upd & in_win, win, win
                )
                return s, ()

            slab, _ = jax.lax.scan(body, slab, frames)
            return slab

        lowered = jax.jit(slab_window, donate_argnums=(1,)).lower(
            variables,
            sd((spec.num_classes, win, win), jnp.float32),
            sd((), jnp.int32), sd((), jnp.int32), frames,
        )
    else:
        model = deeplab_from_cfg(net_cfg, dtype=jnp.bfloat16)
        variables = sdtree_of_model(jax, jnp, model, img_h, img_w)
        pipeline = FusedFramePipeline(
            cfg, jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables),
            engine=engine, distortion="points",
        )
        step = pipeline._build("camera1", (img_h, img_w), False)

        def run_impl(variables, grid, frames):
            def body(g, frame):
                g, _ = step(
                    variables, g, frame["image"], frame["pcd"], frame["valid"],
                    frame["position"], frame["quaternion"],
                )
                return g, ()

            grid, _ = jax.lax.scan(body, grid, frames)
            return grid

        lowered = jax.jit(run_impl, donate_argnums=(1,)).lower(
            variables,
            sd((spec.num_classes, spec.height, spec.width), jnp.float32),
            frames,
        )
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    del compiled
    print(json.dumps({
        "variant": variant,
        "lower_s": round(t1 - t0, 1),
        "compile_s": round(t2 - t1, 1),
        "grid": [spec.height, spec.width],
        "T": T,
    }))


def sdtree_of_model(jax, jnp, model, img_h, img_w):
    """Shape tree of the model variables via eval_shape (no init compute)."""
    import jax.numpy as jnp

    return jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, img_h, img_w, 3), jnp.float32), train=False),
        jax.random.PRNGKey(0),
    )


if __name__ == "__main__":
    main(sys.argv[1])
