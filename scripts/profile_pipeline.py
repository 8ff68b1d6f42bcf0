"""Stage-level profiling of the e2e pipeline on real TPU."""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")

from vision_semantic_segmentation_tpu.config import get_cfg_defaults
from vision_semantic_segmentation_tpu.mapping import PCD_ORIGIN_OFFSET, SemanticMappingEngine, pad_points
from vision_semantic_segmentation_tpu.models import build_backbone, deeplab_from_cfg
from vision_semantic_segmentation_tpu.models.aspp import ASPP
from vision_semantic_segmentation_tpu.ops.resize import resize_nearest
from vision_semantic_segmentation_tpu.ops.colormap import apply_color_map, MAPILLARY_19_PALETTE


def bench_fn(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    H, W = 1440, 1920
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, 3)).astype(np.float32))

    cfg = get_cfg_defaults()
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK

    # backbone variants
    for name in ["resnet50", "resnext50_32x4d"]:
        bb = build_backbone(name, 8, dtype=jnp.bfloat16)
        v = bb.init(jax.random.PRNGKey(0), x[:, :64, :64], train=False)
        f = jax.jit(lambda v, x: bb.apply(v, x, train=False)["feature"])
        bench_fn(f"backbone {name} os8 bf16", f, v, x)

    # full model
    model = deeplab_from_cfg(net_cfg, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), x[:, :64, :64], train=False)
    f_full = jax.jit(lambda v, x: model.apply(v, x, train=False, upsample_pred=False))
    logits = f_full(v, x)
    print("logits shape:", logits.shape)
    bench_fn("deeplab full fwd (no upsample)", f_full, v, x)

    # argmax + nearest resize + colorize
    @jax.jit
    def post(logits):
        labels = jnp.argmax(logits, axis=-1)[0].astype(jnp.int32)
        labels = resize_nearest(labels, (H, W))
        return apply_color_map(labels, jnp.asarray(MAPILLARY_19_PALETTE))

    sem_rgb = post(logits)
    bench_fn("argmax+resize+colorize", post, logits)

    # engine step
    engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
    x0m = 100 - PCD_ORIGIN_OFFSET[0]
    y0m = 800 - PCD_ORIGIN_OFFSET[1]
    pts = np.vstack([
        rng.uniform(x0m, x0m + 40, 100_000),
        rng.uniform(y0m, y0m + 40, 100_000),
        rng.uniform(-1, 0.5, 100_000),
        rng.uniform(0, 20, 100_000),
    ]).astype(np.float32)
    pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
    grid = engine.init_grid()
    pos = jnp.asarray([x0m - 6.0, y0m + 20.0, 0.0], jnp.float32)
    quat = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    pcd_j, valid_j = jnp.asarray(pcd), jnp.asarray(valid)

    def engine_step(grid):
        g, _, _ = engine.step(grid, pcd_j, valid_j, sem_rgb, pos, quat)
        return g

    bench_fn("engine step (dedupe)", engine_step, grid)

    engine2 = SemanticMappingEngine(cfg, evidence=np.eye(5), duplicate_semantics="accumulate")

    def engine_step2(grid):
        g, _, _ = engine2.step(grid, pcd_j, valid_j, sem_rgb, pos, quat)
        return g

    bench_fn("engine step (accumulate)", engine_step2, grid)


if __name__ == "__main__":
    main()
