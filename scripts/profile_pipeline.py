"""Stage-level profiling of the e2e pipeline on real TPU.

Timing methodology for the axon tunnel runtime: block_until_ready does not
force completion, so every measurement scans a frame window on device and
ends with a small host readback.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")

from vision_semantic_segmentation_tpu.config import get_cfg_defaults
from vision_semantic_segmentation_tpu.mapping import (
    PCD_ORIGIN_OFFSET,
    SemanticMappingEngine,
    pad_points,
)
from vision_semantic_segmentation_tpu.models import build_backbone, deeplab_from_cfg
from vision_semantic_segmentation_tpu.models.aspp import ASPP

H, W = 1440, 1920
T = 16


def scan_time(name, apply_fn, variables, *inputs, n=2):
    """Time apply_fn over a T-frame scan with a readback barrier."""

    def run_impl(v, *xs):
        def body(acc, frame):
            out = apply_fn(v, *([f[None] for f in frame] if isinstance(frame, tuple) else [frame[None]]))
            return acc + jnp.sum(out.astype(jnp.float32).reshape(-1)[:1]), ()

        xs_stacked = xs[0] if len(xs) == 1 else tuple(xs)
        acc, _ = jax.lax.scan(body, jnp.zeros(()), xs_stacked)
        return acc

    # AOT: the jit dispatch path's compile machinery costs minutes in this
    # environment (ROUND_NOTES r03)
    run = jax.jit(run_impl).lower(variables, *inputs).compile()
    _ = float(run(variables, *inputs))
    t0 = time.perf_counter()
    for _ in range(n):
        acc = run(variables, *inputs)
    _ = float(acc)
    ms = (time.perf_counter() - t0) / n / T * 1e3
    print(f"{name:45s} {ms:8.2f} ms/frame", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    cfg = get_cfg_defaults()
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    x = jnp.asarray(rng.standard_normal((T, H, W, 3)).astype(np.float32))

    # NULL program: the tunnel dispatch round-trip / T, subtracted from
    # every stage row (a T=4 version of this script once inflated every
    # stage by ~7 ms/frame — the probe_bn_fusion.py postmortem)
    ovh = scan_time("NULL (dispatch overhead / T)",
                    lambda v, xi: xi[:, :1, :1, :] + 1.0, {}, x)

    bb = build_backbone(net_cfg.MODEL.BACKBONE, net_cfg.MODEL.OUTPUT_STRIDE, dtype=jnp.bfloat16)
    vb = bb.init(jax.random.PRNGKey(0), x[:1, :64, :64], train=False)
    tb = scan_time("backbone", lambda v, xi: bb.apply(v, xi, train=False)["feature"], vb, x)

    fh, fw = H // 8, W // 8
    feat = jnp.asarray(
        rng.standard_normal((T, fh, fw, 2048)).astype(np.float32)
    ).astype(jnp.bfloat16)
    aspp = ASPP(out_channels=256, atrous_dilation=(1, 12, 24, 36), dtype=jnp.bfloat16)
    va = aspp.init(jax.random.PRNGKey(0), feat[:1], train=False)
    ta = scan_time("aspp", lambda v, xi: aspp.apply(v, xi, train=False), va, feat)

    model = deeplab_from_cfg(net_cfg, dtype=jnp.bfloat16)
    vm = model.init(jax.random.PRNGKey(0), x[:1, :64, :64], train=False)
    tf = scan_time(
        "deeplab full fwd (no upsample)",
        lambda v, xi: model.apply(v, xi, train=False, upsample_pred=False), vm, x,
    )
    print(f"{'':45s} compute (ovh-corrected): backbone "
          f"{tb - ovh:.2f}, aspp {ta - ovh:.2f}, full fwd {tf - ovh:.2f} ms")

    # engine step over the default 2000^2 grid
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
    sem = np.zeros((H, W, 3), np.uint8)
    sem[:] = np.array(cfg.LABEL_COLORS[0], np.uint8)
    frames = {
        "image": jnp.asarray(np.broadcast_to(sem, (T, H, W, 3)).copy()),
        "pcd": jnp.asarray(np.broadcast_to(pcd, (T, *pcd.shape)).copy()),
        "valid": jnp.asarray(np.broadcast_to(valid, (T, *valid.shape)).copy()),
        "position": jnp.asarray(np.tile([x0m - 6.0, y0m + 20.0, 0.0], (T, 1)).astype(np.float32)),
        "quaternion": jnp.asarray(np.tile([0, 0, 0, 1.0], (T, 1)).astype(np.float32)),
    }
    run = engine.build_sequence_runner()
    # the runner donates the grid buffer: always thread the returned grid
    grid = engine.init_grid()
    grid = run(grid, frames)
    _ = float(jnp.sum(grid[:1, :1]))
    t0 = time.perf_counter()
    for _ in range(2):
        grid = run(grid, frames)
    _ = float(jnp.sum(grid[:1, :1]))
    print(f"{'engine scan (RGB path)':45s} {(time.perf_counter() - t0) / 2 / T * 1e3:8.1f} ms/frame")


if __name__ == "__main__":
    main()
