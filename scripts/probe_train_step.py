"""Train-step throughput on the v5e: f32 (reference semantics) vs
TRAIN.COMPUTE_DTYPE='bfloat16' (MXU-native activations), and the
batch-8 capability unlocked by TRAIN.REMAT_BACKBONE (per-block
nn.remat).

The flagship config (DeepLabV3+ ResNeXt50-32x4d os8) at a standard
513x513 crop — the reference's single-GPU training shape class
(ref train.py; it trains f32 on CUDA).  K steps fuse per dispatch via
make_multi_train_step, so the tunnel round-trip amortizes; throughput
is reported per optimizer step so batch sizes compare via img/s.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from vision_semantic_segmentation_tpu.config import get_train_cfg_defaults
from vision_semantic_segmentation_tpu.models.build import build_model
from vision_semantic_segmentation_tpu.parallel.train_step import (
    TrainState,
    make_multi_train_step,
)

K = 8
H, W = 513, 513
NCLS = 19


def make_batches(batch):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(
            rng.standard_normal((K, batch, H, W, 3)).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng.integers(0, NCLS, (K, batch, H, W)).astype(np.int32)
        ),
    }


def bench_dtype(
    name, dtype, batches, remat=False, remat_backbone=False, accum=1,
    augment=None, n=3,
):
    cfg = get_train_cfg_defaults()
    cfg.MODEL.TYPE = "DeepLabv3+"
    cfg.MODEL.BACKBONE = "resnext50_32x4d"
    cfg.MODEL.OUTPUT_STRIDE = 8
    cfg.DATASET.NUM_CLASSES = NCLS
    cfg.TRAIN.REMAT_BACKBONE = remat_backbone
    model, _, _, _ = build_model(cfg, dtype=dtype)

    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    ).lower().compile()()
    tx = optax.sgd(1e-3, momentum=0.9)
    state = TrainState.create(model, variables, tx, jax.random.PRNGKey(1))

    multi = make_multi_train_step(
        num_classes=NCLS, steps=K, remat=remat, accum_steps=accum,
        augment=augment,
    )
    run = jax.jit(multi).lower(state, batches).compile()
    state2, m = run(state, batches)
    _ = float(m["loss"][-1])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        state2, m = run(state, batches)
        _ = float(m["loss"][-1])
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1e3
    batch = batches["image"].shape[1]
    print(
        f"{name:44s} {ms:8.1f} ms/step = {batch / ms * 1e3:6.1f} img/s "
        f"(loss {float(m['loss'][-1]):.3f})",
        flush=True,
    )
    return ms


def try_bench(name, dtype, batches, remat=False, remat_backbone=False,
              accum=1, augment=None):
    try:
        return bench_dtype(
            name, dtype, batches,
            remat=remat, remat_backbone=remat_backbone, accum=accum,
            augment=augment,
        )
    except Exception as e:  # noqa: BLE001 - OOM is an expected outcome
        print(f"{name}: failed ({type(e).__name__})", flush=True)
        return None


def main():
    print(f"device: {jax.devices()[0].device_kind}  "
          f"@ {H}x{W}, K={K} steps/dispatch")

    # batch 8 @ 513^2 f32 OOMs the 16 GB HBM even under the whole-forward
    # remat flag (single-segment checkpointing bounds residuals, not the
    # recompute peak) — batch 4/device is the fitting shape WITHOUT
    # per-block remat.
    b4 = make_batches(4)
    t32 = try_bench("b4 train step f32", None, b4)
    t16 = try_bench("b4 train step bf16", jnp.bfloat16, b4)
    if t32 and t16:
        print(f"bf16 speedup over f32: {t32 / t16:.2f}x  "
              f"(dispatch ~27 ms amortizes to ~{27 / K:.1f} ms/step at K={K})")

    # TRAIN.REMAT_BACKBONE: per-block residual checkpointing bounds the
    # peak to block boundaries — batch 8 becomes feasible.
    b8 = make_batches(8)
    del b4
    try_bench("b8 f32 (expected OOM)", None, b8)
    try_bench("b8 f32 + REMAT_BACKBONE", None, b8, remat_backbone=True)
    try_bench("b8 bf16 + REMAT_BACKBONE", jnp.bfloat16, b8, remat_backbone=True)

    # TRAIN.GRAD_ACCUM_STEPS overhead at the same total batch: b8 as two
    # micro-batches of 4 vs the single-pass b8 row above.  (Staging a b16
    # window through the MB/s dev tunnel is not worth the wait; the
    # per-micro-batch cost extrapolates linearly.)
    try_bench(
        "b8 bf16 + REMAT + ACCUM=2", jnp.bfloat16, b8,
        remat_backbone=True, accum=2,
    )

    # TRAIN.DEVICE_AUGMENT: raw uint8 frames in, the whole RandomSizeAndCrop/
    # flip/normalize chain inside the step (train/augment.py).  Source shape
    # 720x960 (a typical dataset image); the row's delta vs the b8 bf16+REMAT
    # row is the on-device augmentation cost (the HOST-pipeline cost it
    # replaces — PIL decode/resample per sample — is off-device and the
    # upload shrinks 4x besides).
    from vision_semantic_segmentation_tpu.train.augment import make_device_augment

    del b8
    rng = np.random.default_rng(2)
    raw = {
        "image": jnp.asarray(rng.integers(0, 256, (K, 8, 720, 960, 3), np.uint8)),
        "label": jnp.asarray(rng.integers(0, NCLS, (K, 8, 720, 960)).astype(np.int32)),
    }
    try_bench(
        "b8 bf16 + REMAT + DEVICE_AUGMENT(720x960->513)", jnp.bfloat16, raw,
        remat_backbone=True,
        augment=make_device_augment(size=H, scale=(0.5, 2.0)),
    )


if __name__ == "__main__":
    main()
