"""Measure per-device train-step memory vs TRAIN.SPATIAL_SHARDS.

Substantiates the spatial-sharded-training claim (ROUND_NOTES.md
"Spatial-sharded training"): activation/temp memory per device divides by
the spatial axis size, while the replicated param/optimizer footprint
stays constant.  Uses XLA's own compiled ``memory_analysis()`` on the
8-device CPU mesh — the same numbers the TPU compiler would report,
platform-scaled but with identical SHARDING arithmetic (what we pin is
the ratio, not the bytes).

Run:  python scripts/probe_spatial_memory.py
(no TPU needed; forces the CPU platform like tests/conftest.py)
"""
import os
import sys

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from vision_semantic_segmentation_tpu.config import get_train_cfg_defaults
from vision_semantic_segmentation_tpu.models.build import build_model
from vision_semantic_segmentation_tpu.parallel import (
    TrainState,
    create_mesh,
    jit_spatial_train_step,
    jit_train_step,
    make_train_step,
)


def _cfg():
    cfg = get_train_cfg_defaults()
    cfg.MODEL.TYPE = "DeepLabv3+"
    cfg.MODEL.BACKBONE = "resnet18"
    cfg.MODEL.OUTPUT_STRIDE = 8
    cfg.DATASET.NUM_CLASSES = 19
    return cfg


def analyze(spatial: int, b: int = 1, h: int = 256, w: int = 256):
    """Compile (not run) the train step at (b, h, w) with H banded over
    ``spatial`` devices; return XLA's per-device memory analysis."""
    model, _, _, _ = build_model(_cfg())
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32), train=False
    )
    tx = optax.sgd(0.01, momentum=0.9)
    state = TrainState.create(model, variables, tx, jax.random.PRNGKey(1))
    batch = {
        "image": jnp.zeros((b, h, w, 3), jnp.float32),
        "label": jnp.zeros((b, h, w), jnp.int32),
    }
    step_fn = make_train_step(num_classes=19)
    if spatial == 1:
        mesh = create_mesh(axis_names=("data",), devices=jax.devices()[:1])
        step = jit_train_step(step_fn, mesh)
    else:
        mesh = create_mesh(
            axis_sizes=(1, spatial),
            axis_names=("data", "spatial"),
            devices=jax.devices()[:spatial],
        )
        step = jit_spatial_train_step(step_fn, mesh)
    compiled = step.lower(state, batch).compile()
    m = compiled.memory_analysis()
    return {
        "temp": int(m.temp_size_in_bytes),
        "args": int(m.argument_size_in_bytes),
        "output": int(m.output_size_in_bytes),
    }


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rows = []
    for spatial in (1, 2, 4, 8):
        r = analyze(spatial, h=hw, w=hw)
        rows.append((spatial, r))
        print(
            f"h=w={hw} spatial={spatial}: temp={r['temp']/2**20:8.1f} MiB  "
            f"args={r['args']/2**20:8.1f} MiB  out={r['output']/2**20:8.1f} MiB",
            flush=True,
        )
    base = rows[0][1]["temp"]
    for spatial, r in rows[1:]:
        print(
            f"temp ratio spatial={spatial}: {base / max(r['temp'], 1):.2f}x "
            f"(ideal {spatial}x)"
        )


if __name__ == "__main__":
    main()
