"""Multi-chip collective-traffic analysis (VERDICT r03 #4).

One real chip exists in this environment, so multi-chip VALUE cannot be
benchmarked — but it can be accounted: this script compiles every sharded
program on a virtual N-device CPU mesh, extracts the collective
instructions (+ shapes -> bytes) from the compiled post-GSPMD HLO, and
combines them with v5e compute/ICI constants into an expected
scaling-efficiency table for 2/4/8 chips.

Programs analyzed (the framework's parallel surface, __graft_entry__):
  * dp-train  — flagship training step, batch over ('data',): gradient
    all-reduce (bytes ~= the f32 parameter tree, shape-independent — the
    spatial dims are kept tiny; only collective SHAPES are read).
  * sp-infer  — flagship forward, image rows banded over ('grid',):
    GSPMD conv halo exchanges (collective-permute).  Halo bytes scale
    with W x C only, NOT H, so a reduced-H compile reports production
    halo traffic (W kept at the production 1920).
  * sp-train  — spatial training step on ('data','spatial'): halos in
    forward AND backward + the gradient all-reduce.
  * fp-replay — frame-parallel mapping: one grid psum per window at the
    HEADLINE grid (5 x 2000 x 2000 f32).
  * grid-update — cell-ownership-routed scatter on ('grid',).

Static caveat printed with the results: collectives inside scan bodies
execute once per scan step; the per-program multiplicity is annotated
from the program structure, not parsed.

Usage:  python scripts/analyze_collectives.py [n_devices[,n2,...]]
        (each mesh size compiles in its own child: GSPMD re-partitions
        per n, so collective shapes/counts are mesh-size-specific)
Writes: /tmp/collectives_<n>.json per size + a human table on stdout,
        each with the v5e expected-speedup estimate (zero-overlap lower
        bound at 90 GB/s 1D-ring ICI, basis times from ROUND_NOTES r03).
"""
from __future__ import annotations

import json
import os
import os.path as osp
import re
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# ---------------------------------------------------------------------------
# v5e public constants (How to Scale Your Model, jax-ml.github.io/scaling-book)
# ---------------------------------------------------------------------------
V5E = {
    "bf16_tflops": 197.0,
    "int8_tops": 394.0,
    "hbm_gbps": 819.0,
    # one-way ICI bandwidth per link; v5e is a 2D torus with 4 links/chip
    "ici_link_gbps_oneway": 45.0,
    "ici_links": 4,
}

# Measured single-chip times (v5e, ROUND_NOTES r03) used to convert
# collective bytes into expected scaling efficiency.  "divide" programs
# split ONE unit of work across the mesh (strong scaling: compute time
# divides by n); "fixed" programs keep per-device work constant and the
# mesh multiplies throughput (weak scaling: dp batch-8/device step).
MEASURED_MS = {
    # b8 bf16 + per-block remat flagship train step (probe_train_step.py)
    "dp-train": {"ms": 153.1, "scaling": "fixed",
                 "what": "per-device b8@513^2 bf16+remat step"},
    # forward floor at 1440x1920 (profile_pipeline.py, NULL-corrected)
    "sp-infer": {"ms": 41.4, "scaling": "divide",
                 "what": "full-frame forward, rows banded"},
    # data=2 fixed, spatial divides the b8 step's activations/compute
    "sp-train": {"ms": 153.1, "scaling": "divide_spatial",
                 "what": "b8 step; H bands over the spatial axis"},
    # headline fused frame (19.93 fps -> 50.2 ms), frames divide
    "fp-replay": {"ms": 50.2, "scaling": "divide",
                  "what": "fused e2e frame; window frames divide"},
    # dense grid update at 2000^2 (probe_update_breakdown.py)
    "grid-update": {"ms": 11.8, "scaling": "divide",
                    "what": "grid update; cell bands divide"},
}

SCAN_CAVEAT = (
    "collectives inside lax.scan bodies execute once per scan step; counts "
    "here are static HLO instruction counts with the multiplicity carried by "
    "each program's 'unit' annotation (from program structure, not parsed "
    "from HLO loop trip counts)"
)

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"(bf16|f64|f32|f16|s64|s32|s16|s8|u64|u32|u16|u8|pred|c64|c128)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    """Total bytes of every typed shape in a (possibly tuple) HLO type."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def parse_collectives(hlo_text: str):
    """Collective instructions with their result bytes, by computation.

    A line looks like:
      %ar = (f32[64,3,3]{...}, f32[64]{...}) all-reduce(...), replica_groups=...
    Fusion-wrapped starts ('all-reduce-start') pair with '-done'; count the
    starts only.
    """
    rows = []
    current_comp = "entry"
    for line in hlo_text.splitlines():
        stripped = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*\([^)]*\)\s*->", stripped)
        if (stripped.startswith("ENTRY") or (m and stripped.endswith("{"))):
            name = re.search(r"%?([\w.\-]+)\s*\(", stripped)
            if name:
                current_comp = name.group(1)
        for op in COLLECTIVES:
            # match '= <type> <op>(' and '<op>-start('
            if re.search(rf"=\s+[^=]*\b{op}(-start)?\(", stripped):
                if f"{op}-done" in stripped:
                    continue
                lhs = stripped.split(f" {op}")[0]
                rows.append({
                    "op": op,
                    "computation": current_comp,
                    "bytes": shape_bytes(lhs),
                    "line": stripped[:160],
                })
                break
    return rows


def wire_bytes_per_chip(rows, n: int) -> float:
    """Per-chip ICI egress bytes implied by the parsed collectives.

    Standard ring models (How to Scale Your Model): an all-reduce of a
    B-byte replicated result moves 2*B*(n-1)/n per chip (reduce-scatter
    + all-gather); all-gather/reduce-scatter/all-to-all move their full
    payload once, B*(n-1)/n; a collective-permute's result crosses one
    link exactly once.  Parsed ``bytes`` are the instruction's RESULT
    bytes at this mesh size, which matches B for all-reduce/all-gather
    and the per-chip shard for permute.
    """
    total = 0.0
    for r in rows:
        b = r["bytes"]
        if r["op"] == "all-reduce":
            total += 2.0 * b * (n - 1) / n
        elif r["op"] == "collective-permute":
            total += b
        else:  # all-gather / reduce-scatter / all-to-all
            total += b * (n - 1) / n
    return total


def expected_scaling(name: str, rows, n: int):
    """Expected speedup vs one chip, zero compute/comm overlap (a lower
    bound: XLA emits async -start/-done pairs that overlap in practice).

    ICI model: a 1D ring over one mesh axis drives 2 of the v5e's 4
    links (one per direction) at 45 GB/s each -> 90 GB/s per-chip
    egress.  2D-torus routing could double this; keeping the 1D figure
    makes the table a conservative bound.
    """
    m = MEASURED_MS.get(name)
    if m is None:
        return None
    ici_gbps = 2 * V5E["ici_link_gbps_oneway"]
    t_wire_ms = wire_bytes_per_chip(rows, n) / (ici_gbps * 1e6)
    if m["scaling"] == "fixed":        # weak scaling: throughput x n
        t_comp = m["ms"]
        speedup = n * t_comp / (t_comp + t_wire_ms)
    elif m["scaling"] == "divide_spatial":  # ('data'=2,'spatial'=n/2)
        # 2 data replicas run concurrently, each one b8 step with H
        # banded over n/2 chips: the mesh finishes 2 single-chip units
        # of work per (t_comp + t_wire)
        t_comp = m["ms"] / max(n // 2, 1)
        speedup = 2 * m["ms"] / (t_comp + t_wire_ms)
    else:                               # strong scaling: one unit / n
        t_comp = m["ms"] / n
        speedup = m["ms"] / (t_comp + t_wire_ms)
    return {
        "t_comp_ms": round(t_comp, 3),
        "t_wire_ms": round(t_wire_ms, 3),
        "expected_speedup": round(speedup, 2),
        "efficiency": round(speedup / n, 3),
        "single_chip_ms": m["ms"],
        "model": m["scaling"],
        "basis": m["what"],
    }


def degenerate_mesh_guard(name: str, n: int):
    """Skip reason when a program's mesh would collapse an axis to 1.

    Degenerate-mesh guard (VERDICT r04): at n=2 sp-train's
    ('data'=2,'spatial'=n//2) mesh collapses the spatial axis to size 1 —
    GSPMD emits a pure-dp program with ZERO halo bytes, so the row would
    silently measure the wrong thing.  Returns None when OK.
    """
    if name == "sp-train" and (n % 2 or n < 4):
        return (
            f"mesh ('data'=2,'spatial'={n / 2:g}) has no spatial axis "
            f">= 2 at n={n}; refusing to report a zero-halo dp row as "
            f"sp-train (needs n >= 4, even)"
        )
    return None


def summarize(rows):
    by_op = {}
    for r in rows:
        by_op.setdefault(r["op"], {"count": 0, "bytes": 0})
        by_op[r["op"]]["count"] += 1
        by_op[r["op"]]["bytes"] += r["bytes"]
    return by_op


# ---------------------------------------------------------------------------
# Program builders (run only in the CPU-mesh child)
# ---------------------------------------------------------------------------

def _flagship(tiny_h=64, tiny_w=64):
    import jax
    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.models import deeplab_from_cfg

    cfg = get_cfg_defaults().VISION_SEM_SEG.SEM_SEG_NETWORK
    model = deeplab_from_cfg(cfg, dtype=jnp.bfloat16)
    init = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, tiny_h, tiny_w, 3), jnp.float32), train=False
        )
    )
    variables = init(jax.random.PRNGKey(0))
    return model, variables


def build_dp_train(n):
    """Flagship train step over ('data',); tiny spatial dims (the gradient
    all-reduce bytes are parameter-shaped, not activation-shaped)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vision_semantic_segmentation_tpu.parallel import (
        TrainState, create_mesh, jit_train_step, make_train_step, shard_batch,
    )

    model, variables = _flagship()
    mesh = create_mesh(axis_names=("data",), devices=jax.devices()[:n])
    tx = optax.sgd(0.01, momentum=0.9)
    state = TrainState.create(model, variables, tx, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "image": rng.standard_normal((n, 65, 65, 3)).astype(np.float32),
        "label": rng.integers(0, 19, (n, 65, 65)).astype(np.int32),
    })
    step = jit_train_step(make_train_step(num_classes=19), mesh)
    return step, (state, batch), "per train step"


def build_sp_infer(n):
    """Flagship forward, rows banded over ('grid',) at PRODUCTION width.

    H reduced to 64*n (halo bytes are H-independent: one boundary per
    device pair regardless of band height)."""
    import jax
    import numpy as np

    from vision_semantic_segmentation_tpu.parallel import (
        create_mesh, make_spatial_forward, replicate_variables, shard_image,
    )

    model, variables = _flagship()
    mesh = create_mesh(axis_names=("grid",), devices=jax.devices()[:n])
    fwd = make_spatial_forward(
        model, mesh, axis="grid", upsample_pred=False, argmax=True
    )
    img = np.random.default_rng(0).standard_normal(
        (1, 64 * n, 1920, 3)
    ).astype(np.float32)
    args = (replicate_variables(mesh, variables), shard_image(mesh, img))
    return fwd, args, "per frame (H-independent halo bytes, W=1920)"


def build_sp_train(n):
    """Spatial training step on ('data','spatial'), production width."""
    import jax
    import numpy as np
    import optax

    from vision_semantic_segmentation_tpu.parallel import (
        TrainState, create_mesh, jit_spatial_train_step, make_train_step,
        shard_spatial_batch,
    )

    model, variables = _flagship()
    mesh = create_mesh(
        axis_sizes=(2, n // 2), axis_names=("data", "spatial"),
        devices=jax.devices()[:n],
    )
    tx = optax.sgd(0.01, momentum=0.9)
    state = TrainState.create(model, variables, tx, jax.random.PRNGKey(2))
    rng = np.random.default_rng(0)
    h = 64 * (n // 2)
    batch = shard_spatial_batch(mesh, {
        "image": rng.standard_normal((2, h, 513, 3)).astype(np.float32),
        "label": rng.integers(0, 19, (2, h, 513)).astype(np.int32),
    })
    step = jit_spatial_train_step(make_train_step(num_classes=19), mesh)
    return step, (state, batch), "per train step (W=513 crop)"


def build_fp_replay(n):
    """Frame-parallel mapping window at the HEADLINE grid (2000x2000x5)."""
    import jax
    import numpy as np

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.mapping import (
        SemanticMappingEngine, pad_points,
    )
    from vision_semantic_segmentation_tpu.parallel import (
        create_mesh, make_frame_parallel_run,
    )
    from vision_semantic_segmentation_tpu.parallel.frame_parallel import (
        stack_frames,
    )
    from vision_semantic_segmentation_tpu.runtime.io import FrameRecord

    cfg = get_cfg_defaults()  # headline boundary: 400 m @ 0.2 -> 2000^2
    cfg.MAPPING.POINT_BUCKET = 2 ** 16
    engine = SemanticMappingEngine(cfg)
    mesh = create_mesh(axis_names=("data",), devices=jax.devices()[:n])
    rng = np.random.default_rng(0)
    pts = np.vstack([
        rng.uniform(-1269, -1229, 512), rng.uniform(237, 277, 512),
        rng.uniform(-1, 0.5, 512), rng.uniform(0, 20, 512),
    ]).astype(np.float32)
    image = np.zeros((64, 96, 3), np.uint8)
    frames = [
        FrameRecord(
            pcd=pts, pcd_frame_id="world", semantic_image=image,
            position=np.array([-1275.0, 257.0, 0.0]),
            quaternion=np.array([0.0, 0.0, 0.0, 1.0]), stamp=float(i),
        )
        for i in range(n)
    ]
    run = make_frame_parallel_run(engine, mesh)
    args = (engine.init_grid(), *stack_frames(engine, frames, mesh))
    return run, args, f"per {n}-frame window (grid psum dominates)"


def build_grid_update(n):
    """Cell-ownership-routed scatter over ('grid',), headline grid."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.mapping import (
        SemanticMappingEngine, pad_points,
    )
    from vision_semantic_segmentation_tpu.parallel import (
        create_mesh, init_sharded_grid, make_sharded_step,
    )

    cfg = get_cfg_defaults()
    cfg.MAPPING.POINT_BUCKET = 2 ** 16
    engine = SemanticMappingEngine(cfg)
    mesh = create_mesh(axis_names=("grid",), devices=jax.devices()[:n])
    step = make_sharded_step(engine, mesh)
    grid = init_sharded_grid(engine, mesh)
    rng = np.random.default_rng(0)
    pts = np.vstack([
        rng.uniform(-1269, -1229, 4096), rng.uniform(237, 277, 4096),
        rng.uniform(-1, 0.5, 4096), rng.uniform(0, 20, 4096),
    ]).astype(np.float32)
    pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
    image = np.zeros((1440, 1920, 3), np.uint8)
    args = (
        grid, jnp.asarray(pcd), jnp.asarray(valid), jnp.asarray(image),
        jnp.asarray([-1275.0, 257.0, 0.0], jnp.float32),
        jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32),
    )
    return step, args, "per frame (point routing + owned-band scatter)"


BUILDERS = {
    "dp-train": build_dp_train,
    "sp-infer": build_sp_infer,
    "sp-train": build_sp_train,
    "fp-replay": build_fp_replay,
    "grid-update": build_grid_update,
}


def child_main(n: int):
    import jax

    jax.config.update("jax_platforms", "cpu")

    report = {
        "n_devices": n,
        "caveat": SCAN_CAVEAT,
        "programs": {},
    }
    for name, builder in BUILDERS.items():
        reason = degenerate_mesh_guard(name, n)
        if reason is not None:
            print(f"[{name}] SKIPPED: {reason}", flush=True)
            report["programs"][name] = {"skipped": reason}
            continue
        print(f"[{name}] building + compiling on {n}-device CPU mesh...",
              flush=True)
        fn, args, unit = builder(n)
        lowered = jax.jit(fn) if not hasattr(fn, "lower") else fn
        compiled = lowered.lower(*args).compile()
        text = compiled.as_text()
        rows = parse_collectives(text)
        report["programs"][name] = {
            "unit": unit,
            "collectives": rows,
            "summary": summarize(rows),
            "total_bytes_static": sum(r["bytes"] for r in rows),
            # collective shapes/counts are mesh-size-specific (GSPMD
            # re-partitions per n): the estimate is only valid at THIS n;
            # the outer driver compiles each requested mesh size
            "scaling": {str(n): expected_scaling(name, rows, n)},
        }
        print(f"[{name}] {len(rows)} collective instruction(s), "
              f"{sum(r['bytes'] for r in rows) / 1e6:.2f} MB static",
              flush=True)
    out = f"/tmp/collectives_{n}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")

    # human summary
    print(f"\n=== collective traffic on a {n}-device mesh ===")
    print(f"(caveat: {SCAN_CAVEAT})")
    for name, p in report["programs"].items():
        if "skipped" in p:
            print(f"\n{name}: SKIPPED — {p['skipped']}")
            continue
        print(f"\n{name} ({p['unit']}):")
        for op, s in p["summary"].items():
            print(f"  {op:20s} x{s['count']:<3d} {s['bytes'] / 1e6:10.3f} MB")
        if not p["summary"]:
            print("  (no collectives)")
        est = p["scaling"].get(str(n))
        if est:
            print(
                f"  expected @ {n} chips: compute {est['t_comp_ms']} ms + "
                f"wire {est['t_wire_ms']} ms -> speedup {est['expected_speedup']}x "
                f"(eff {est['efficiency']}, {est['model']}, "
                f"basis: {est['basis']} @ {est['single_chip_ms']} ms)"
            )


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "8"
    if os.environ.get("_VSST_COLL_CHILD") == "1":
        child_main(int(arg))
        return
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for n_str in arg.split(","):
        n = int(n_str)
        env = dict(os.environ)
        env["_VSST_COLL_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = [
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(f"--xla_force_host_platform_device_count={n}")
        env["XLA_FLAGS"] = " ".join(flags)
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n)],
            env=env, cwd=repo,
        ).returncode
        if rc:
            sys.exit(rc)


if __name__ == "__main__":
    main()
