"""Break down the dense grid-update cost at the headline 2000^2 config.

r02's cost model: ~1.65 ms per M grid cells + ~3.5 ms per 100k points +
~1.4 ms fixed.  At 2000^2 (4M cells) the grid term is ~6.6 ms of the
~12-14 ms fusion — 10x the theoretical HBM traffic of the ops involved
(zeros-init + unique-scatter + (5,5) x (5, 4M) matmul + grid add ~=
400 MB ~= 0.6 ms at peak).  This probe times the pieces in isolation to
find where the factor hides before attempting any kernel work:

    sort     argsort of the 2^17 keys
    scan     segmented-scan dedupe over sorted keys
    scatter  zeros(20M) + at[unique].add of 2^17 entries
    matmul   evidence (5,5) @ obs (5, 4M) + reshape + grid add
    full     the engine's complete _dense_update

Each piece is scanned WINDOW times per dispatch with a data dependency
threaded through, ending in a host readback.  Prints one JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.mapping import SemanticMappingEngine

    cfg = get_cfg_defaults()
    engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
    h, w = engine.grid_spec.height, engine.grid_spec.width  # 2000 x 2000
    n = int(cfg.MAPPING.POINT_BUCKET)  # 2^17
    num_cls = 5
    window = 8
    rng = np.random.default_rng(0)

    cell = jnp.asarray(rng.integers(0, h * w, n), jnp.int32)
    cls = jnp.asarray(rng.integers(0, num_cls, n), jnp.int32)
    upd = jnp.asarray(rng.random(n) < 0.9)
    intensity = jnp.asarray(rng.uniform(0, 20, n), jnp.float32)
    evidence = np.eye(num_cls, dtype=np.float32)

    dense_update = engine._build_dense_update()

    # per-iteration zero offsets as a RUNTIME input: the scanned body's
    # work depends on them, so XLA's loop-invariant code motion cannot
    # hoist the op being measured out of the scan
    offsets = jnp.zeros((window,), jnp.int32)

    def timed(fn, init_carry, label):
        @jax.jit
        def run(carry, cell, offs):
            def body(c, off):
                c, _ = fn(c, cell + off)
                return c, ()

            c, _ = jax.lax.scan(body, carry, offs)
            return c

        out = run(init_carry, cell, offsets)
        jax.block_until_ready(out)
        float(jnp.sum(jnp.ravel(out)[:4]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(init_carry, cell, offsets)
            float(jnp.sum(jnp.ravel(out)[:4]))
            best = min(best, time.perf_counter() - t0)
        return round(best / window * 1000.0, 2)

    sentinel = h * w * num_cls

    def keys_of(cell):
        return jnp.where(upd, cell * num_cls + jnp.clip(cls, 0), sentinel)

    # ---- sort ----
    def f_sort(carry, cell):
        order = jnp.argsort(keys_of(cell))
        return carry + order[:1].astype(jnp.float32), cell

    t_sort = timed(f_sort, jnp.zeros((1,), jnp.float32), "sort")

    # ---- sort + segmented scan (dedupe flags) ----
    def f_scan(carry, cell):
        key = keys_of(cell)
        order = jnp.argsort(key)
        ksort = key[order]
        is_first = jnp.concatenate([jnp.ones((1,), bool), ksort[1:] != ksort[:-1]])

        def combine(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va + vb)

        _, summed = jax.lax.associative_scan(
            combine, (is_first, jnp.ones_like(ksort, jnp.float32))
        )
        return carry + summed[:1], cell

    t_scan = timed(f_scan, jnp.zeros((1,), jnp.float32), "scan")

    # ---- scatter into the (5*H*W) obs buffer ----
    arange_n = jnp.arange(n)

    def f_scatter(carry, cell):
        key = keys_of(cell)
        order = jnp.argsort(key)
        ksort = key[order]
        kvalid = ksort < sentinel
        is_last = jnp.concatenate([ksort[:-1] != ksort[1:], jnp.ones((1,), bool)])
        obs_idx = jnp.where(
            is_last & kvalid,
            (ksort % num_cls) * (h * w) + ksort // num_cls,
            sentinel + arange_n,
        )
        observations = jnp.zeros((num_cls * h * w,), jnp.float32)
        observations = observations.at[obs_idx].add(
            1.0, mode="drop", unique_indices=True
        )
        return carry + observations[:1], cell

    t_scatter = timed(f_scatter, jnp.zeros((1,), jnp.float32), "scatter")

    # ---- matmul + grid add over materialized observations ----
    obs0 = jnp.zeros((num_cls, h * w), jnp.float32)

    def f_matmul(grid, cell):
        delta = jnp.matmul(
            jnp.asarray(evidence), obs0 + grid[0, 0, 0],
            precision=jax.lax.Precision.HIGHEST,
        )
        return grid + delta.reshape(num_cls, h, w), cell

    t_matmul = timed(f_matmul, jnp.zeros((num_cls, h, w), jnp.float32), "matmul")

    # ---- the engine's full dense update ----
    def f_full(grid, cell):
        return dense_update(grid, cell, cls, intensity, upd, h, w), cell

    t_full = timed(f_full, engine.init_grid(), "full")

    # ---- fold_method='scatter': no dense obs buffer, no grid-wide pass --
    engine_sc = SemanticMappingEngine(cfg, evidence=np.eye(5))
    engine_sc.fold_method = "scatter"
    dense_update_sc = engine_sc._build_dense_update()

    def f_full_sc(grid, cell):
        return dense_update_sc(grid, cell, cls, intensity, upd, h, w), cell

    t_full_sc = timed(f_full_sc, engine_sc.init_grid(), "full_scatter")

    # ---- weighted (general) path, both folds ----
    weights = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))

    def f_weighted(grid, cell):
        return dense_update(
            grid, cell, cls, intensity, upd, h, w, weights=weights
        ), cell

    t_weighted = timed(f_weighted, engine.init_grid(), "weighted")

    def f_weighted_sc(grid, cell):
        return dense_update_sc(
            grid, cell, cls, intensity, upd, h, w, weights=weights
        ), cell

    t_weighted_sc = timed(f_weighted_sc, engine_sc.init_grid(), "weighted_scatter")

    print(json.dumps({
        "grid": [h, w], "points": n, "window": window,
        "sort_ms": t_sort,
        "sort_scan_ms": t_scan,
        "sort_scatter_ms": t_scatter,
        "matmul_add_ms": t_matmul,
        "full_dense_update_ms": t_full,
        "full_dense_update_scatter_fold_ms": t_full_sc,
        "weighted_update_ms": t_weighted,
        "weighted_update_scatter_fold_ms": t_weighted_sc,
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
