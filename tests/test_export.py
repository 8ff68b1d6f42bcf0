"""AOT program export round-trip (runtime/export.py).

The serving path: serialize the fused sequence runner's lowered program,
reload WITHOUT re-tracing the pipeline, and get bit-identical grids with
donation preserved.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from test_runtime import small_cfg, _make_sequence
from vision_semantic_segmentation_tpu.mapping.engine import (
    SemanticMappingEngine,
    pad_points,
)
from vision_semantic_segmentation_tpu.models import build_model
from vision_semantic_segmentation_tpu.runtime.export import (
    export_sequence_runner,
    load_sequence_runner,
)
from vision_semantic_segmentation_tpu.runtime.pipeline import FusedFramePipeline


@pytest.fixture()
def setup(rng, tmp_path):
    cfg = small_cfg(tmp_path)
    cfg.MAPPING.POINT_BUCKET = 2048
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    net_cfg.MODEL.TYPE = "Dummy"
    model, *_ = build_model(net_cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    # params are shape-independent; frames stay at the calibration's full
    # 1440x1920 so the projected points actually land inside the image
    engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
    pipeline = FusedFramePipeline(
        cfg, variables, engine=engine, compute_dtype=jnp.float32
    )

    frames = _make_sequence(rng, cfg, n_frames=3, n_pts=600)
    padded = [pad_points(np.asarray(f.pcd, np.float32), 2048) for f in frames]
    window = {
        "image": jnp.asarray(np.stack([
            np.asarray(f.semantic_image) for f in frames
        ])),
        "pcd": jnp.asarray(np.stack([p for p, _ in padded])),
        "valid": jnp.asarray(np.stack([v for _, v in padded])),
        "position": jnp.asarray(
            np.stack([f.position for f in frames]).astype(np.float32)
        ),
        "quaternion": jnp.asarray(
            np.stack([f.quaternion for f in frames]).astype(np.float32)
        ),
    }
    return cfg, pipeline, window, tmp_path


class TestExportRoundtrip:
    def test_exported_matches_direct_runner(self, setup):
        cfg, pipeline, window, tmp_path = setup
        path = str(tmp_path / "runner.vsstexp")
        export_sequence_runner(pipeline, path, image_hw=(1440, 1920), window=3)

        direct = pipeline.build_sequence_runner(image_hw=(1440, 1920))
        want = np.asarray(direct(pipeline.init_grid(), window))
        assert want.sum() > 0

        run, meta = load_sequence_runner(path, pipeline.variables)
        got_grid = run(pipeline.init_grid(), window)
        np.testing.assert_array_equal(np.asarray(got_grid), want)
        assert meta["window"] == 3 and tuple(meta["image_hw"]) == (1440, 1920)

    def test_load_does_not_retrace_pipeline(self, setup):
        """The loaded program must execute without touching the pipeline's
        build path at all (the whole point: no tracing at serving boot)."""
        cfg, pipeline, window, tmp_path = setup
        path = str(tmp_path / "runner.vsstexp")
        export_sequence_runner(pipeline, path, image_hw=(1440, 1920), window=3)
        variables = pipeline.variables

        def boom(*a, **k):
            raise AssertionError("pipeline retraced at load/run time")

        pipeline._build = boom
        pipeline.engine._build_pointwise = boom
        run, _ = load_sequence_runner(path, variables)
        grid = run(pipeline.engine.init_grid(), window)
        assert float(jnp.sum(grid)) > 0

    def test_donation_survives_roundtrip(self, setup):
        cfg, pipeline, window, tmp_path = setup
        path = str(tmp_path / "runner.vsstexp")
        export_sequence_runner(pipeline, path, image_hw=(1440, 1920), window=3)
        run, _ = load_sequence_runner(path, pipeline.variables)
        grid = pipeline.init_grid()
        out = run(grid, window)
        jax.block_until_ready(out)
        assert grid.is_deleted(), "grid buffer was not donated by the export"

    def test_rejects_garbage_file(self, tmp_path):
        path = tmp_path / "bad.vsstexp"
        path.write_bytes(b"definitely not an export")
        with pytest.raises(ValueError, match="not a vsst export"):
            load_sequence_runner(str(path), {})


class TestCompileCLI:
    def test_cli_compile_writes_loadable_artifact(self, setup):
        """`compile` CLI end-to-end: cfg + weights -> .vsstexp artifact that
        loads and runs."""
        import jax.numpy as jnp

        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.models.convert import save_npz

        cfg, pipeline, window, tmp_path = setup
        weight = str(tmp_path / "w.npz")
        save_npz(pipeline.variables, weight)
        cfg.VISION_SEM_SEG.SEM_SEG_NETWORK.MODEL.WEIGHT = weight
        cfg_path = str(tmp_path / "c.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())
        out = str(tmp_path / "cli.vsstexp")
        main([
            "compile", "--cfg", cfg_path, "--out", out,
            "--height", "1440", "--width", "1920", "--window", "3",
        ])
        run, meta = load_sequence_runner(out, pipeline.variables)
        assert meta["window"] == 3
        grid = run(pipeline.engine.init_grid(), window)
        assert float(jnp.sum(grid)) > 0
