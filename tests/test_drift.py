"""North-star numerical drift budget (BASELINE.json).

Over a multi-frame replay, the fp32 on-device grid must stay within 1e-3
max per-cell *probability* drift of a float64 host-side reference
implementation of the same math.
"""
import numpy as np
import jax.numpy as jnp

from vision_semantic_segmentation_tpu.mapping import (
    SemanticMappingEngine,
    pad_points,
)
from vision_semantic_segmentation_tpu.mapping.renderer import log_odds_to_probability

from test_mapping import golden_frame, make_frame, small_cfg


def test_probability_drift_budget():
    # local deterministic rng: the shared session fixture's consumption
    # order varies with which tests run, and a point projecting within
    # float32-epsilon of a pixel boundary flips a whole observation (input
    # sensitivity, not accumulation drift — what this test measures)
    rng = np.random.default_rng(1234)
    cfg = small_cfg()
    # log-probability evidence like the production confusion-matrix setup
    raw = rng.random((19, 19)) + np.eye(19) * 5
    from vision_semantic_segmentation_tpu.mapping import ConfusionMatrix

    evidence = ConfusionMatrix(matrix=raw).get_submatrix(
        cfg.LABELS, to_probability=True, use_log=True
    )

    engine = SemanticMappingEngine(cfg, evidence=evidence)
    grid = engine.init_grid()
    golden = np.zeros(engine.grid_spec.shape, dtype=np.float64)

    n_frames = 40
    for i in range(n_frames):
        pts, img, position, quaternion = make_frame(rng, cfg, n=2500)
        # vary the pose slightly per frame like a moving vehicle
        position = position + np.array([0.05 * i, 0.02 * i, 0.0])
        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        grid, _, _ = engine.step(grid, pcd_pad, valid, img, position, quaternion)
        golden = golden_frame(golden, pts.astype(np.float64), img, position,
                              quaternion, cfg, evidence)

    ours = SemanticMappingEngine.to_hwc(grid).astype(np.float64)
    touched = golden.sum(axis=2) != 0
    assert touched.sum() > 1000, "fixture did not exercise enough cells"

    # compare in probability space (the quantity the map consumes)
    p_ours = np.asarray(log_odds_to_probability(jnp.asarray(ours, jnp.float32)))
    # float64 softmax over channels
    g = golden - golden.max(axis=2, keepdims=True)
    p_gold = np.exp(g) / np.exp(g).sum(axis=2, keepdims=True)

    drift = np.abs(p_ours - p_gold)[touched].max()
    assert drift <= 1e-3, f"max per-cell probability drift {drift:.2e} exceeds budget"

    # argmax class decisions agree everywhere touched
    agree = (ours.argmax(axis=2) == golden.argmax(axis=2))[touched].mean()
    assert agree > 0.999


def test_fused_pipeline_bit_determinism_all_modes():
    """The fused pipeline (distortion-on-points, confidence weighting)
    must be bit-deterministic across reruns — same frames, same grid."""
    import jax
    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.models import build_model
    from vision_semantic_segmentation_tpu.runtime.pipeline import FusedFramePipeline

    rng = np.random.default_rng(7)
    cfg = small_cfg()
    cfg.MAPPING.POINT_BUCKET = 2048
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    net_cfg.MODEL.TYPE = "Dummy"
    model, *_ = build_model(net_cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
    pipeline = FusedFramePipeline(
        cfg, variables, engine=engine, compute_dtype=jnp.float32,
        distortion="points", confidence_weighting=True,
    )

    frames = []
    for i in range(3):
        pts, _, position, quaternion = make_frame(rng, cfg, n=1200)
        raw = (rng.random((720, 960, 3)) * 255).astype(np.uint8)
        pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        frames.append((raw, pcd, valid, position, quaternion))

    def run():
        grid = pipeline.init_grid()
        for raw, pcd, valid, position, quaternion in frames:
            grid, _ = pipeline.step(grid, raw, pcd, valid, position, quaternion)
        return np.asarray(grid)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
    assert a.sum() > 0
