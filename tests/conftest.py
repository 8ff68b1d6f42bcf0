"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere (SURVEY.md section 4:
multi-device tests run on CPU via xla_force_host_platform_device_count).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin prepends itself to JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: programs with identical HLO (e.g. the fused
# runner compiled twice by two pipeline instances, or re-runs of the
# suite) compile once.  Keyed on HLO + flags, so safe across edits.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("VSST_TEST_COMPILE_CACHE", "/tmp/vss_cpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Quick smoke tier (`pytest -m quick`, VERDICT r03 #8): at least one FAST
# representative test per subsystem file, total < 5 min on the 1-core CPU
# host.  Centralized here so the tier is auditable in one place; heavy
# module fixtures (the golden bag trains a network for ~10 min) stay in
# the full sweep.  test_compose_e2e / test_trained_convert / test_e2e_golden
# are full-tier-only by construction (multi-minute fixtures are the test).
# ---------------------------------------------------------------------------
QUICK_TESTS = {
    # subsystem: representative fast test
    "test_aux.py::TestPointCloudPacking::test_roundtrip",
    "test_augment.py::TestApplyAugment::test_scale1_is_exact_crop",
    "test_cli.py::test_eval_cli",
    "test_cli.py::test_convert_cli",
    "test_collectives_tool.py::TestDegenerateMeshGuard::test_sp_train_refused_below_four_devices",
    "test_config.py::test_defaults_match_reference_keys",
    "test_drift.py::test_probability_drift_budget",
    "test_evaluation.py::test_evaluator_end_to_end",
    "test_export.py::TestExportRoundtrip::test_exported_matches_direct_runner",
    "test_geometry.py::test_homogenize_roundtrip",
    "test_hickle.py::TestRoundTrip::test_containers_and_scalars",
    "test_mapping.py::TestEngineGoldenParity::test_matches_golden_numpy[True]",
    "test_models.py::TestBackboneParity::test_matches_torch_oracle[resnet18-dilation0]",
    "test_dualcam_quality.py::TestDualCameraQuality::test_camera6_buys_map_quality",
    "test_online.py::TestNodeExecutor::test_keep_latest_drops_oldest_and_counts",
    "test_online.py::TestStreamTimedPlayback::test_matches_bag_timed_content",
    "test_ops.py::TestResizeAlignCorners::test_matches_torch[in_hw0-out_hw0]",
    "test_pallas.py::TestFusedRender::test_matches_unfused_path[shape0]",
    "test_parallel.py::TestDataParallelTrainStep::test_sharded_matches_single_device",
    "test_prefetch.py::TestPrefetchLoader::test_order_preserved_and_restartable",
    "test_preemption.py::TestInProcessPreemption::test_mid_epoch_preempt_and_resume_is_bit_exact",
    "test_profiling.py::TestProfileStages::test_rejects_degenerate_window_counts",
    "test_quant.py::TestFloatWalkerParity::test_matches_flax_backbone[resnet18]",
    "test_rosbag.py::TestReaderWriter::test_roundtrip",
    "test_runtime.py::TestBusSync::test_pub_sub",
    "test_serving_pareto.py::TestPareto::test_recommendation_respects_quality_budget",
    "test_serving_pareto.py::TestUpsamplePredInFusedPipeline::test_channel_image_resolution_follows_the_knob",
    "test_spatial_infer.py::TestSpatialForward::test_matches_single_device",
    "test_spatial_train.py::TestSpatialTrainStep::test_eval_step_spatial",
    "test_train.py::TestTransforms::test_build_transform_from_cfg_tuples",
    "test_tuning.py::TestGenerateWindows::test_points_inside_boundary",
    "test_video_trainer.py::TestTrainerValidation::test_validate_and_best_checkpoint",
    "test_xception_parity.py::TestXceptionParity::test_matches_reference_torch",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # node id relative to the tests/ dir, e.g. "test_x.py::TestC::test_y"
        rel = item.nodeid.split("/")[-1]
        if rel in QUICK_TESTS:
            item.add_marker(pytest.mark.quick)
