"""Multi-device tests on the virtual 8-device CPU mesh.

Validates that the SPMD train step and the grid-sharded mapping step
compile and match their single-device equivalents.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from vision_semantic_segmentation_tpu.config import get_cfg_defaults, get_demo_cfg_defaults
from vision_semantic_segmentation_tpu.mapping import SemanticMappingEngine, pad_points
from vision_semantic_segmentation_tpu.models import build_model
from vision_semantic_segmentation_tpu.parallel import (
    TrainState,
    create_mesh,
    gather_grid,
    init_sharded_grid,
    jit_train_step,
    make_sharded_step,
    make_train_step,
    shard_batch,
)


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    assert len(ds) == 8, f"expected 8 virtual devices, got {len(ds)}"
    return ds


def _tiny_cfg():
    cfg = get_demo_cfg_defaults()
    cfg.MODEL.TYPE = "Dummy"
    cfg.DATASET.NUM_CLASSES = 5
    return cfg


class TestDataParallelTrainStep:
    def _make(self, rng, mesh):
        cfg = _tiny_cfg()
        model, *_ = build_model(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        tx = optax.sgd(0.1, momentum=0.9)
        state = TrainState.create(model, variables, tx, jax.random.PRNGKey(1))
        batch = {
            "image": rng.standard_normal((8, 16, 16, 3)).astype(np.float32),
            "label": rng.integers(0, 5, (8, 16, 16)).astype(np.int32),
        }
        step = make_train_step(num_classes=5)
        return state, batch, step

    def test_sharded_matches_single_device(self, rng, devices):
        mesh = create_mesh(axis_names=("data",), devices=devices)
        state, batch, step = self._make(rng, mesh)

        # single device reference
        state_ref, metrics_ref = jax.jit(step)(
            state, jax.tree.map(jnp.asarray, batch)
        )

        # 8-way data parallel
        sharded = jit_train_step(step, mesh)
        state_dp, metrics_dp = sharded(state, shard_batch(mesh, batch))

        np.testing.assert_allclose(
            float(metrics_ref["loss"]), float(metrics_dp["loss"]), rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(metrics_ref["confusion"]), np.asarray(metrics_dp["confusion"])
        )
        ref_leaves = jax.tree.leaves(state_ref.params)
        dp_leaves = jax.tree.leaves(state_dp.params)
        for a, b in zip(ref_leaves, dp_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_multi_step_runs(self, rng, devices):
        mesh = create_mesh(axis_names=("data",), devices=devices)
        state, batch, step = self._make(rng, mesh)
        sharded = jit_train_step(step, mesh)
        batch_dev = shard_batch(mesh, batch)
        for _ in range(3):
            state, metrics = sharded(state, batch_dev)
        assert int(state.step) == 3
        assert np.isfinite(float(metrics["loss"]))


class TestShardedGrid:
    def test_matches_unsharded(self, rng, devices):
        from test_mapping import make_frame, small_cfg

        cfg = small_cfg()
        engine = SemanticMappingEngine(
            cfg, evidence=np.eye(5), duplicate_semantics="accumulate"
        )
        pts, img, position, quaternion = make_frame(rng, cfg, n=2000)
        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

        # single-device reference (accumulate semantics)
        grid_ref, _, _ = engine.step(
            engine.init_grid(), pcd_pad, valid, img, position, quaternion
        )

        mesh = create_mesh(axis_names=("grid",), devices=devices)
        step = make_sharded_step(engine, mesh)
        grid_sh = init_sharded_grid(engine, mesh)
        grid_sh = step(
            grid_sh, jnp.asarray(pcd_pad), jnp.asarray(valid), jnp.asarray(img),
            jnp.asarray(position, jnp.float32), jnp.asarray(quaternion, jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(gather_grid(grid_sh)), np.asarray(grid_ref), atol=1e-4
        )

    def test_sharding_layout(self, devices):
        cfg = get_cfg_defaults()
        cfg.MAPPING.BOUNDARY = [[100, 140], [800, 840]]
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        mesh = create_mesh(axis_names=("grid",), devices=devices)
        grid = init_sharded_grid(engine, mesh)
        # planar (C, H, W): row axis (dim 1) split over 8 devices
        assert grid.sharding.spec == jax.sharding.PartitionSpec(None, "grid")
        assert grid.shape[1] % 8 == 0
