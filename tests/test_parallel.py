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
    def _run_pair(self, rng, cfg, semantics, devices, n=2000, fold="matmul"):
        """Run the same frame through engine.step and the sharded step."""
        from test_mapping import make_frame

        engine = SemanticMappingEngine(
            cfg, evidence=np.eye(5), duplicate_semantics=semantics
        )
        engine.fold_method = fold
        pts, img, position, quaternion = make_frame(rng, cfg, n=n)
        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)

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
        return np.asarray(gather_grid(grid_sh)), np.asarray(grid_ref)

    @pytest.mark.parametrize("semantics", ["accumulate", "reference"])
    def test_matches_unsharded(self, rng, devices, semantics):
        from test_mapping import small_cfg

        got, want = self._run_pair(rng, small_cfg(), semantics, devices)
        assert want.sum() > 0
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("semantics", ["accumulate", "reference"])
    def test_scatter_fold_matches_unsharded(self, rng, devices, semantics):
        """fold_method='scatter' propagates through the sharded per-band
        update (grid_shard builds from engine._build_dense_update) and
        still equals the unsharded matmul-fold engine."""
        from test_mapping import small_cfg

        got, want = self._run_pair(
            rng, small_cfg(), semantics, devices, fold="scatter"
        )
        assert want.sum() > 0
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("semantics", ["accumulate", "reference"])
    def test_windowed_matches_unsharded(self, rng, devices, semantics):
        from test_mapping import small_cfg

        cfg = small_cfg()
        # window smaller than the grid and smaller than a band multiple, so
        # slabs straddle shard boundaries
        cfg.MAPPING.UPDATE_WINDOW = 96
        got, want = self._run_pair(rng, cfg, semantics, devices)
        assert want.sum() > 0
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_full_route_scale_smoke(self, rng, devices):
        """Full-route 5000x7000 grid (README.md:173-177): the grid shards
        1/n per device and a windowed step runs without densifying H*W."""
        from test_mapping import make_frame

        cfg = get_cfg_defaults()
        cfg.MAPPING.BOUNDARY = [[0, 1000], [0, 1400]]
        cfg.MAPPING.RESOLUTION = 0.2
        cfg.MAPPING.POINT_BUCKET = 4096
        cfg.MAPPING.UPDATE_WINDOW = 512
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        assert engine.grid_spec.shape[:2] == (5000, 7000)

        mesh = create_mesh(axis_names=("grid",), devices=devices)
        grid = init_sharded_grid(engine, mesh)
        # per-device memory is 1/8 of the full grid
        shard_shapes = {s.data.shape for s in grid.addressable_shards}
        assert shard_shapes == {(5, 5000 // 8, 7000)}

        # a frame whose points land inside this grid's boundary
        small = get_cfg_defaults()
        small.MAPPING.BOUNDARY = [[100, 140], [800, 840]]
        pts, img, position, quaternion = make_frame(rng, small, n=2000)
        pcd_pad, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
        step = make_sharded_step(engine, mesh)
        grid = step(
            grid, jnp.asarray(pcd_pad), jnp.asarray(valid), jnp.asarray(img),
            jnp.asarray(position, jnp.float32), jnp.asarray(quaternion, jnp.float32),
        )
        assert float(jnp.sum(grid)) > 0

    def test_sharding_layout(self, devices):
        cfg = get_cfg_defaults()
        cfg.MAPPING.BOUNDARY = [[100, 140], [800, 840]]
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        mesh = create_mesh(axis_names=("grid",), devices=devices)
        grid = init_sharded_grid(engine, mesh)
        # planar (C, H, W): row axis (dim 1) split over 8 devices
        assert grid.sharding.spec == jax.sharding.PartitionSpec(None, "grid")
        assert grid.shape[1] % 8 == 0


class TestPerDeviceBN:
    def _setup(self, rng, devices):
        from vision_semantic_segmentation_tpu.parallel import make_per_device_bn_train_step
        import flax.linen as nn

        class BNNet(nn.Module):
            """Tiny conv+BN model exposing BN stats."""

            @nn.compact
            def __call__(self, x, train=False, upsample_pred=True):
                x = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="bn")(x)
                x = nn.relu(x)
                return nn.Conv(3, (1, 1))(x)

        model = BNNet()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), train=False)
        tx = optax.sgd(0.05)
        mesh = create_mesh(axis_names=("data",), devices=devices)
        state = TrainState.create(model, variables, tx, jax.random.PRNGKey(1))
        step_pd = make_per_device_bn_train_step(num_classes=3, mesh=mesh)
        return model, state, mesh, step_pd

    def test_runs_and_params_replicated(self, rng, devices):
        model, state, mesh, step_pd = self._setup(rng, devices)
        batch = shard_batch(mesh, {
            "image": rng.standard_normal((8, 8, 8, 3)).astype(np.float32),
            "label": rng.integers(0, 3, (8, 8, 8)).astype(np.int32),
        })
        state2, metrics = step_pd(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1
        # params identical across devices (replicated pmean'd grads)
        leaf = jax.tree.leaves(state2.params)[0]
        assert np.isfinite(np.asarray(leaf)).all()

    def test_bn_stats_differ_from_sync_on_heterogeneous_batches(self, rng, devices):
        from vision_semantic_segmentation_tpu.parallel import (
            jit_train_step,
            make_train_step,
        )

        model, state, mesh, step_pd = self._setup(rng, devices)
        # shard 0..7 get wildly different statistics
        image = np.concatenate([
            rng.standard_normal((1, 8, 8, 3)).astype(np.float32) * (i + 1) + i
            for i in range(8)
        ])
        batch = shard_batch(mesh, {
            "image": image,
            "label": rng.integers(0, 3, (8, 8, 8)).astype(np.int32),
        })

        state_pd, _ = step_pd(state, batch)
        step_sync = jit_train_step(make_train_step(num_classes=3), mesh)
        state_sync, _ = step_sync(state, batch)

        var_pd = np.asarray(state_pd.batch_stats["bn"]["var"])
        var_sync = np.asarray(state_sync.batch_stats["bn"]["var"])
        # per-device normalization averages per-shard variances; sync uses
        # the global-batch variance (strictly larger with shifted means)
        assert not np.allclose(var_pd, var_sync, rtol=1e-3)
        assert (var_sync >= var_pd - 1e-5).all()

    def test_equals_sync_on_identical_shards(self, rng, devices):
        from vision_semantic_segmentation_tpu.parallel import (
            jit_train_step,
            make_train_step,
        )

        model, state, mesh, step_pd = self._setup(rng, devices)
        one = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        lab = rng.integers(0, 3, (1, 8, 8)).astype(np.int32)
        batch = shard_batch(mesh, {
            "image": np.repeat(one, 8, axis=0),
            "label": np.repeat(lab, 8, axis=0),
        })
        state_pd, m_pd = step_pd(state, batch)
        step_sync = jit_train_step(make_train_step(num_classes=3), mesh)
        state_sync, m_sync = step_sync(state, batch)
        # identical shards -> local stats == global stats -> same update
        np.testing.assert_allclose(
            np.asarray(state_pd.batch_stats["bn"]["mean"]),
            np.asarray(state_sync.batch_stats["bn"]["mean"]), atol=1e-5,
        )
        assert float(m_pd["loss"]) == pytest.approx(float(m_sync["loss"]), rel=1e-5)
        # ... and the parameter update matches too (guards against the
        # implicit-psum double count of shard_map cotangents)
        for a, b in zip(jax.tree.leaves(state_pd.params), jax.tree.leaves(state_sync.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestMultiStepDispatch:
    """K train steps fused per dispatch (TRAIN.STEPS_PER_DISPATCH)."""

    def _make(self, rng):
        cfg = _tiny_cfg()
        model, *_ = build_model(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        tx = optax.sgd(0.1, momentum=0.9)
        state = TrainState.create(model, variables, tx, jax.random.PRNGKey(1))
        batches = [
            {
                "image": rng.standard_normal((8, 16, 16, 3)).astype(np.float32),
                "label": rng.integers(0, 5, (8, 16, 16)).astype(np.int32),
            }
            for _ in range(3)
        ]
        return state, batches

    def test_scan_matches_sequential(self, rng, devices):
        from vision_semantic_segmentation_tpu.parallel import (
            jit_multi_train_step,
            make_multi_train_step,
            shard_stacked_batches,
        )

        mesh = create_mesh(axis_names=("data",), devices=devices)
        state, batches = self._make(rng)

        # sequential reference over the same three batches
        step = jit_train_step(make_train_step(num_classes=5), mesh)
        state_seq = state
        seq_losses = []
        for b in batches:
            state_seq, m = step(state_seq, shard_batch(mesh, b))
            seq_losses.append(float(m["loss"]))

        multi = jit_multi_train_step(make_multi_train_step(5, steps=3), mesh)
        stacked = shard_stacked_batches(mesh, {
            "image": np.stack([b["image"] for b in batches]),
            "label": np.stack([b["label"] for b in batches]),
        })
        state_multi, metrics = multi(state, stacked)

        np.testing.assert_allclose(
            np.asarray(metrics["loss"]), np.asarray(seq_losses), rtol=1e-5
        )
        assert int(state_multi.step) == int(state_seq.step) == 3
        for a, b in zip(
            jax.tree.leaves(state_seq.params), jax.tree.leaves(state_multi.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_per_device_bn_scan_matches_sequential(self, rng, devices):
        from vision_semantic_segmentation_tpu.parallel import (
            make_per_device_bn_train_step,
            shard_stacked_batches,
        )

        mesh = create_mesh(axis_names=("data",), devices=devices)
        state, batches = self._make(rng)
        batches = batches[:2]

        step = make_per_device_bn_train_step(5, mesh)
        state_seq = state
        for b in batches:
            state_seq, m = step(state_seq, shard_batch(mesh, b))

        multi = make_per_device_bn_train_step(5, mesh, steps=2)
        stacked = shard_stacked_batches(mesh, {
            "image": np.stack([b["image"] for b in batches]),
            "label": np.stack([b["label"] for b in batches]),
        })
        state_multi, metrics = multi(state, stacked)

        assert metrics["loss"].shape == (2,)
        np.testing.assert_allclose(
            float(metrics["loss"][-1]), float(m["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(state_seq.params), jax.tree.leaves(state_multi.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestFrameParallelReplay:
    def test_matches_sequential_replay(self, rng, devices):
        """8 frames fused data-parallel == sequential engine replay.

        Per-frame contributions are additive (the reference dedupe is
        within-frame, ref mapping.py:424), so only the cross-device psum
        re-associates the f32 sums."""
        from test_mapping import make_frame
        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.mapping.engine import pad_points
        from vision_semantic_segmentation_tpu.parallel.frame_parallel import (
            make_frame_parallel_run,
            stack_frames,
        )
        from vision_semantic_segmentation_tpu.runtime.io import FrameRecord

        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 2048
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))

        frames = []
        for i in range(8):
            pts, img, position, quaternion = make_frame(rng, cfg, n=1200)
            frames.append(
                FrameRecord(
                    pcd=pts, pcd_frame_id="world", semantic_image=img,
                    position=position, quaternion=quaternion, stamp=float(i),
                )
            )

        # sequential reference
        grid_seq = engine.init_grid()
        for f in frames:
            pcd, valid = pad_points(f.pcd, cfg.MAPPING.POINT_BUCKET)
            grid_seq, _, _ = engine.step(
                grid_seq, pcd, valid, f.semantic_image, f.position, f.quaternion
            )

        mesh = create_mesh(axis_names=("data",), devices=devices)
        run = make_frame_parallel_run(engine, mesh)
        stacked = stack_frames(engine, frames, mesh)
        grid_fp = run(engine.init_grid(), *stacked)

        np.testing.assert_allclose(
            np.asarray(grid_fp), np.asarray(grid_seq), rtol=1e-5, atol=1e-5
        )

    def test_scatter_fold_matches_sequential(self, rng, devices):
        """fold_method='scatter' propagates through the frame-parallel
        per-device update (built from engine._build_update) and matches a
        sequential MATMUL-fold replay — the full cross-fold equality."""
        from test_mapping import make_frame
        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.mapping.engine import pad_points
        from vision_semantic_segmentation_tpu.parallel.frame_parallel import (
            make_frame_parallel_run,
            stack_frames,
        )
        from vision_semantic_segmentation_tpu.runtime.io import FrameRecord

        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 2048
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))

        frames = []
        for i in range(8):
            pts, img, position, quaternion = make_frame(rng, cfg, n=1200)
            frames.append(
                FrameRecord(
                    pcd=pts, pcd_frame_id="world", semantic_image=img,
                    position=position, quaternion=quaternion, stamp=float(i),
                )
            )

        grid_seq = engine.init_grid()
        for f in frames:
            pcd, valid = pad_points(f.pcd, cfg.MAPPING.POINT_BUCKET)
            grid_seq, _, _ = engine.step(
                grid_seq, pcd, valid, f.semantic_image, f.position, f.quaternion
            )

        engine_sc = SemanticMappingEngine(cfg, evidence=np.eye(5))
        engine_sc.fold_method = "scatter"
        mesh = create_mesh(axis_names=("data",), devices=devices)
        run = make_frame_parallel_run(engine_sc, mesh)
        stacked = stack_frames(engine_sc, frames, mesh)
        grid_fp = run(engine_sc.init_grid(), *stacked)

        np.testing.assert_allclose(
            np.asarray(grid_fp), np.asarray(grid_seq), rtol=1e-5, atol=1e-5
        )

    def test_windowed_matches_sequential_windowed(self, rng, devices):
        """MAPPING.UPDATE_WINDOW is honored inside the frame-parallel scan:
        each device's per-frame update runs on a pose-centered slab of its
        local partial grid, matching the sequential windowed replay."""
        from test_mapping import make_frame
        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.mapping.engine import pad_points
        from vision_semantic_segmentation_tpu.parallel.frame_parallel import (
            make_frame_parallel_run,
            stack_frames,
        )
        from vision_semantic_segmentation_tpu.runtime.io import FrameRecord

        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 2048
        cfg.MAPPING.UPDATE_WINDOW = 96
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        frames = []
        for i in range(8):
            pts, img, position, quaternion = make_frame(rng, cfg, n=1000)
            frames.append(
                FrameRecord(
                    pcd=pts, pcd_frame_id="world", semantic_image=img,
                    position=position, quaternion=quaternion, stamp=float(i),
                )
            )
        grid_seq = engine.init_grid()
        for f in frames:
            pcd, valid = pad_points(f.pcd, cfg.MAPPING.POINT_BUCKET)
            grid_seq, _, _ = engine.step(
                grid_seq, pcd, valid, f.semantic_image, f.position, f.quaternion
            )
        mesh = create_mesh(axis_names=("data",), devices=devices)
        run = make_frame_parallel_run(engine, mesh)
        stacked = stack_frames(engine, frames, mesh)
        grid_fp = run(engine.init_grid(), *stacked)
        np.testing.assert_allclose(
            np.asarray(grid_fp), np.asarray(grid_seq), rtol=1e-5, atol=1e-5
        )

    def test_padding_frames_are_noops(self, rng, devices):
        """5 frames pad to 8; padded frames must contribute nothing."""
        from test_mapping import make_frame
        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.mapping.engine import pad_points
        from vision_semantic_segmentation_tpu.parallel.frame_parallel import (
            make_frame_parallel_run,
            stack_frames,
        )
        from vision_semantic_segmentation_tpu.runtime.io import FrameRecord

        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 2048
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        frames = []
        for i in range(5):
            pts, img, position, quaternion = make_frame(rng, cfg, n=800)
            frames.append(
                FrameRecord(
                    pcd=pts, pcd_frame_id="world", semantic_image=img,
                    position=position, quaternion=quaternion, stamp=float(i),
                )
            )
        grid_seq = engine.init_grid()
        for f in frames:
            pcd, valid = pad_points(f.pcd, cfg.MAPPING.POINT_BUCKET)
            grid_seq, _, _ = engine.step(
                grid_seq, pcd, valid, f.semantic_image, f.position, f.quaternion
            )
        mesh = create_mesh(axis_names=("data",), devices=devices)
        run = make_frame_parallel_run(engine, mesh)
        stacked = stack_frames(engine, frames, mesh)
        assert stacked[0].shape[0] == 8
        grid_fp = run(engine.init_grid(), *stacked)
        np.testing.assert_allclose(
            np.asarray(grid_fp), np.asarray(grid_seq), rtol=1e-5, atol=1e-5
        )


class TestFeatureMatrix:
    """Confidence weighting composes with every parallel path.

    VERDICT r02 #4: the extensions must form a square, not a triangle —
    (confidence x sharded x frame-parallel x windowed) all pinned against
    the unsharded confidence-weighted update.
    """

    def _frames(self, rng, cfg, n_frames, n_pts):
        from test_mapping import make_frame
        from vision_semantic_segmentation_tpu.mapping.engine import pad_points

        out = []
        for _ in range(n_frames):
            pts, img, position, quaternion = make_frame(rng, cfg, n=n_pts)
            pcd, valid = pad_points(pts, cfg.MAPPING.POINT_BUCKET)
            weights = rng.uniform(0.2, 1.0, cfg.MAPPING.POINT_BUCKET).astype(np.float32)
            out.append((pcd, valid, img, position, quaternion, weights))
        return out

    @staticmethod
    def _weighted_sequential(engine, frames):
        """Single-device confidence-weighted reference replay."""
        pointwise = engine._build_pointwise("camera1", False)
        apply_update = engine._build_update()
        grid = engine.init_grid()
        for pcd, valid, img, position, quaternion, weights in frames:
            cell, cls, vis, upd, _ = pointwise(
                jnp.asarray(pcd), jnp.asarray(valid), jnp.asarray(img),
                jnp.asarray(position, jnp.float32),
                jnp.asarray(quaternion, jnp.float32),
            )
            grid = apply_update(
                grid, cell, cls, jnp.asarray(pcd)[3], upd,
                weights=jnp.asarray(weights),
            )
        return np.asarray(grid)

    @pytest.mark.parametrize("semantics", ["accumulate", "reference"])
    @pytest.mark.parametrize("window", [0, 96])
    def test_sharded_confidence_matches_unsharded(
        self, rng, devices, semantics, window
    ):
        from test_mapping import small_cfg

        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 2048
        cfg.MAPPING.UPDATE_WINDOW = window
        engine = SemanticMappingEngine(
            cfg, evidence=np.eye(5), duplicate_semantics=semantics
        )
        frames = self._frames(rng, cfg, 1, 1200)
        want = self._weighted_sequential(engine, frames)
        assert want.sum() > 0

        mesh = create_mesh(axis_names=("grid",), devices=devices)
        step = make_sharded_step(engine, mesh, confidence_weighting=True)
        grid_sh = init_sharded_grid(engine, mesh)
        pcd, valid, img, position, quaternion, weights = frames[0]
        grid_sh = step(
            grid_sh, jnp.asarray(pcd), jnp.asarray(valid), jnp.asarray(img),
            jnp.asarray(position, jnp.float32),
            jnp.asarray(quaternion, jnp.float32), jnp.asarray(weights),
        )
        np.testing.assert_allclose(np.asarray(gather_grid(grid_sh)), want, atol=1e-4)

    @pytest.mark.parametrize("window", [0, 96])
    def test_frame_parallel_confidence_matches_sequential(
        self, rng, devices, window
    ):
        from test_runtime import small_cfg
        from jax.sharding import NamedSharding, PartitionSpec as P
        from vision_semantic_segmentation_tpu.parallel.frame_parallel import (
            make_frame_parallel_run,
        )

        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 2048
        cfg.MAPPING.UPDATE_WINDOW = window
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        frames = self._frames(rng, cfg, 8, 1000)
        want = self._weighted_sequential(engine, frames)
        assert want.sum() > 0

        mesh = create_mesh(axis_names=("data",), devices=devices)
        run = make_frame_parallel_run(engine, mesh, confidence_weighting=True)
        sharding = NamedSharding(mesh, P("data"))
        stack = lambda i: jax.device_put(
            np.stack([np.asarray(f[i]) for f in frames]), sharding
        )
        grid_fp = run(
            engine.init_grid(),
            stack(0), stack(1), stack(2),
            jax.device_put(
                np.stack([f[3] for f in frames]).astype(np.float32), sharding
            ),
            jax.device_put(
                np.stack([f[4] for f in frames]).astype(np.float32), sharding
            ),
            stack(5),
        )
        np.testing.assert_allclose(np.asarray(grid_fp), want, rtol=1e-5, atol=1e-5)

    def test_unit_weights_reduce_to_unweighted(self, rng, devices):
        """weights == 1 must reproduce the reference (unweighted) update
        through BOTH parallel paths."""
        from test_mapping import small_cfg
        from vision_semantic_segmentation_tpu.mapping.engine import pad_points

        cfg = small_cfg()
        cfg.MAPPING.POINT_BUCKET = 2048
        engine = SemanticMappingEngine(cfg, evidence=np.eye(5))
        frames = self._frames(rng, cfg, 1, 1200)
        pcd, valid, img, position, quaternion, _ = frames[0]
        ones = np.ones(cfg.MAPPING.POINT_BUCKET, np.float32)

        grid_ref, _, _ = engine.step(
            engine.init_grid(), pcd, valid, img, position, quaternion
        )

        mesh = create_mesh(axis_names=("grid",), devices=devices)
        step = make_sharded_step(engine, mesh, confidence_weighting=True)
        grid_sh = step(
            init_sharded_grid(engine, mesh),
            jnp.asarray(pcd), jnp.asarray(valid), jnp.asarray(img),
            jnp.asarray(position, jnp.float32),
            jnp.asarray(quaternion, jnp.float32), jnp.asarray(ones),
        )
        np.testing.assert_allclose(
            np.asarray(gather_grid(grid_sh)), np.asarray(grid_ref), atol=1e-4
        )


class TestGridShardsConfig:
    """MAPPING.GRID_SHARDS wires the sharded paths from config alone."""

    def _frames(self, rng, cfg, n):
        from test_mapping import make_frame
        from vision_semantic_segmentation_tpu.runtime.io import FrameRecord

        frames = []
        for i in range(n):
            pts, img, position, quaternion = make_frame(rng, cfg, n=900)
            frames.append(FrameRecord(
                pcd=pts, pcd_frame_id="world", semantic_image=img,
                position=position, quaternion=quaternion, stamp=float(i),
            ))
        return frames

    def test_sequential_replay_with_grid_shards(self, rng, devices, tmp_path):
        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.runtime.replay import MappingReplay

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        frames = self._frames(rng, cfg, 4)

        ref = MappingReplay(
            cfg, engine=SemanticMappingEngine(cfg, evidence=np.eye(5))
        )
        want = np.asarray(ref.run_frames(frames))
        assert want.sum() > 0

        cfg4 = small_cfg(tmp_path)
        cfg4.MAPPING.POINT_BUCKET = 2048
        cfg4.MAPPING.GRID_SHARDS = 4
        sharded = MappingReplay(
            cfg4, engine=SemanticMappingEngine(cfg4, evidence=np.eye(5))
        )
        got = sharded.run_frames(frames)
        assert got.sharding.spec == jax.sharding.PartitionSpec(None, "grid")
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_frame_parallel_with_grid_shards_composes(self, rng, devices, tmp_path):
        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.runtime.replay import MappingReplay

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        frames = self._frames(rng, cfg, 8)
        ref = MappingReplay(
            cfg, engine=SemanticMappingEngine(cfg, evidence=np.eye(5))
        )
        want = np.asarray(ref.run_frames(frames))

        cfg2 = small_cfg(tmp_path)
        cfg2.MAPPING.POINT_BUCKET = 2048
        cfg2.MAPPING.GRID_SHARDS = 2
        replay = MappingReplay(
            cfg2, engine=SemanticMappingEngine(cfg2, evidence=np.eye(5)),
            frame_parallel=True,
        )
        got = replay.run_frames_parallel(frames)
        # frames shard over 4 data shards, grid rows over 2 — one psum
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)
