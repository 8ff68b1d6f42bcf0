"""Spatially-sharded TRAINING step (TRAIN.SPATIAL_SHARDS).

The training-side counterpart of tests/test_spatial_infer.py: image/label
rows band over a mesh axis, GSPMD inserts conv halo exchanges in forward
AND backward, BN statistics / loss / metric contractions psum across the
bands, and parameters stay replicated.  No reference equivalent — the
reference's only multi-GPU training is replicating DDP
(ref distributed_train.py:201-369); spatial sharding divides ACTIVATION
memory, the thing DDP cannot.

What can honestly be pinned (measured against an f64 oracle, see
ROUND_NOTES.md "Spatial-sharded training"): train-mode BatchNorm makes
post-step PARAM equality meaningless at f32 — the BN backward subtracts
per-channel means (catastrophic cancellation), and at init even the
single-device f32 grads deviate up to ~20% relative from the f64 oracle
on the worst leaf, so sharded-vs-unsharded param diffs are conditioning
noise, not sharding error.  The well-conditioned outputs ARE tight:

  * loss (mean CE) and the updated BN batch statistics — plain global
    reductions — pinned at 1e-4;
  * confusion counts — integer — pinned exactly;
  * eval-mode (running-stats) gradients — no mean-subtraction backward —
    pinned at 1e-3 relative per leaf, which pins the conv halo exchange
    in the BACKWARD pass specifically (a broken halo is O(1) wrong).

Shapes here keep >= 1 feature-map row per spatial shard (OUTPUT_STRIDE=8,
H=64, 8 shards): below that GSPMD's strided-conv BACKWARD is silently
wrong (measured 38% kernel-grad error at 8 rows / 8 devices with a
bit-exact forward) — the Trainer enforces the bound, pinned below.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from vision_semantic_segmentation_tpu.config import get_train_cfg_defaults
from vision_semantic_segmentation_tpu.models.build import build_model
from vision_semantic_segmentation_tpu.models.loss import cross_entropy_loss
from vision_semantic_segmentation_tpu.parallel import (
    TrainState,
    create_mesh,
    jit_eval_step,
    jit_spatial_eval_step,
    jit_spatial_train_step,
    jit_train_step,
    make_eval_step,
    make_multi_train_step,
    make_train_step,
    shard_batch,
    shard_spatial_batch,
)


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    assert len(ds) == 8, f"expected 8 virtual devices, got {len(ds)}"
    return ds


def _tiny_cfg():
    cfg = get_train_cfg_defaults()
    cfg.MODEL.TYPE = "DeepLabv3+"
    cfg.MODEL.BACKBONE = "resnet18"
    cfg.MODEL.OUTPUT_STRIDE = 8  # os map: H=64 -> 8 rows = 1 per shard
    cfg.MODEL.ASPP.OUT_CHANNELS = 16
    cfg.MODEL.ASPP.ATROUS_CHANNELS = [16, 16, 16, 16]
    cfg.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS = 8
    cfg.MODEL.DECODER.REFINE_CHANNELS = [16, 16]
    cfg.DATASET.NUM_CLASSES = 5
    return cfg


def _tiny_deeplab():
    """A thin real DeepLab (convs with halos, BN, ASPP pooling, dropout) —
    the Dummy model has no spatial structure to shard."""
    model, _, _, _ = build_model(_tiny_cfg())
    return model


def _make_state(model):
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    tx = optax.sgd(0.05, momentum=0.9)
    return TrainState.create(model, variables, tx, jax.random.PRNGKey(1))


def _make_batch(rng, b=2, h=64, w=32, steps=0):
    shape = ((steps, b) if steps else (b,)) + (h, w)
    return {
        "image": rng.standard_normal(shape + (3,)).astype(np.float32),
        "label": rng.integers(0, 5, shape).astype(np.int32),
    }


def _run_reference(model, batch, multi_steps=0, **step_kw):
    """Single-device (trivial 1-dev mesh) reference step."""
    mesh1 = create_mesh(axis_names=("data",), devices=jax.devices()[:1])
    fn = (make_multi_train_step(num_classes=5, steps=multi_steps, **step_kw)
          if multi_steps else make_train_step(num_classes=5, **step_kw))
    step = jit_train_step(fn, mesh1)
    return step(_make_state(model), batch)


def _assert_matches(ref, got, loss_atol=2e-4, stats_atol=5e-3, param_tol=0.05):
    """Pin the well-conditioned train-step outputs (see module docstring).
    Tolerances are the measured conditioning envelope of train-mode BN at
    f32 (single-device itself deviates comparably from an f64 oracle),
    with >= 10x headroom below any structural-sharding-bug signature."""
    ref_state, ref_metrics = ref
    got_state, got_metrics = got
    np.testing.assert_allclose(
        np.asarray(got_metrics["loss"]), np.asarray(ref_metrics["loss"]),
        rtol=0, atol=loss_atol,
    )
    # confusion counts: train-mode logits carry conditioning noise, so a
    # handful of near-tie argmaxes may flip — totals must agree exactly,
    # per-cell counts to < 1% of the pixels
    ref_conf = np.asarray(ref_metrics["confusion"])
    got_conf = np.asarray(got_metrics["confusion"])
    assert ref_conf.sum() == got_conf.sum()
    assert np.max(np.abs(ref_conf - got_conf)) <= 0.01 * ref_conf.sum()
    # updated BN batch statistics: per-channel means / variances over the
    # global (B, H, W) — vars lose digits to the E[x^2]-E[x]^2 cancellation
    # stats_atol=None skips the pin: after a K-step scan the stats ride on
    # drifted step-1 params, and the TRUSTED dp 2-dev K-step itself drifts
    # them by 1.06 absolute on the test fixture (measured) — the meaningful
    # stats pin lives in the single-step tests
    if stats_atol is not None:
        for a, b in zip(
            jax.tree.leaves(ref_state.batch_stats),
            jax.tree.leaves(got_state.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=0, atol=stats_atol
            )
    # params must at least have moved in lockstep at coarse scale (a dead
    # halo exchange shifts early-layer grads by O(1)).  param_tol is the
    # measured conditioning envelope: after a K=2-step dispatch the TRUSTED
    # dp 2-dev path itself drifts the worst leaf 0.159 (spatial 2x4: 0.094)
    # on this fixture, so multi-step callers pass the dp envelope + 2.5x
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(got_state.params)
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.max(np.abs(a - b)) <= param_tol * max(1.0, np.max(np.abs(a)))


class TestSpatialTrainStep:
    def test_pure_spatial_matches_single_device(self, devices):
        """1D ('spatial',) mesh: batch replicated, H banded over 8 devices."""
        rng = np.random.default_rng(10)
        model = _tiny_deeplab()
        batch = _make_batch(rng)
        ref = _run_reference(model, batch)

        mesh = create_mesh(axis_names=("spatial",), devices=devices)
        step = jit_spatial_train_step(
            make_train_step(num_classes=5), mesh,
            data_axis=None, spatial_axis="spatial",
        )
        sharded = shard_spatial_batch(
            mesh, batch, data_axis=None, spatial_axis="spatial"
        )
        _assert_matches(ref, step(_make_state(model), sharded))

    def test_data_x_spatial_matches_single_device(self, devices):
        """2D (2, 4) ('data', 'spatial') mesh — the Trainer's layout."""
        rng = np.random.default_rng(11)
        model = _tiny_deeplab()
        batch = _make_batch(rng)
        ref = _run_reference(model, batch)

        mesh = create_mesh(
            axis_sizes=(2, 4), axis_names=("data", "spatial"), devices=devices
        )
        step = jit_spatial_train_step(make_train_step(num_classes=5), mesh)
        sharded = shard_spatial_batch(mesh, batch)
        _assert_matches(ref, step(_make_state(model), sharded))

    def test_multi_step_spatial(self, devices):
        """K-step fused dispatch with the (K, B, H, ...) batch stack
        sharded (None, data, spatial).  Step 2 runs on step-1 params that
        already carry BN conditioning noise, which one SGD step amplifies
        ~1000x into the loss: measured on this exact fixture, plain
        DATA-parallel 2-dev K-step (a shipped, trusted path) shifts the
        step-2 loss by 0.039 while spatial 2x4 shifts it 0.017 — so only
        step 1 pins tight; step 2 gets the measured dp envelope + 2.5x."""
        rng = np.random.default_rng(12)
        model = _tiny_deeplab()
        batches = _make_batch(rng, steps=2)
        ref = _run_reference(model, batches, multi_steps=2)

        mesh = create_mesh(
            axis_sizes=(2, 4), axis_names=("data", "spatial"), devices=devices
        )
        step = jit_spatial_train_step(
            make_multi_train_step(num_classes=5, steps=2), mesh, steps_axis=True
        )
        sharded = shard_spatial_batch(mesh, batches, steps_axis=True)
        got = step(_make_state(model), sharded)
        ref_loss = np.asarray(ref[1]["loss"])
        got_loss = np.asarray(got[1]["loss"])
        # step-1 inside the scan body fuses differently than the plain step
        # (measured ~5e-4 shift); a structural halo bug measures O(0.1-1)
        np.testing.assert_allclose(got_loss[0], ref_loss[0], rtol=0, atol=2e-3)
        np.testing.assert_allclose(got_loss[1], ref_loss[1], rtol=0, atol=0.1)
        # step-2 BN stats ride on the drifted step-1 params (dp itself
        # drifts them 1.06 abs here) — skip that pin, keep the rest
        _assert_matches(ref, got, loss_atol=0.1, stats_atol=None, param_tol=0.4)

    def test_remat_composes(self, devices):
        """TRAIN.REMAT_BACKBONE x SPATIAL_SHARDS: checkpointed backward
        under GSPMD spatial partitioning."""
        rng = np.random.default_rng(13)
        model = _tiny_deeplab()
        batch = _make_batch(rng)
        ref = _run_reference(model, batch, remat=True)

        mesh = create_mesh(
            axis_sizes=(2, 4), axis_names=("data", "spatial"), devices=devices
        )
        step = jit_spatial_train_step(
            make_train_step(num_classes=5, remat=True), mesh
        )
        sharded = shard_spatial_batch(mesh, batch)
        _assert_matches(ref, step(_make_state(model), sharded))

    def test_backward_halos_eval_mode_grads(self, devices):
        """The tight backward pin: eval-mode (running-stats) gradients have
        no BN mean-subtraction cancellation, so sharded grads must match
        single-device to ~1e-3 relative per leaf — a broken cotangent halo
        exchange is O(1) wrong on the early conv kernels."""
        rng = np.random.default_rng(14)
        model = _tiny_deeplab()
        batch = _make_batch(rng)
        state = _make_state(model)
        params, stats = state.params, state.batch_stats

        def loss_fn(params, image, label):
            logits = model.apply(
                {"params": params, "batch_stats": stats}, image,
                train=False, upsample_pred=True,
            )
            return cross_entropy_loss(logits, label)

        g_ref = jax.jit(jax.grad(loss_fn))(params, batch["image"], batch["label"])

        mesh = create_mesh(axis_names=("spatial",), devices=devices)
        rep = NamedSharding(mesh, P())
        sh = NamedSharding(mesh, P(None, "spatial"))
        g_sp = jax.jit(
            jax.grad(loss_fn), in_shardings=(rep, sh, sh), out_shardings=rep
        )(
            params,
            jax.device_put(batch["image"], sh),
            jax.device_put(batch["label"], sh),
        )
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(a)) + 1e-12
            assert np.max(np.abs(a - b)) <= 1e-3 * scale

    def test_eval_step_spatial(self, devices):
        """jit_spatial_eval_step: sharded eval confusion == single-device."""
        rng = np.random.default_rng(15)
        model = _tiny_deeplab()
        batch = _make_batch(rng)
        state = _make_state(model)

        mesh1 = create_mesh(axis_names=("data",), devices=jax.devices()[:1])
        ref = jit_eval_step(make_eval_step(num_classes=5), mesh1)(state, batch)

        mesh = create_mesh(
            axis_sizes=(2, 4), axis_names=("data", "spatial"), devices=devices
        )
        got = jit_spatial_eval_step(make_eval_step(num_classes=5), mesh)(
            state, shard_spatial_batch(mesh, batch)
        )
        np.testing.assert_array_equal(
            np.asarray(got["confusion"]), np.asarray(ref["confusion"])
        )


class TestTrainerSpatial:
    def _cfg(self, spatial):
        cfg = _tiny_cfg()
        cfg.MODEL.SYNC_BN = True
        cfg.OPTIMIZER.TYPE = "SGD"
        cfg.OPTIMIZER.BASE_LR = 0.05
        cfg.OPTIMIZER.SGD.momentum = 0.9
        cfg.SCHEDULER.TYPE = "PolyLRDecay"
        cfg.SCHEDULER.PolyLRDecay.max_iter = 100
        cfg.SCHEDULER.MAX_EPOCH = 1
        cfg.TRAIN.BATCH_SIZE = 2
        cfg.TRAIN.SPATIAL_SHARDS = spatial
        return cfg

    def test_trainer_builds_2d_mesh_and_steps(self):
        rng = np.random.default_rng(16)
        from vision_semantic_segmentation_tpu.train.trainer import Trainer

        trainer = Trainer(self._cfg(4))
        assert dict(zip(trainer.mesh.axis_names, trainer.mesh.devices.shape)) == {
            "data": 2, "spatial": 4,
        }
        batch = _make_batch(rng)
        losses = trainer._dispatch_group([batch])
        assert np.isfinite(losses).all()

    def test_trainer_rejects_per_device_bn(self):
        from vision_semantic_segmentation_tpu.train.trainer import Trainer

        cfg = self._cfg(4)
        cfg.MODEL.SYNC_BN = False
        with pytest.raises(NotImplementedError, match="SPATIAL_SHARDS"):
            Trainer(cfg)

    def test_trainer_rejects_device_augment(self):
        from vision_semantic_segmentation_tpu.train.trainer import Trainer

        cfg = self._cfg(4)
        cfg.TRAIN.DEVICE_AUGMENT.ENABLED = True
        with pytest.raises(NotImplementedError, match="DEVICE_AUGMENT"):
            Trainer(cfg)

    def test_trainer_rejects_indivisible_device_count(self):
        from vision_semantic_segmentation_tpu.train.trainer import Trainer

        with pytest.raises(ValueError, match="SPATIAL_SHARDS"):
            Trainer(self._cfg(3))

    def test_trainer_rejects_below_min_rows_per_shard(self):
        """The GSPMD wrong-gradient cliff guard: H < OUTPUT_STRIDE x shards
        must raise instead of silently training with broken strided-conv
        backward (measured 38% kernel-grad error at < 1 row/shard)."""
        rng = np.random.default_rng(17)
        from vision_semantic_segmentation_tpu.train.trainer import Trainer

        trainer = Trainer(self._cfg(4))  # os8 x 4 shards -> min H = 32
        small = _make_batch(rng, h=16)
        with pytest.raises(ValueError, match="OUTPUT_STRIDE"):
            trainer._dispatch_group([small])
