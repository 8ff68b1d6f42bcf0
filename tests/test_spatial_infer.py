"""Spatially-sharded (model-parallel) inference forward on the CPU mesh.

GSPMD partitions the image's row axis; XLA inserts conv halo exchanges.
Spatial partitioning re-associates no reduction, so sharded must equal
the single-device forward exactly (parallel/spatial_infer.py).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vision_semantic_segmentation_tpu.config import get_demo_cfg_defaults
from vision_semantic_segmentation_tpu.models import deeplab_from_cfg
from vision_semantic_segmentation_tpu.parallel import (
    create_mesh,
    make_spatial_forward,
    replicate_variables,
    shard_image,
)


@pytest.fixture(scope="module")
def small_net():
    cfg = get_demo_cfg_defaults()
    cfg.DATASET.NUM_CLASSES = 7
    cfg.MODEL.BACKBONE = "resnet18"
    cfg.MODEL.OUTPUT_STRIDE = 16
    cfg.MODEL.ASPP.OUT_CHANNELS = 16
    cfg.MODEL.ASPP.ATROUS_CHANNELS = [16, 16, 16, 16]
    cfg.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS = 8
    cfg.MODEL.DECODER.REFINE_CHANNELS = [16, 16]
    model = deeplab_from_cfg(cfg)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    return model, variables


class TestSpatialForward:
    def test_matches_single_device(self, rng, small_net):
        """Row-sharded logits == single-device logits.

        Spatial partitioning re-associates no conv-window sum, but XLA's
        elementwise fusions differ between the partitioned and reference
        programs (measured ~1e-5 drift on unit-scale logits) — so close,
        not bit-equal.
        """
        model, variables = small_net
        image = rng.standard_normal((1, 128, 96, 3)).astype(np.float32)

        ref = model.apply(variables, image, train=False, upsample_pred=False)

        mesh = create_mesh(axis_names=("grid",), devices=jax.devices())
        fwd = make_spatial_forward(model, mesh, axis="grid", argmax=False)
        out = fwd(replicate_variables(mesh, variables), shard_image(mesh, image))

        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5
        )

    def test_output_stays_row_sharded(self, small_net):
        """With upsample_pred the result materializes row-banded — each
        chip holds only its band (no implicit full-gather on the way
        out)."""
        model, variables = small_net
        mesh = create_mesh(axis_names=("grid",), devices=jax.devices())
        fwd = make_spatial_forward(
            model, mesh, axis="grid", upsample_pred=True, argmax=True
        )
        image = np.zeros((1, 128, 96, 3), np.float32)
        out = fwd(replicate_variables(mesh, variables), shard_image(mesh, image))
        assert out.dtype == jnp.int32
        shard_shapes = {s.data.shape for s in out.addressable_shards}
        assert shard_shapes == {(1, 128 // 8, 96)}

    def test_upsample_pred_and_argmax(self, rng, small_net):
        """upsample_pred routes through the matmul resize under sharding
        (the interpolation matrix contracts the sharded H axis)."""
        model, variables = small_net
        image = rng.standard_normal((1, 128, 96, 3)).astype(np.float32)

        ref_logits = model.apply(variables, image, train=False, upsample_pred=True)
        ref_ids = np.argmax(np.asarray(ref_logits), axis=-1)

        mesh = create_mesh(axis_names=("grid",), devices=jax.devices())
        fwd = make_spatial_forward(
            model, mesh, axis="grid", upsample_pred=True, argmax=True
        )
        out = fwd(replicate_variables(mesh, variables), shard_image(mesh, image))
        assert out.shape == (1, 128, 96)
        np.testing.assert_array_equal(np.asarray(out), ref_ids)

    def test_submesh_four_devices(self, rng, small_net):
        """Works on a sub-mesh (half the slice serving, half training)."""
        model, variables = small_net
        image = rng.standard_normal((1, 128, 96, 3)).astype(np.float32)
        ref = model.apply(variables, image, train=False, upsample_pred=False)

        mesh = create_mesh(axis_names=("grid",), devices=jax.devices()[:4])
        fwd = make_spatial_forward(model, mesh, axis="grid", argmax=False)
        out = fwd(replicate_variables(mesh, variables), shard_image(mesh, image))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5
        )


class TestPredictorSpatialShards:
    """MODEL.SPATIAL_SHARDS through SemanticSegmentation: the config knob
    activates row-banded serving inside the predictor's cached forwards;
    sharded output must equal the single-device predictor exactly."""

    def _cfg(self):
        cfg = get_demo_cfg_defaults()
        cfg.MODEL.TYPE = "DeepLabv3+"
        cfg.DATASET.NUM_CLASSES = 7
        cfg.MODEL.BACKBONE = "resnet18"
        cfg.MODEL.OUTPUT_STRIDE = 16
        cfg.MODEL.ASPP.OUT_CHANNELS = 16
        cfg.MODEL.ASPP.ATROUS_CHANNELS = [16, 16, 16, 16]
        cfg.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS = 8
        cfg.MODEL.DECODER.REFINE_CHANNELS = [16, 16]
        cfg.MODEL.COMPUTE_DTYPE = "float32"  # exact-equality comparison
        return cfg

    def test_matches_single_device_predictor(self, rng, small_net):
        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
        )

        _, variables = small_net
        image = (rng.random((128, 96, 3)) * 255).astype(np.uint8)

        base = SemanticSegmentation(self._cfg(), variables=variables)
        ref = base.segmentation(image, upsample_pred=True)

        cfg = self._cfg()
        cfg.MODEL.SPATIAL_SHARDS = 4
        sharded = SemanticSegmentation(cfg, variables=variables)
        assert sharded._mesh is not None
        out = sharded.segmentation(image, upsample_pred=True)
        assert out.shape == ref.shape
        np.testing.assert_array_equal(out, ref)

        # the confidence head shards identically (labels exact, softmax
        # probabilities re-associate nothing)
        ref_lab, ref_conf = base.segmentation_with_confidence(image)
        lab, conf = sharded.segmentation_with_confidence(image)
        np.testing.assert_array_equal(lab, ref_lab)
        # the softmax itself fuses differently under GSPMD (the conv
        # windows re-associate nothing, but the exp/sum epilogue may);
        # observed deviation ~1e-6 abs / ~5e-6 rel
        np.testing.assert_allclose(conf, ref_conf, atol=1e-5, rtol=1e-5)

    def test_too_few_devices_raises(self, small_net):
        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
        )

        _, variables = small_net
        cfg = self._cfg()
        cfg.MODEL.SPATIAL_SHARDS = 99
        with pytest.raises(ValueError, match="devices"):
            SemanticSegmentation(cfg, variables=variables)

    def test_composes_with_int8_qpack(self, rng, small_net):
        """MODEL.SPATIAL_SHARDS x int8 PTQ: the quantized forward also
        GSPMD-partitions along H (qpack rides as a replicated argument);
        sharded int8 labels == single-device int8 labels exactly."""
        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
        )

        _, variables = small_net
        image = (rng.random((128, 96, 3)) * 255).astype(np.uint8)
        calib = [
            (rng.random((128, 96, 3)) * 255).astype(np.uint8) for _ in range(2)
        ]

        base = SemanticSegmentation(self._cfg(), variables=variables)
        base.quantize(calib)
        ref = base.segmentation(image)

        cfg = self._cfg()
        cfg.MODEL.SPATIAL_SHARDS = 4
        sharded = SemanticSegmentation(cfg, variables=variables)
        sharded.quantize(calib)
        out = sharded.segmentation(image)
        np.testing.assert_array_equal(out, ref)
