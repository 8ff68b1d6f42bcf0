"""Int8 PTQ path (models/quant.py).

Three tiers:
  1. the float walker must equal the flax backbone (the structural-drift
     guard — if resnet.py changes shape, this fails first);
  2. the quantized epilogue math must match an explicit numpy reference;
  3. the end-to-end quantized forward must stay close to the float
     forward on realistic (kaiming random) weights + calibrated scales.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vision_semantic_segmentation_tpu.config import get_demo_cfg_defaults
from vision_semantic_segmentation_tpu.models import deeplab_from_cfg
from vision_semantic_segmentation_tpu.models.quant import (
    calibrate_backbone,
    float_backbone_apply,
    quant_backbone_apply,
    quant_deeplab_apply,
    quantize_backbone,
    quantize_deeplab,
)
from vision_semantic_segmentation_tpu.models.resnet import build_backbone


def _randomize_bn(variables, rng):
    """Give BN nontrivial running stats so folding is actually exercised."""
    def mutate(path, x):
        name = "/".join(str(p.key) for p in path)
        if name.endswith("mean"):
            return jnp.asarray(rng.standard_normal(x.shape) * 0.2, x.dtype)
        if name.endswith("var"):
            return jnp.asarray(0.5 + rng.random(x.shape), x.dtype)
        if name.endswith("scale"):
            return jnp.asarray(0.7 + rng.random(x.shape) * 0.6, x.dtype)
        if name.endswith("bias"):
            return jnp.asarray(rng.standard_normal(x.shape) * 0.1, x.dtype)
        return x

    return jax.tree_util.tree_map_with_path(mutate, variables)


@pytest.fixture(scope="module", params=["resnet18", "resnext50_32x4d"])
def backbone_setup(request):
    rng = np.random.default_rng(17)
    module = build_backbone(request.param, output_stride=8)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x0, train=False)
    variables = _randomize_bn(variables, rng)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    return module, variables, x


class TestFloatWalkerParity:
    def test_matches_flax_backbone(self, backbone_setup):
        module, variables, x = backbone_setup
        ref = module.apply(variables, x, train=False)
        got = float_backbone_apply(module, variables, x)
        for k in ("feature", "low_feature"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=2e-4, rtol=1e-4
            )


class TestQuantizedBackbone:
    def test_close_to_float(self, backbone_setup):
        module, variables, x = backbone_setup
        calib = calibrate_backbone(module, variables, [x])
        qpack = quantize_backbone(module, variables, calib)
        ref = module.apply(variables, x, train=False)
        got = quant_backbone_apply(module, variables, qpack, x,
                                   dtype=jnp.float32)
        for k in ("feature", "low_feature"):
            r = np.asarray(ref[k], np.float64).ravel()
            g = np.asarray(got[k], np.float64).ravel()
            cos = np.dot(r, g) / max(np.linalg.norm(r) * np.linalg.norm(g),
                                     1e-12)
            rel = np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-12)
            assert cos > 0.98, (k, cos)
            assert rel < 0.25, (k, rel)

    def test_emits_int8_between_convs(self, backbone_setup):
        """conv1/conv2 sites carry out_scale (int8 interchange), the
        residual-facing convs don't."""
        module, variables, x = backbone_setup
        calib = calibrate_backbone(module, variables, [x])
        qpack = quantize_backbone(module, variables, calib)
        assert "out_scale" in qpack["layer1_0/conv1"]
        last = "conv3" if module.block == "bottleneck" else "conv2"
        assert "out_scale" not in qpack[f"layer1_0/{last}"]
        assert all(v["w_q"].dtype == jnp.int8 for v in qpack.values())

    def test_calibration_scales_positive(self, backbone_setup):
        module, variables, x = backbone_setup
        calib = calibrate_backbone(module, variables, [x])
        assert all(v > 0 for v in calib.values())
        # every quantized site got calibrated
        qpack = quantize_backbone(module, variables, calib)
        assert set(qpack) <= set(calib)


class TestQuantizedDeepLab:
    @pytest.fixture(scope="class")
    def small_net(self):
        rng = np.random.default_rng(23)
        cfg = get_demo_cfg_defaults()
        cfg.DATASET.NUM_CLASSES = 7
        cfg.MODEL.BACKBONE = "resnext50_32x4d"
        cfg.MODEL.OUTPUT_STRIDE = 8
        cfg.MODEL.ASPP.OUT_CHANNELS = 16
        cfg.MODEL.ASPP.ATROUS_CHANNELS = [16, 16, 16, 16]
        cfg.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS = 8
        cfg.MODEL.DECODER.REFINE_CHANNELS = [16, 16]
        model = deeplab_from_cfg(cfg)
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(1), x0, train=False)
        variables = _randomize_bn(variables, rng)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        return model, variables, x

    def test_logits_close_and_argmax_agrees(self, small_net):
        model, variables, x = small_net
        ref = model.apply(variables, x, train=False, upsample_pred=False)
        qpack = quantize_deeplab(model, variables, [x])
        got = quant_deeplab_apply(model, variables, qpack, x,
                                  upsample_pred=False)
        assert got.shape == ref.shape
        r = np.asarray(ref, np.float64)
        g = np.asarray(got, np.float64)
        rel = np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-12)
        assert rel < 0.25, rel
        agree = (r.argmax(-1) == g.argmax(-1)).mean()
        assert agree > 0.9, agree

    def test_upsample_pred_shape(self, small_net):
        model, variables, x = small_net
        qpack = quantize_deeplab(model, variables, [x])
        got = quant_deeplab_apply(model, variables, qpack, x,
                                  upsample_pred=True)
        assert got.shape[1:3] == (64, 64)

    def test_jit_and_qpack_is_pytree(self, small_net):
        """The quantized forward jits with qpack as an argument pytree."""
        model, variables, x = small_net
        qpack = quantize_deeplab(model, variables, [x])
        fn = jax.jit(
            lambda v, q, xi: quant_deeplab_apply(model, v, q, xi)
        )
        out = fn(variables, qpack, x)
        ref = quant_deeplab_apply(model, variables, qpack, x)
        # jitted and eager epilogues round() f32 values whose low bits
        # differ under XLA fusion — near-tie roundings flip one int8 step
        # and amplify through the net, so logits are NOT tightly
        # comparable; the argmax must still agree nearly everywhere
        assert out.shape == ref.shape and out.dtype == ref.dtype
        agree = (
            np.asarray(out).argmax(-1) == np.asarray(ref).argmax(-1)
        ).mean()
        assert agree > 0.9, agree


class TestPredictorQuantized:
    def test_segmentation_agrees_with_float(self):
        """SemanticSegmentation.quantize() switches the serving path; the
        int8 label maps must agree with the float path on nearly every
        pixel (random net — trained nets agree more)."""
        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
        )

        rng = np.random.default_rng(31)
        cfg = get_demo_cfg_defaults()
        cfg.MODEL.TYPE = "DeepLabv3+"
        cfg.DATASET.NUM_CLASSES = 7
        cfg.MODEL.BACKBONE = "resnet18"
        cfg.MODEL.OUTPUT_STRIDE = 16
        cfg.MODEL.ASPP.OUT_CHANNELS = 16
        cfg.MODEL.ASPP.ATROUS_CHANNELS = [16, 16, 16, 16]
        cfg.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS = 8
        cfg.MODEL.DECODER.REFINE_CHANNELS = [16, 16]
        model = deeplab_from_cfg(cfg)
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(2), x0, train=False)
        variables = _randomize_bn(variables, np.random.default_rng(5))

        seg = SemanticSegmentation(cfg, variables=variables,
                                   compute_dtype="float32")
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        ref = seg.segmentation(frame)
        seg.quantize([frame])
        assert seg.qpack is not None
        got = seg.segmentation(frame)
        assert got.shape == ref.shape
        assert (got == ref).mean() > 0.9

        labels, conf = seg.segmentation_with_confidence(frame)
        assert labels.shape == ref.shape
        assert conf.dtype == np.float32


class TestQpackSerialization:
    def test_save_load_roundtrip(self, tmp_path, backbone_setup):
        from vision_semantic_segmentation_tpu.models.quant import (
            load_qpack,
            save_qpack,
        )

        module, variables, x = backbone_setup
        calib = calibrate_backbone(module, variables, [x])
        qpack = quantize_backbone(module, variables, calib)
        path = str(tmp_path / "q.npz")
        save_qpack(qpack, path)
        loaded = load_qpack(path)
        assert set(loaded) == set(qpack)
        ref = quant_backbone_apply(module, variables, qpack, x,
                                   dtype=jnp.float32)
        got = quant_backbone_apply(module, variables, loaded, x,
                                   dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(got["feature"]), np.asarray(ref["feature"])
        )

    def test_quantize_cli_and_qpack_config(self, tmp_path):
        """`quantize` CLI writes a qpack; MODEL.QPACK serves it."""
        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.config import get_cfg_defaults
        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
        )
        from vision_semantic_segmentation_tpu.models.convert import save_npz
        from vision_semantic_segmentation_tpu.runtime.io import (
            FrameRecord,
            save_frames,
        )

        rng = np.random.default_rng(41)
        cfg = get_cfg_defaults()
        net = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net.MODEL.BACKBONE = "resnet18"
        net.MODEL.OUTPUT_STRIDE = 16
        net.MODEL.COMPUTE_DTYPE = "float32"
        net.DATASET.NUM_CLASSES = 5
        net.MODEL.ASPP.OUT_CHANNELS = 16
        net.MODEL.ASPP.ATROUS_CHANNELS = [16, 16, 16, 16]
        net.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS = 8
        net.MODEL.DECODER.REFINE_CHANNELS = [16, 16]
        cfg.VISION_SEM_SEG.IMAGE_SCALE = 1.0

        model = deeplab_from_cfg(net)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
            train=False,
        )
        weight_path = str(tmp_path / "w.npz")
        save_npz(variables, weight_path)
        net.MODEL.WEIGHT = weight_path

        frames = [
            FrameRecord(
                pcd=np.zeros((4, 1), np.float32), pcd_frame_id="world",
                semantic_image=rng.integers(0, 256, (64, 64, 3),
                                            dtype=np.uint8),
                position=np.zeros(3, np.float32),
                quaternion=np.array([0, 0, 0, 1], np.float32),
                camera="camera1", stamp=float(i),
            )
            for i in range(3)
        ]
        bag_path = str(tmp_path / "calib.npz")
        save_frames(frames, bag_path)

        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())
        qpack_path = str(tmp_path / "qpack.npz")
        main(["quantize", "--cfg", cfg_path, "--calib", bag_path,
              "--frames", "2", "--out", qpack_path])

        net.MODEL.QPACK = qpack_path
        seg = SemanticSegmentation(net)
        assert seg.qpack is not None
        out = seg.segmentation(frames[0].semantic_image)
        assert out.dtype == np.int32


class TestQuantEpilogueMath:
    def test_single_conv_vs_numpy(self):
        """One quantized 1x1 conv+BN+ReLU emitting int8, vs explicit numpy."""
        rng = np.random.default_rng(3)
        module = build_backbone("resnet18", output_stride=8)
        x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = module.init(jax.random.PRNGKey(0), x0, train=False)
        variables = _randomize_bn(variables, rng)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        calib = calibrate_backbone(module, variables, [x])
        qpack = quantize_backbone(module, variables, calib)

        q = jax.device_get(qpack["layer1_0/conv1"])
        # rebuild this site's input: stem output (float walker is pinned
        # against flax above, so reuse it up to the first block input)
        # -> instead drive the site directly with a synthetic input
        xin = rng.standard_normal((1, 8, 8, 64)).astype(np.float32)
        from vision_semantic_segmentation_tpu.models.quant import (
            _make_quant_conv_fn,
        )
        conv_fn = _make_quant_conv_fn(module, qpack, jnp.float32)
        got = np.asarray(jax.device_get(conv_fn(
            "layer1_0/conv1", jnp.asarray(xin), True, True,
            kernel=None, bn=None, stride=(1, 1),
            padding=((1, 1), (1, 1)), dilation=(1, 1), groups=1,
        )))

        xq = np.clip(np.round(xin / q["in_scale"]), -127, 127).astype(np.int8)
        # HWIO 3x3 conv, pad 1 — numpy reference
        w = q["w_q"].astype(np.int32)
        xp = np.pad(xq.astype(np.int32), ((0, 0), (1, 1), (1, 1), (0, 0)))
        y32 = np.zeros((1, 8, 8, w.shape[-1]), np.int32)
        for i in range(3):
            for j in range(3):
                y32 += np.einsum(
                    "nhwc,co->nhwo",
                    xp[:, i:i + 8, j:j + 8, :],
                    w[i, j],
                    dtype=np.int64,
                ).astype(np.int32)
        total = q["in_scale"] * q["w_scale"] * q["bn_scale"]
        yf = y32 * (total / q["out_scale"]) + q["bn_bias"] / q["out_scale"]
        want = np.clip(np.round(yf), 0, 127).astype(np.int8)
        np.testing.assert_array_equal(got, want)
