"""On-device training augmentation: parity with the host PIL chain.

The device path (train/augment.py) must reproduce the reference
augmentation semantics — RandomSizeAndCrop(size, scale, crop_nopad=False)
+ RandomHorizontalFlip + ToTensor + Normalize (ref data/transforms.py,
rebuilt in train/transforms.py) — as one fused affine gather.  Pinned
here: exact crop/flip/pad coordinate math, PIL-convention resampling
(bilinear within uint8 rounding, nearest exact off tie centers), and the
train-step integration across all three step variants.
"""
import numpy as np
import jax
import jax.numpy as jnp
import PIL.Image
import PIL.ImageOps
import pytest

from vision_semantic_segmentation_tpu.inference.predictor import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from vision_semantic_segmentation_tpu.train.augment import (
    apply_augment,
    device_augment_from_cfg,
    make_device_augment,
    sample_augment_params,
)

MEAN = np.asarray(IMAGENET_MEAN, np.float32)
STD = np.asarray(IMAGENET_STD, np.float32)


def _params(h, w, pad_h=0, pad_w=0, y1=0, x1=0, flip=False):
    return {
        "h": jnp.int32(h), "w": jnp.int32(w),
        "pad_h": jnp.int32(pad_h), "pad_w": jnp.int32(pad_w),
        "y1": jnp.int32(y1), "x1": jnp.int32(x1),
        "flip": jnp.asarray(flip),
    }


def _rand_sample(rng, h0, w0):
    image = rng.integers(0, 256, (h0, w0, 3)).astype(np.uint8)
    label = rng.integers(0, 19, (h0, w0)).astype(np.uint8)
    return image, label


class TestApplyAugment:
    def test_scale1_is_exact_crop(self):
        """At scale 1 the gather indices are integral -> bit-exact crop."""
        rng = np.random.default_rng(0)
        image, label = _rand_sample(rng, 40, 60)
        out_img, out_lab = apply_augment(
            jnp.asarray(image), jnp.asarray(label),
            _params(40, 60, y1=7, x1=11), size=(20, 24),
        )
        want = (image[7:27, 11:35].astype(np.float32) / 255.0 - MEAN) / STD
        np.testing.assert_allclose(np.asarray(out_img), want, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out_lab), label[7:27, 11:35].astype(np.int32)
        )

    def test_flip_mirrors_the_crop(self):
        rng = np.random.default_rng(1)
        image, label = _rand_sample(rng, 32, 32)
        a_img, a_lab = apply_augment(
            jnp.asarray(image), jnp.asarray(label),
            _params(32, 32, y1=3, x1=5), size=(16, 16),
        )
        b_img, b_lab = apply_augment(
            jnp.asarray(image), jnp.asarray(label),
            _params(32, 32, y1=3, x1=5, flip=True), size=(16, 16),
        )
        np.testing.assert_allclose(
            np.asarray(b_img), np.asarray(a_img)[:, ::-1], atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(b_lab), np.asarray(a_lab)[:, ::-1]
        )

    def test_padding_black_image_ignore_label(self):
        """Scaled image smaller than the crop: image pads to black-
        normalized, label pads to ignore_index (ref transforms.py:135-141)."""
        rng = np.random.default_rng(2)
        image, label = _rand_sample(rng, 40, 60)
        # scale 0.25 -> (10, 15); crop 20x20 needs padding on both axes
        h, w, th, tw = 10, 15, 20, 20
        pad_h = (th - h) // 2 + 1
        pad_w = (tw - w) // 2 + 1
        out_img, out_lab = apply_augment(
            jnp.asarray(image), jnp.asarray(label),
            _params(h, w, pad_h=pad_h, pad_w=pad_w, y1=0, x1=0),
            size=(th, tw), ignore_index=255,
        )
        out_img = np.asarray(out_img)
        out_lab = np.asarray(out_lab)
        black = (0.0 - MEAN) / STD
        # the first pad_h rows / pad_w cols are padding
        np.testing.assert_allclose(out_img[:pad_h], np.broadcast_to(black, (pad_h, tw, 3)), atol=1e-6)
        np.testing.assert_allclose(out_img[:, :pad_w], np.broadcast_to(black, (th, pad_w, 3)), atol=1e-6)
        assert (out_lab[:pad_h] == 255).all() and (out_lab[:, :pad_w] == 255).all()
        # the interior is real content
        assert (out_lab[pad_h : pad_h + h, pad_w : pad_w + w] != 255).all()

    def test_matches_pil_chain(self):
        """Same params through PIL resize+expand+crop+normalize == device,
        within uint8 rounding (PIL rounds each resampled pixel to uint8).

        Upscale only: PIL antialiases bilinear downscales (documented
        deviation).  Shapes chosen tie-free for NEAREST: a sample center
        (i+0.5)*src/dst lands exactly on an integer iff dst/gcd(src,dst)
        is odd, and at those ties 8-bit PIL picks the other neighbor —
        dst/gcd even on both axes avoids every tie."""
        rng = np.random.default_rng(3)
        h0, w0 = 40, 60
        th, tw = 48, 48
        image, label = _rand_sample(rng, h0, w0)
        h, w = 64, 96  # 1.6x; 64/gcd(40,64)=8 and 96/gcd(60,96)=8, both even
        y1, x1 = 9, 21

        pil_img = PIL.Image.fromarray(image).resize((w, h), PIL.Image.BILINEAR)
        pil_lab = PIL.Image.fromarray(label).resize((w, h), PIL.Image.NEAREST)
        crop_img = np.asarray(pil_img.crop((x1, y1, x1 + tw, y1 + th)))
        crop_lab = np.asarray(pil_lab.crop((x1, y1, x1 + tw, y1 + th)))
        want_img = (crop_img.astype(np.float32) / 255.0 - MEAN) / STD

        out_img, out_lab = apply_augment(
            jnp.asarray(image), jnp.asarray(label),
            _params(h, w, y1=y1, x1=x1), size=(th, tw),
        )
        # 1 uint8 step of slack: PIL quantizes the resized image to uint8
        np.testing.assert_allclose(
            np.asarray(out_img) * STD + MEAN, crop_img.astype(np.float32) / 255.0,
            atol=1.01 / 255,
        )
        np.testing.assert_allclose(np.asarray(out_img), want_img, atol=0.0201)
        np.testing.assert_array_equal(np.asarray(out_lab), crop_lab.astype(np.int32))


class TestSampleParams:
    def test_ranges_and_reproducibility(self):
        key = jax.random.PRNGKey(7)
        p = sample_augment_params(key, (100, 150), (64, 64), scale=(0.5, 2.0))
        p2 = sample_augment_params(key, (100, 150), (64, 64), scale=(0.5, 2.0))
        for k in p:
            assert np.asarray(p[k]) == np.asarray(p2[k]), k
        h, w = int(p["h"]), int(p["w"])
        assert 50 <= h <= 200 and 75 <= w <= 300
        h2 = h + 2 * int(p["pad_h"])
        w2 = w + 2 * int(p["pad_w"])
        assert 0 <= int(p["y1"]) <= h2 - 64 and 0 <= int(p["x1"]) <= w2 - 64

    def test_small_scale_always_pads_enough(self):
        # scale far below crop/image ratio: crop must remain in range
        for seed in range(8):
            p = sample_augment_params(
                jax.random.PRNGKey(seed), (40, 60), (64, 64), scale=(0.1, 0.2)
            )
            h2 = int(p["h"]) + 2 * int(p["pad_h"])
            w2 = int(p["w"]) + 2 * int(p["pad_w"])
            assert h2 >= 64 and w2 >= 64
            assert 0 <= int(p["y1"]) <= h2 - 64

    def test_pre_size_rescales_short_side(self):
        p = sample_augment_params(
            jax.random.PRNGKey(0), (100, 200), (64, 64),
            scale=(1.0, 1.0), flip_p=0.0, pre_size=50,
        )
        assert int(p["h"]) == 50 and int(p["w"]) == 100


class TestMakeDeviceAugment:
    def test_batch_shapes_and_determinism(self):
        rng = np.random.default_rng(4)
        image = rng.integers(0, 256, (4, 40, 60, 3)).astype(np.uint8)
        label = rng.integers(0, 19, (4, 40, 60)).astype(np.uint8)
        aug = make_device_augment(33, scale=(0.5, 2.0))
        key = jax.random.PRNGKey(0)
        out = jax.jit(aug)(key, {"image": image, "label": label, "id": np.arange(4)})
        assert out["image"].shape == (4, 33, 33, 3)
        assert out["image"].dtype == jnp.float32
        assert out["label"].shape == (4, 33, 33)
        assert out["label"].dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(out["id"]), np.arange(4))
        out2 = jax.jit(aug)(key, {"image": image, "label": label, "id": np.arange(4)})
        np.testing.assert_array_equal(np.asarray(out["image"]), np.asarray(out2["image"]))
        # per-sample keys differ -> samples get different crops
        assert not np.allclose(np.asarray(out["image"][0]), np.asarray(out["image"][1]))
        # different step keys give different augmentations
        out3 = jax.jit(aug)(jax.random.PRNGKey(1), {"image": image, "label": label})
        assert not np.allclose(np.asarray(out["image"]), np.asarray(out3["image"]))

    def test_rejects_float_batches(self):
        aug = make_device_augment(33)
        with pytest.raises(TypeError, match="uint8"):
            aug(
                jax.random.PRNGKey(0),
                {"image": jnp.zeros((1, 40, 60, 3), jnp.float32),
                 "label": jnp.zeros((1, 40, 60), jnp.int32)},
            )

    def test_label_values_preserved(self):
        """Output labels only contain source label values or ignore_index."""
        rng = np.random.default_rng(5)
        image = rng.integers(0, 256, (2, 40, 60, 3)).astype(np.uint8)
        label = np.full((2, 40, 60), 7, np.uint8)
        aug = make_device_augment(48, scale=(0.3, 0.6), ignore_index=255)
        out = aug(jax.random.PRNGKey(2), {"image": image, "label": label})
        vals = np.unique(np.asarray(out["label"]))
        assert set(vals.tolist()) <= {7, 255}
        assert 7 in vals  # interior content survives


class TestConfigAndTrainStep:
    def _cfg(self):
        from vision_semantic_segmentation_tpu.config import get_demo_cfg_defaults

        cfg = get_demo_cfg_defaults()
        cfg.DATASET.NUM_CLASSES = 19
        cfg.MODEL.BACKBONE = "resnet18"
        cfg.MODEL.OUTPUT_STRIDE = 16
        cfg.MODEL.ASPP.OUT_CHANNELS = 16
        cfg.MODEL.ASPP.ATROUS_CHANNELS = [16, 16, 16, 16]
        cfg.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS = 8
        cfg.MODEL.DECODER.REFINE_CHANNELS = [16, 16]
        return cfg

    def test_from_cfg_disabled_is_none(self):
        from vision_semantic_segmentation_tpu.config import get_train_cfg_defaults

        assert device_augment_from_cfg(get_train_cfg_defaults()) is None

    def test_train_step_variants_run_with_augment(self):
        """All three step variants accept raw uint8 batches with augment."""
        import optax

        from vision_semantic_segmentation_tpu.models import deeplab_from_cfg
        from vision_semantic_segmentation_tpu.parallel import (
            TrainState,
            create_mesh,
            jit_train_step,
            make_train_step,
            shard_batch,
        )
        from vision_semantic_segmentation_tpu.parallel.train_step import (
            make_multi_train_step,
            make_per_device_bn_train_step,
            jit_multi_train_step,
        )

        model = deeplab_from_cfg(self._cfg())
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3)), train=False
        )
        aug = make_device_augment(33, scale=(0.8, 1.2))
        rng = np.random.default_rng(6)
        n = jax.device_count()
        batch = {
            "image": rng.integers(0, 256, (2 * n, 40, 60, 3)).astype(np.uint8),
            "label": rng.integers(0, 19, (2 * n, 40, 60)).astype(np.uint8),
        }
        mesh = create_mesh(axis_names=("data",))

        def fresh_state():
            return TrainState.create(
                model, variables, optax.sgd(0.01), jax.random.PRNGKey(1)
            )

        step = jit_train_step(make_train_step(19, augment=aug), mesh)
        state, metrics = step(fresh_state(), shard_batch(mesh, batch))
        assert np.isfinite(float(metrics["loss"]))

        # augment + grad accumulation
        step_acc = jit_train_step(
            make_train_step(19, augment=aug, accum_steps=2), mesh
        )
        _, m_acc = step_acc(fresh_state(), shard_batch(mesh, batch))
        assert np.isfinite(float(m_acc["loss"]))

        # multi-step (K per dispatch)
        multi = jit_multi_train_step(make_multi_train_step(19, 2, augment=aug), mesh)
        kbatch = {k: np.stack([v, v]) for k, v in batch.items()}
        _, m_multi = multi(fresh_state(), kbatch)
        assert np.isfinite(np.asarray(m_multi["loss"])).all()

        # per-device BatchNorm shard_map variant
        pdbn = make_per_device_bn_train_step(19, mesh, augment=aug)
        _, m_pdbn = pdbn(fresh_state(), shard_batch(mesh, batch))
        assert np.isfinite(float(m_pdbn["loss"]))

    def test_trainer_runs_with_device_augment(self, tmp_path):
        """Trainer wires TRAIN.DEVICE_AUGMENT through: a raw-uint8 loader
        trains end-to-end (incl. the fused K-step dispatch path)."""
        from vision_semantic_segmentation_tpu.config import get_train_cfg_defaults
        from vision_semantic_segmentation_tpu.train.trainer import Trainer

        cfg = get_train_cfg_defaults()
        cfg.MODEL.TYPE = "Dummy"
        cfg.DATASET.NUM_CLASSES = 3
        cfg.OPTIMIZER.TYPE = "SGD"
        cfg.OPTIMIZER.BASE_LR = 0.1
        cfg.SCHEDULER.TYPE = "PolyLRDecay"
        cfg.SCHEDULER.PolyLRDecay.max_iter = 100
        cfg.TRAIN.BATCH_SIZE = jax.device_count()
        cfg.TRAIN.STEPS_PER_DISPATCH = 2
        cfg.TRAIN.DEVICE_AUGMENT.ENABLED = True
        cfg.TRAIN.DEVICE_AUGMENT.SIZE = 33
        cfg.TRAIN.DEVICE_AUGMENT.SCALE = (0.8, 1.2)
        trainer = Trainer(cfg, output_dir=str(tmp_path))
        rng = np.random.default_rng(7)
        b = cfg.TRAIN.BATCH_SIZE
        loader = [
            {
                "image": rng.integers(0, 256, (b, 40, 60, 3)).astype(np.uint8),
                "label": rng.integers(0, 3, (b, 40, 60)).astype(np.uint8),
            }
            for _ in range(4)
        ]
        meters = trainer.train_one_epoch(loader, epoch=0)
        assert np.isfinite(meters.meters["loss"].global_avg)
