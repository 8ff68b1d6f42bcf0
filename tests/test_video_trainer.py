"""Video demo E2E + trainer validate/best-checkpoint flow."""
import os.path as osp

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vision_semantic_segmentation_tpu.config import get_demo_cfg_defaults, get_train_cfg_defaults


def _dummy_predictor(num_classes=19):
    from vision_semantic_segmentation_tpu.inference.predictor import SemanticSegmentation
    from vision_semantic_segmentation_tpu.models import build_model

    cfg = get_demo_cfg_defaults()
    cfg.MODEL.TYPE = "Dummy"
    cfg.DATASET.NUM_CLASSES = num_classes
    model, *_ = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    return SemanticSegmentation(cfg, variables=variables, compute_dtype="float32")


class TestVideoDemo:
    def test_generate_video(self, tmp_path, rng):
        import cv2

        src = str(tmp_path / "in.avi")
        writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 48))
        for _ in range(6):
            writer.write((rng.random((48, 64, 3)) * 255).astype(np.uint8))
        writer.release()

        from vision_semantic_segmentation_tpu.runtime.video import generate_video

        out = generate_video(
            None, src, str(tmp_path), output_name="demo",
            predictor=_dummy_predictor(), max_frames=4,
        )
        assert osp.exists(out)
        cap = cv2.VideoCapture(out)
        assert cap.isOpened()
        ok, frame = cap.read()
        assert ok and frame.shape == (48, 64, 3)
        cap.release()


class TestTrainerValidation:
    def test_validate_and_best_checkpoint(self, tmp_path):
        from vision_semantic_segmentation_tpu.train import Trainer

        cfg = get_train_cfg_defaults()
        cfg.MODEL.TYPE = "Dummy"
        cfg.DATASET.NUM_CLASSES = 3
        cfg.DATASET.IN_CHANNELS = 3
        cfg.OPTIMIZER.TYPE = "SGD"
        cfg.OPTIMIZER.BASE_LR = 0.2
        cfg.OPTIMIZER.SGD.momentum = 0.9
        cfg.SCHEDULER.MAX_EPOCH = 2
        cfg.VALIDATE.PERIOD = 1

        trainer = Trainer(cfg, output_dir=str(tmp_path))

        rng = np.random.default_rng(1)
        labels = rng.integers(0, 3, (8, 8, 8)).astype(np.int32)
        images = np.eye(3, dtype=np.float32)[labels] * 4.0

        class Loader:
            def set_epoch(self, e):
                pass

            def __len__(self):
                return 1

            def __iter__(self):
                yield {"image": images, "label": labels}

        trainer.fit(train_loader=Loader(), val_loader=Loader())

        assert osp.exists(osp.join(tmp_path, "last_checkpoint"))
        # re-saves of the same name divert to fresh .vN siblings and retire
        # the superseded dir (crash-safe overwrites — the pointer can never
        # name a torn checkpoint), so assert the newest committed version
        # exists and the pointer names a real directory
        def committed(name):
            import glob

            return [p for p in glob.glob(osp.join(tmp_path, name + "*"))
                    if osp.isdir(p)]

        assert committed("model_latest")
        assert osp.isdir(trainer.checkpoint.get_checkpoint_file())
        # perfect separable toy problem -> best model saved with good mIoU
        assert trainer.best_metric > 0.5
        assert committed("model_best")

        # resume picks up best_metric
        trainer2 = Trainer(cfg, output_dir=str(tmp_path))
        trainer2.resume()
        assert trainer2.best_metric == pytest.approx(trainer.best_metric)
        assert int(trainer2.state.step) == 2
