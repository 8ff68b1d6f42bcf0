"""Config system tests (yacs-compatible contract)."""
import os.path as osp

import pytest

from vision_semantic_segmentation_tpu.config import (
    CN,
    get_cfg_defaults,
    get_demo_cfg_defaults,
    get_train_cfg_defaults,
    resolve_output_dir,
)


def test_defaults_match_reference_keys():
    cfg = get_cfg_defaults()
    assert cfg.TASK_NAME == "cfn_mtx_with_intensity"
    assert cfg.LABELS == [2, 1, 8, 10, 3]
    assert cfg.LABELS_NAMES == ["road", "crosswalk", "lane", "vegetation", "sidewalk"]
    assert cfg.LABEL_COLORS[0] == [128, 64, 128]
    assert cfg.MAPPING.RESOLUTION == 0.1
    assert cfg.MAPPING.BOUNDARY == [[100, 300], [800, 1000]]
    assert cfg.MAPPING.PCD.USE_INTENSITY is True
    assert cfg.MAPPING.PCD.RANGE_MAX == 100.0
    net = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    assert net.MODEL.BACKBONE == "resnext50_32x4d"
    assert net.MODEL.OUTPUT_STRIDE == 8
    assert net.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS == 256
    assert net.DATASET.NUM_CLASSES == 19


def test_clone_isolation():
    a = get_cfg_defaults()
    b = get_cfg_defaults()
    a.MAPPING.RESOLUTION = 0.2
    assert b.MAPPING.RESOLUTION == 0.1


def test_freeze():
    cfg = get_cfg_defaults()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TASK_NAME = "x"
    with pytest.raises(AttributeError):
        cfg.MAPPING.RESOLUTION = 0.5
    cfg.defrost()
    cfg.TASK_NAME = "x"
    assert cfg.TASK_NAME == "x"


def test_merge_from_file(tmp_path):
    yaml_file = tmp_path / "exp.yaml"
    yaml_file.write_text(
        "TASK_NAME: test_run\n"
        "MAPPING:\n"
        "  RESOLUTION: 0.2\n"
        "  BOUNDARY: [[0, 1000], [0, 1400]]\n"
    )
    cfg = get_cfg_defaults()
    cfg.merge_from_file(str(yaml_file))
    assert cfg.TASK_NAME == "test_run"
    assert cfg.MAPPING.RESOLUTION == 0.2
    assert cfg.MAPPING.BOUNDARY == [[0, 1000], [0, 1400]]
    # untouched keys intact
    assert cfg.MAPPING.PCD.RANGE_MAX == 100.0


def test_merge_reference_example_yaml():
    """The reference's own experiment YAML must merge cleanly."""
    ref_yaml = "/root/reference/config/example.yaml"
    if not osp.exists(ref_yaml):
        pytest.skip("reference not mounted")
    cfg = get_cfg_defaults()
    cfg.merge_from_file(ref_yaml)
    assert cfg.MAPPING.RESOLUTION > 0


def test_merge_from_list():
    cfg = get_train_cfg_defaults()
    cfg.merge_from_list(["OPTIMIZER.BASE_LR", 0.01, "TRAIN.BATCH_SIZE", "8"])
    assert cfg.OPTIMIZER.BASE_LR == 0.01
    assert cfg.TRAIN.BATCH_SIZE == 8
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NO.SUCH.KEY", 1])


def test_unknown_key_rejected(tmp_path):
    yaml_file = tmp_path / "bad.yaml"
    yaml_file.write_text("NOT_A_KEY: 1\n")
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(yaml_file))


def test_output_dir_substitution():
    out = resolve_output_dir("@/outputs", "taskA")
    assert "@" not in out
    assert out.endswith(osp.join("outputs", "taskA"))


def test_demo_cfg():
    cfg = get_demo_cfg_defaults()
    assert cfg.MODEL.ASPP.OUT_CHANNELS == 256
    assert cfg.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS == 48
    assert cfg.MODEL.OUTPUT_STRIDE == 16


class TestShippedExampleConfigs:
    """configs/*.yaml must always merge against the current schema."""

    def test_example_mapping_merges(self):
        import os.path as osp
        from vision_semantic_segmentation_tpu.config import get_cfg_defaults

        path = osp.join(osp.dirname(__file__), "..", "configs", "example_mapping.yaml")
        cfg = get_cfg_defaults()
        cfg.merge_from_file(path)
        assert cfg.MAPPING.RESOLUTION == 0.2
        assert cfg.MAPPING.BOUNDARY == [[0, 600], [0, 1400]]
        assert cfg.VISION_SEM_SEG.SEM_SEG_NETWORK.MODEL.TYPE == "DeepLabv3+"

    def test_example_train_merges(self):
        import os.path as osp
        from vision_semantic_segmentation_tpu.config import get_train_cfg_defaults

        path = osp.join(osp.dirname(__file__), "..", "configs", "example_train.yaml")
        cfg = get_train_cfg_defaults()
        cfg.merge_from_file(path)
        assert cfg.OPTIMIZER.TYPE == "SGD"
        assert cfg.SCHEDULER.TYPE == "PolyLRDecay"
        assert list(cfg.TRAIN.AUGMENTATION)[0] == "RandomHorizontalFlip"
