"""CLI launcher tests (python -m vision_semantic_segmentation_tpu ...)."""
import os

import numpy as np

from vision_semantic_segmentation_tpu.__main__ import main as cli_main


def _write_cfg(tmp_path, extra="", mapping_extra=""):
    cfg_path = tmp_path / "exp.yaml"
    cfg_path.write_text(
        "MAPPING:\n"
        "  BOUNDARY: [[100, 140], [800, 840]]\n"
        "  POINT_BUCKET: 4096\n"
        f"{mapping_extra}"
        f"OUTPUT_DIR: '{tmp_path}/out'\n"
        f"{extra}"
    )
    return str(cfg_path)


def test_replay_cli(tmp_path, rng):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mapping import make_frame
    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.runtime.io import FrameRecord, save_frames

    cfg = get_cfg_defaults()
    cfg.MAPPING.BOUNDARY = [[100, 140], [800, 840]]
    inputs = tmp_path / "inputs"
    inputs.mkdir()
    frames = []
    for i in range(2):
        pts, img, position, quaternion = make_frame(rng, cfg, n=500)
        frames.append(FrameRecord(pcd=pts, pcd_frame_id="world", semantic_image=img,
                                  position=position, quaternion=quaternion, stamp=float(i)))
    save_frames(frames, str(inputs / "seq.npz"))

    cfg_path = _write_cfg(tmp_path)
    cli_main(["replay", "--cfg", cfg_path, "--input-dir", str(inputs)])

    out_maps = []
    for root, _, files in os.walk(tmp_path / "out"):
        out_maps += [f for f in files if f.startswith("global_map")]
    assert out_maps, "replay CLI produced no map"


def test_eval_cli(tmp_path):
    import cv2

    from vision_semantic_segmentation_tpu.mapping import LABEL_COLORS

    gt = tmp_path / "gt"
    gt.mkdir()
    road = np.zeros((80, 80, 3), np.uint8)
    road[:40] = 255
    cv2.imwrite(str(gt / "bev-5cm-road.jpg"), road)
    cv2.imwrite(str(gt / "bev-5cm-lanes.jpg"), np.zeros_like(road))
    cv2.imwrite(str(gt / "bev-5cm-crosswalks.jpg"), np.zeros_like(road))
    cv2.imwrite(str(gt / "bev-5cm-mask.jpg"), np.full_like(road, 255))

    maps = tmp_path / "maps"
    maps.mkdir()
    pred = np.zeros((20, 20, 3), np.uint8)
    pred[:10] = LABEL_COLORS[0][::-1]
    cv2.imwrite(str(maps / "m.png"), pred)

    cli_main(["eval", "--maps", str(maps), "--gt", str(gt)])


def test_convert_cli(tmp_path):
    import torch

    sd = {"module.conv1.weight": torch.randn(4, 3, 3, 3)}
    pth = tmp_path / "w.pth"
    torch.save({"model": sd}, pth)
    cli_main(["convert", str(pth)])
    assert (tmp_path / "w.npz").exists()

    from vision_semantic_segmentation_tpu.models import load_npz

    tree = load_npz(str(tmp_path / "w.npz"))
    assert tree["params"]["conv1"]["kernel"].shape == (3, 3, 3, 4)


import pytest


@pytest.mark.parametrize("depth_method", ["points_map", "points_raw"])
def test_pipeline_cli(tmp_path, rng, depth_method):
    """End-to-end CLI: both nodes over a recorded bag.

    points_raw pins the cloud-topic wiring: the CLI must publish clouds
    on the topic the node subscribes to for the configured
    MAPPING.DEPTH_METHOD (/points_raw), not a hardcoded /reduced_map —
    a mismatch silently drops every frame and produces no map.
    """
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mapping import make_frame
    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.runtime.io import FrameRecord, save_frames

    cfg = get_cfg_defaults()
    cfg.MAPPING.BOUNDARY = [[100, 140], [800, 840]]
    frames = []
    for i in range(2):
        pts, _, position, quaternion = make_frame(rng, cfg, n=300)
        raw = (rng.random((720, 960, 3)) * 255).astype(np.uint8)
        frames.append(FrameRecord(pcd=pts, pcd_frame_id="world", semantic_image=raw,
                                  position=position, quaternion=quaternion,
                                  camera="camera1", stamp=float(i)))
    bag = str(tmp_path / "bag.npz")
    save_frames(frames, bag)

    cfg_path = _write_cfg(
        tmp_path,
        extra=(
            "TEST_END_TIME: 100\n"
            "VISION_SEM_SEG:\n"
            "  SEM_SEG_NETWORK:\n"
            "    MODEL:\n"
            "      TYPE: Dummy\n"
        ),
        mapping_extra=f"  DEPTH_METHOD: {depth_method}\n",
    )
    # Dummy model has no weights on disk; monkeypatch the predictor builder
    import vision_semantic_segmentation_tpu.runtime.node as node_mod
    import jax
    import jax.numpy as jnp
    from vision_semantic_segmentation_tpu.models import build_model

    orig = node_mod.SegmentationNode.__init__

    def patched(self, cfg, bus, predictor=None, cameras=("camera1",), publish_hulls=False):
        if predictor is None:
            net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
            model, *_ = build_model(net_cfg)
            variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
            from vision_semantic_segmentation_tpu.inference.predictor import SemanticSegmentation

            predictor = SemanticSegmentation(net_cfg, variables=variables, compute_dtype="float32")
        orig(self, cfg, bus, predictor=predictor, cameras=cameras, publish_hulls=publish_hulls)

    node_mod.SegmentationNode.__init__ = patched
    try:
        cli_main(["pipeline", "--cfg", cfg_path, "--bag", bag])
    finally:
        node_mod.SegmentationNode.__init__ = orig

    found = []
    for root, _, files in os.walk(tmp_path / "out"):
        found += [f for f in files if f == "global_map.png"]
    assert found, "pipeline CLI produced no global map"


def test_train_cli(tmp_path, rng, monkeypatch):
    """Train CLI end-to-end with a Dummy model and a synthetic dataset."""
    from PIL import Image

    # minimal Pascal-style dataset layout
    root = tmp_path / "voc"
    (root / "ImageSets/Segmentation").mkdir(parents=True)
    (root / "JPEGImages").mkdir()
    (root / "SegmentationClass").mkdir()
    ids = [f"im{i}" for i in range(4)]
    (root / "ImageSets/Segmentation/train.txt").write_text("\n".join(ids) + "\n")
    for i in ids:
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)).save(
            root / "JPEGImages" / f"{i}.jpg"
        )
        Image.fromarray(rng.integers(0, 3, (16, 16)).astype(np.uint8)).save(
            root / "SegmentationClass" / f"{i}.png"
        )

    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(
        f"""
MODEL:
  TYPE: Dummy
DATASET:
  NAME: Pascal
  NUM_CLASSES: 3
  IN_CHANNELS: 3
  ROOT_DIR: '{root}'
OPTIMIZER:
  TYPE: SGD
  BASE_LR: 0.05
SCHEDULER:
  MAX_EPOCH: 1
TRAIN:
  BATCH_SIZE: 2
  AUGMENTATION: [[Resize, [16, 16]], ToTensor]
OUTPUT_DIR: '{tmp_path}/train_out'
"""
    )
    cli_main(["train", "--cfg", str(cfg_path)])
    assert (tmp_path / "train_out" / "last_checkpoint").exists()


def test_replay_empty_dir_warns(tmp_path, capsys):
    """A typo'd/empty MAPPING.INPUT_DIR must not be a silent success."""
    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.runtime.replay import MappingReplay

    cfg = get_cfg_defaults()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.MAPPING.INPUT_DIR = str(tmp_path / "nonexistent")
    maps = MappingReplay(cfg).replay_dir()
    assert maps == []
    assert "no sequence files" in capsys.readouterr().err


class TestExportCommand:
    def test_export_bag_to_npz(self, rng, tmp_path):
        from test_rosbag import _make_bag
        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.runtime.io import load_frames

        bag = tmp_path / "seq.bag"
        _make_bag(bag, rng)
        out = str(tmp_path / "seq.npz")
        main(["export", str(bag), "--out", out])
        frames = load_frames(out)
        assert len(frames) == 3
        assert frames[1].position[0] == 1.0

    def test_export_hkl_to_npz(self, rng, tmp_path):
        import numpy as np

        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.runtime.hickle_io import dump_hickle
        from vision_semantic_segmentation_tpu.runtime.io import load_frames

        input_list = [{
            "pcd": rng.random((4, 12)),
            "pcd_frame_id": "world",
            "semantic_image": np.zeros((4, 4, 3), np.uint8),
            "pose": {
                "position": {"x": 3.0, "y": 1.0, "z": 0.0},
                "orientation": {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0},
            },
        }]
        src = str(tmp_path / "input_list_0.hkl")
        dump_hickle(input_list, src)
        main(["export", src])
        frames = load_frames(str(tmp_path / "input_list_0.npz"))
        assert len(frames) == 1 and frames[0].position[0] == 3.0


class TestFusedPipelineCommand:
    def test_fused_pipeline_over_npz(self, rng, tmp_path):
        """--fused: windowed FusedFramePipeline end-to-end through the CLI."""
        import glob

        import jax
        import jax.numpy as jnp
        import numpy as np

        from test_runtime import small_cfg, _make_sequence
        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.models import build_model
        from vision_semantic_segmentation_tpu.models.convert import save_npz
        from vision_semantic_segmentation_tpu.runtime.io import save_frames

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        net_cfg.MODEL.COMPUTE_DTYPE = "float32"

        model, *_ = build_model(net_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32)
        )
        weight = str(tmp_path / "w.npz")
        save_npz(variables, weight)
        net_cfg.MODEL.WEIGHT = weight

        frames = _make_sequence(rng, cfg, n_frames=5, n_pts=800)
        bag = str(tmp_path / "seq.npz")
        save_frames(frames, bag)
        cfg_path = str(tmp_path / "fused.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())

        main(["pipeline", "--cfg", cfg_path, "--bag", bag, "--fused"])
        maps = glob.glob(
            str(tmp_path / "out" / "**" / "global_map_fused.png"), recursive=True
        )
        assert maps, "fused pipeline wrote no map"


class TestReplayFrameParallel:
    def test_replay_cli_frame_parallel(self, rng, tmp_path):
        """replay --frame-parallel produces the same map as sequential."""
        import cv2
        import numpy as np

        from test_runtime import small_cfg, _make_sequence
        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.runtime.io import save_frames

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        input_dir = tmp_path / "inputs"
        input_dir.mkdir(parents=True, exist_ok=True)
        save_frames(
            _make_sequence(rng, cfg, n_frames=8, n_pts=900),
            str(input_dir / "seq.npz"),
        )
        cfg_path = str(tmp_path / "fp.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())

        main(["replay", "--cfg", cfg_path, "--input-dir", str(input_dir)])
        import glob

        seq_map = sorted(glob.glob(str(tmp_path / "out" / "**" / "global_map_seq.png"),
                                   recursive=True))[-1]
        a = cv2.imread(seq_map)

        main(["replay", "--cfg", cfg_path, "--input-dir", str(input_dir),
              "--frame-parallel"])
        fp_map = sorted(glob.glob(str(tmp_path / "out" / "**" / "global_map_seq.png"),
                                  recursive=True))[-1]
        b = cv2.imread(fp_map)
        assert fp_map != seq_map
        # identical rendered maps (f32 re-association cannot flip the
        # argmax colors on this fixture)
        np.testing.assert_array_equal(a, b)


class TestUpdateBackendKnobs:
    def test_replay_cli_scatter_radix_matches_defaults(self, rng, tmp_path):
        """MAPPING.SORT_METHOD/FOLD_METHOD flow YAML -> CLI replay -> engine:
        the radix+scatter map renders identically to the default backends."""
        import glob

        import cv2
        import numpy as np

        from test_runtime import small_cfg, _make_sequence
        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.runtime.io import save_frames

        cfg = small_cfg(tmp_path)
        cfg.MAPPING.POINT_BUCKET = 2048
        input_dir = tmp_path / "inputs"
        input_dir.mkdir(parents=True, exist_ok=True)
        save_frames(
            _make_sequence(rng, cfg, n_frames=4, n_pts=900),
            str(input_dir / "seq.npz"),
        )
        cfg_path = str(tmp_path / "default.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())
        main(["replay", "--cfg", cfg_path, "--input-dir", str(input_dir)])
        a_path = sorted(glob.glob(
            str(tmp_path / "out" / "**" / "global_map_seq.png"), recursive=True
        ))[-1]
        a = cv2.imread(a_path)

        cfg.MAPPING.SORT_METHOD = "radix"
        cfg.MAPPING.FOLD_METHOD = "scatter"
        cfg_path2 = str(tmp_path / "backends.yaml")
        with open(cfg_path2, "w") as f:
            f.write(cfg.dump())
        main(["replay", "--cfg", cfg_path2, "--input-dir", str(input_dir)])
        b_path = sorted(glob.glob(
            str(tmp_path / "out" / "**" / "global_map_seq.png"), recursive=True
        ))[-1]
        assert b_path != a_path
        np.testing.assert_array_equal(cv2.imread(b_path), a)
