"""Tests for auxiliary subsystems: ROS glue, markers, prep tools, viz, pcd."""
import numpy as np
import pytest
from PIL import Image

from vision_semantic_segmentation_tpu.utils import (
    TransformTree,
    create_point_cloud,
    pack_rgba,
    pointcloud_to_bev,
    read_pcd,
    unpack_rgba,
    visualize_marker,
)
from vision_semantic_segmentation_tpu.utils.markers import hull_markers


class TestPointCloudPacking:
    def test_pack_matches_struct(self, rng):
        import struct

        rgb = (rng.random((10, 3)) * 255).astype(np.uint8)
        packed = pack_rgba(rgb)
        for i in range(10):
            expected = struct.unpack(
                "I", struct.Struct("BBBB").pack(int(rgb[i, 0]), int(rgb[i, 1]), int(rgb[i, 2]), 255)
            )[0]
            assert int(packed[i]) == expected  # exact reference packing (utils_ros.py:51)

    def test_roundtrip(self, rng):
        rgb = (rng.random((5, 3)) * 255).astype(np.uint8)
        back = unpack_rgba(pack_rgba(rgb))
        np.testing.assert_array_equal(back[:, :3], rgb)
        assert (back[:, 3] == 255).all()

    def test_create_point_cloud(self, rng):
        xyz = rng.random((7, 3)).astype(np.float32)
        rgb = (rng.random((7, 3)) * 255).astype(np.uint8)
        pc = create_point_cloud(xyz, rgb, frame_id="velodyne")
        assert pc["frame_id"] == "velodyne"
        assert pc["fields"] == ["x", "y", "z", "rgba"]
        np.testing.assert_allclose(pc["data"]["x"], xyz[:, 0])
        assert pc["data"].dtype.itemsize == 16  # PointCloud2 xyz+rgba layout

    def test_no_rgb(self, rng):
        pc = create_point_cloud(rng.random((3, 3)))
        assert pc["fields"] == ["x", "y", "z"]


class TestTransformTree:
    def test_lookup_chain(self):
        from vision_semantic_segmentation_tpu.geometry import euler_matrix

        tree = TransformTree()
        T_wb = euler_matrix(0, 0, 0.5)
        T_wb[:3, 3] = [1, 2, 0]
        T_bv = np.eye(4)
        T_bv[:3, 3] = [2.64, 0, 1.98]
        tree.set_transform("world", "base_link", T_wb)
        tree.set_transform("base_link", "velodyne", T_bv)

        T = tree.lookup("world", "velodyne")  # p_world = T @ p_velodyne
        np.testing.assert_allclose(T, T_wb @ T_bv, atol=1e-12)
        T_inv = tree.lookup("velodyne", "world")
        np.testing.assert_allclose(T_inv @ T, np.eye(4), atol=1e-10)

    def test_disconnected_raises(self):
        tree = TransformTree()
        tree.set_transform("a", "b", np.eye(4))
        with pytest.raises(LookupError):
            tree.lookup("a", "z")

    def test_set_pose(self):
        tree = TransformTree()
        tree.set_pose([1.0, 2.0, 3.0], [0, 0, 0, 1.0], "world", "global_map")
        T = tree.lookup("world", "global_map")
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)


class TestMarkers:
    def test_basic(self):
        m = visualize_marker((1, 2, 3), mtype="sphere", color=(0, 1, 0, 1))
        assert m.marker_type == "sphere"
        assert m.position == (1.0, 2.0, 3.0)

    def test_hull_markers(self):
        loop = np.array([[0, 5, 5, 0, 0], [0, 0, 5, 5, 0]], dtype=float)
        markers = hull_markers([loop])
        assert markers[0].marker_type == "line_strip"
        assert markers[0].points.shape == (5, 3)

    def test_unknown_type(self):
        with pytest.raises(ValueError):
            visualize_marker((0, 0, 0), mtype="banana")


class TestConvexHull:
    def test_square_blob(self):
        from vision_semantic_segmentation_tpu.inference import generate_convex_hull

        img = np.zeros((60, 60), np.int32)
        img[10:40, 15:45] = 2
        hulls = generate_convex_hull(img, index_care_about=2, area_threshold=10)
        assert len(hulls) == 1
        loop = hulls[0]
        assert loop.shape[0] == 2
        # closed loop
        np.testing.assert_array_equal(loop[:, 0], loop[:, -1])
        # hull contains the eroded blob corners (erosion shrinks by 1)
        xs, ys = loop[0], loop[1]
        assert xs.min() >= 15 and xs.max() <= 44
        assert ys.min() >= 10 and ys.max() <= 39

    def test_empty(self):
        from vision_semantic_segmentation_tpu.inference import generate_convex_hull

        assert generate_convex_hull(np.zeros((20, 20), np.int32)) == []

    def test_zero_index_rejected(self):
        from vision_semantic_segmentation_tpu.inference import generate_convex_hull

        with pytest.raises(ValueError):
            generate_convex_hull(np.zeros((5, 5), np.int32), index_care_about=0)

    def test_area_threshold(self):
        from vision_semantic_segmentation_tpu.inference import generate_convex_hull

        img = np.zeros((30, 30), np.int32)
        img[2:6, 2:6] = 1  # 16 px -> ~4 after erosion, below threshold
        assert generate_convex_hull(img, area_threshold=30) == []


class TestPreparation:
    def test_mapillary_label_map(self):
        from vision_semantic_segmentation_tpu.train.datasets.preparation import (
            IGNORE_INDEX,
            MERGE_LABEL,
            WHITE_LIST,
            mapillary_label_map,
        )

        table = mapillary_label_map()
        # kept labels map to their position in the white list
        for new_id, src in enumerate(WHITE_LIST):
            assert table[src] == new_id
        # merged labels map to their target's new id (ref :33-41)
        assert table[23] == WHITE_LIST.index(8)    # zebra -> crosswalk
        assert table[29] == WHITE_LIST.index(30)   # terrain -> vegetation
        # everything else ignored
        others = set(range(66)) - set(WHITE_LIST) - {v for vs in MERGE_LABEL.values() for v in vs}
        for i in others:
            assert table[i] == IGNORE_INDEX

    def test_convert_label_image(self, tmp_path):
        from vision_semantic_segmentation_tpu.train.datasets.preparation import (
            convert_label_image,
            mapillary_label_map,
        )

        src = np.array([[2, 23], [0, 65]], dtype=np.uint8)
        src_path = str(tmp_path / "in.png")
        dst_path = str(tmp_path / "out.png")
        Image.fromarray(src).save(src_path)
        convert_label_image(src_path, dst_path, mapillary_label_map())
        out = np.asarray(Image.open(dst_path))
        assert out[0, 0] == 0     # label 2 (road) -> id 0
        assert out[0, 1] == 1     # zebra merged into crosswalk -> id 1
        assert out[1, 0] == 255   # ignored
        assert out[1, 1] == 255

    def test_parallel_prepare(self, tmp_path):
        from vision_semantic_segmentation_tpu.train.datasets.preparation import prepare_labels

        src_dir = tmp_path / "labels"
        dst_dir = tmp_path / "out"
        src_dir.mkdir()
        for i in range(4):
            Image.fromarray(np.full((4, 4), 2, np.uint8)).save(src_dir / f"{i}.png")
        n = prepare_labels(str(src_dir), str(dst_dir), num_workers=2)
        assert n == 4
        out = np.asarray(Image.open(dst_dir / "0.png"))
        assert (out == 0).all()


class TestVisualization:
    def test_apply_color_map(self):
        from vision_semantic_segmentation_tpu.train.datasets.visualization import apply_color_map

        labels_meta = [{"color": [10, 20, 30]}, {"color": [40, 50, 60]}]
        out = apply_color_map(np.array([[0, 1], [255, 1]]), labels_meta)
        np.testing.assert_array_equal(out[0, 0], [10, 20, 30])
        np.testing.assert_array_equal(out[1, 0], [0, 0, 0])  # ignore -> black

    def test_bdd_palette(self):
        from vision_semantic_segmentation_tpu.train.datasets.visualization import (
            bdd_trainid_color_map,
        )

        palette = bdd_trainid_color_map()
        np.testing.assert_array_equal(palette[0], [128, 64, 128])  # road
        np.testing.assert_array_equal(palette[1], [244, 35, 232])  # sidewalk

    def test_make_grid_and_denormalize(self, rng):
        from vision_semantic_segmentation_tpu.train.datasets.visualization import (
            denormalize_images,
            make_grid,
        )

        imgs = rng.standard_normal((5, 8, 8, 3)).astype(np.float32)
        grid = make_grid(denormalize_images(imgs), nrow=3)
        assert grid.dtype == np.uint8
        assert grid.shape == (2 * 8 + 2, 3 * 8 + 4, 3)


class TestPcdBev:
    def test_ascii_pcd_roundtrip(self, tmp_path, rng):
        pts = rng.random((20, 4)).astype(np.float32)
        path = str(tmp_path / "map.pcd")
        with open(path, "w") as f:
            f.write(
                "VERSION .7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
                "TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH 20\nHEIGHT 1\n"
                "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 20\nDATA ascii\n"
            )
            for p in pts:
                f.write(" ".join(f"{v:.6f}" for v in p) + "\n")
        data = read_pcd(path)
        np.testing.assert_allclose(data["x"], pts[:, 0], atol=1e-5)
        np.testing.assert_allclose(data["intensity"], pts[:, 3], atol=1e-5)

    def test_bev_rasterization(self, rng):
        xyz = rng.random((100, 3)) * 10
        img = pointcloud_to_bev(xyz, intensity=np.ones(100), resolution=1.0)
        assert img.ndim == 3 and img.shape[2] == 3
        assert img.sum() > 0


class TestNativePointCloudDecode:
    def _payload(self, rng, n=500, with_nans=False):
        pts = rng.standard_normal((n, 4)).astype(np.float32)
        if with_nans:
            pts[::50, 2] = np.nan
        point_step = 22  # x(0) y(4) z(8) intensity(16) + padding
        raw = np.zeros((n, point_step), np.uint8)
        raw[:, 0:4] = pts[:, 0:1].view(np.uint8)
        raw[:, 4:8] = pts[:, 1:2].view(np.uint8)
        raw[:, 8:12] = pts[:, 2:3].view(np.uint8)
        raw[:, 16:20] = pts[:, 3:4].view(np.uint8)
        return pts, raw.tobytes(), point_step

    def test_decode_matches_source(self, rng):
        from vision_semantic_segmentation_tpu.runtime.native_io import (
            decode_pointcloud2,
            native_available,
        )

        pts, data, step = self._payload(rng)
        out = decode_pointcloud2(data, 500, step, [0, 4, 8, 16], [7, 7, 7, 7])
        assert out.shape == (4, 500)
        np.testing.assert_allclose(out.T, pts, atol=1e-6)
        assert native_available(), "native decoder should build in this image"

    def test_nan_skipping(self, rng):
        from vision_semantic_segmentation_tpu.runtime.native_io import decode_pointcloud2

        pts, data, step = self._payload(rng, with_nans=True)
        out = decode_pointcloud2(data, 500, step, [0, 4, 8, 16], [7, 7, 7, 7])
        assert out.shape[1] == 500 - 10
        assert np.isfinite(out).all()

    def test_native_matches_numpy_fallback(self, rng):
        from vision_semantic_segmentation_tpu.runtime import native_io

        pts, data, step = self._payload(rng, with_nans=True)
        native = native_io.decode_pointcloud2(data, 500, step, [0, 4, 8, 16], [7, 7, 7, 7])
        fallback = native_io._numpy_decode(data, 500, step, [0, 4, 8, 16], [7, 7, 7, 7], True)
        np.testing.assert_allclose(native, fallback, atol=1e-6)

    def test_decode_and_bucket(self, rng):
        from vision_semantic_segmentation_tpu.runtime.native_io import decode_and_bucket

        pts, data, step = self._payload(rng)
        out, valid = decode_and_bucket(data, 500, step, [0, 4, 8, 16], [7, 7, 7, 7], bucket=1024)
        assert out.shape == (4, 1024) and valid.shape == (1024,)
        assert valid.sum() == 500
        np.testing.assert_allclose(out[:, :500].T, pts, atol=1e-6)
        assert (out[:, 500:] == 0).all()

    def test_mixed_datatypes(self, rng):
        from vision_semantic_segmentation_tpu.runtime.native_io import decode_pointcloud2

        n = 64
        raw = np.zeros((n, 12), np.uint8)
        f = rng.standard_normal((n, 1)).astype(np.float32)
        u16 = rng.integers(0, 1000, (n, 1)).astype(np.uint16)
        raw[:, 0:4] = f.view(np.uint8)
        raw[:, 4:6] = u16.view(np.uint8)
        out = decode_pointcloud2(raw.tobytes(), n, 12, [0, 4], [7, 4])
        np.testing.assert_allclose(out[0], f[:, 0], atol=1e-6)
        np.testing.assert_allclose(out[1], u16[:, 0].astype(np.float32))


class TestTensorboardAndViz:
    def test_add_scalars(self):
        from vision_semantic_segmentation_tpu.train.meters import MeterLogger
        from vision_semantic_segmentation_tpu.train.tensorboard_util import add_scalars

        class FakeWriter:
            def __init__(self):
                self.scalars = {}

            def add_scalar(self, tag, value, step):
                self.scalars[tag] = (value, step)

        ml = MeterLogger()
        ml.update(loss=2.0, acc=0.5)
        w = FakeWriter()
        add_scalars(w, ml, "train", 7)
        assert w.scalars["train/loss"] == (2.0, 7)
        assert w.scalars["train/acc"] == (0.5, 7)

    def test_log_network_outputs(self, rng):
        from vision_semantic_segmentation_tpu.train.datasets.visualization import (
            log_network_outputs,
        )

        class FakeWriter:
            def __init__(self):
                self.images = {}

            def add_image(self, tag, img, step, dataformats="HWC"):
                self.images[tag] = img

        w = FakeWriter()
        log_network_outputs(
            w, "val",
            rng.standard_normal((2, 8, 8, 3)).astype(np.float32),
            rng.integers(0, 19, (2, 8, 8)),
            rng.integers(0, 19, (2, 8, 8)),
            global_step=1,
        )
        assert set(w.images) == {"val/image", "val/prediction", "val/label"}
        assert w.images["val/image"].dtype == np.uint8

    def test_compare_maps(self, tmp_path, rng):
        import cv2

        from vision_semantic_segmentation_tpu.evaluation.compare import compare_maps
        from vision_semantic_segmentation_tpu.mapping import LABEL_COLORS

        gt = tmp_path / "gt"
        gt.mkdir()
        road = np.zeros((40, 40, 3), np.uint8)
        road[:20] = 255
        cv2.imwrite(str(gt / "bev-5cm-road.jpg"), road)
        cv2.imwrite(str(gt / "bev-5cm-lanes.jpg"), np.zeros_like(road))
        cv2.imwrite(str(gt / "bev-5cm-crosswalks.jpg"), np.zeros_like(road))
        cv2.imwrite(str(gt / "bev-5cm-mask.jpg"), np.full_like(road, 255))

        pred = np.zeros((10, 10, 3), np.uint8)
        pred[:5] = LABEL_COLORS[0][::-1]
        pred_path = str(tmp_path / "pred.png")
        cv2.imwrite(pred_path, pred)
        out = str(tmp_path / "panel.png")
        fig = compare_maps(pred_path, str(gt), save_path=out)
        assert fig is not None
        import os.path as osp

        assert osp.exists(out)


class TestPaletteFromCfg:
    """TRAIN_DATASET / DATASET_CONFIG select the node/demo palette like
    the reference (ref video_generator.py:24-27,
    vision_semantic_segmentation_node.py:62-63)."""

    def test_default_is_mapillary(self):
        from vision_semantic_segmentation_tpu.config import get_cfg_defaults
        from vision_semantic_segmentation_tpu.ops.colormap import (
            MAPILLARY_19_PALETTE,
        )
        from vision_semantic_segmentation_tpu.train.datasets.visualization import (
            palette_from_cfg,
        )

        net = get_cfg_defaults().VISION_SEM_SEG.SEM_SEG_NETWORK
        assert np.array_equal(palette_from_cfg(net), MAPILLARY_19_PALETTE)

    def test_bdd_and_dataset_config(self, tmp_path):
        import json

        from vision_semantic_segmentation_tpu.config import get_cfg_defaults
        from vision_semantic_segmentation_tpu.train.datasets.visualization import (
            bdd_trainid_color_map,
            palette_from_cfg,
        )

        net = get_cfg_defaults().VISION_SEM_SEG.SEM_SEG_NETWORK
        bdd = net.clone()
        bdd.TRAIN_DATASET = "BDD"
        assert np.array_equal(palette_from_cfg(bdd), bdd_trainid_color_map())

        path = tmp_path / "config.json"
        path.write_text(json.dumps({"labels": [
            {"color": [1, 2, 3], "name": "a"},
            {"color": [9, 8, 7], "name": "b"},
        ]}))
        custom = net.clone()
        custom.DATASET_CONFIG = str(path)
        p = palette_from_cfg(custom)
        assert p.shape == (256, 3) and list(p[1]) == [9, 8, 7]
