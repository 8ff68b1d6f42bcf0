"""Map evaluation harness tests (ref test_semantic_mapping.py behavior)."""
import numpy as np
import pytest

from vision_semantic_segmentation_tpu.evaluation import MapEvaluator, convert_labels
from vision_semantic_segmentation_tpu.mapping import LABEL_COLORS


def test_convert_labels_golden():
    img = np.zeros((2, 3, 3), dtype=np.uint8)
    img[0, 0] = [128, 64, 128]   # road -> 1
    img[0, 1] = [140, 140, 200]  # crosswalk -> 2
    img[0, 2] = [255, 255, 255]  # lane -> 3
    img[1, 0] = [244, 35, 232]   # sidewalk -> 4
    img[1, 1] = [107, 142, 35]   # vegetation -> 5
    labels = convert_labels(img)
    np.testing.assert_array_equal(labels, [[1, 2, 3], [4, 5, 0]])


def test_convert_labels_mask():
    img = np.tile(np.array([128, 64, 128], np.uint8), (4, 4, 1))
    mask = np.zeros((4, 4))
    mask[:2] = 1
    labels = convert_labels(img, mask)
    assert labels[:2].sum() == 8 and labels[2:].sum() == 0


def _fake_gt_dir(tmp_path, size=(80, 120)):
    import cv2

    h, w = size
    road = np.zeros((h * 4, w * 4, 3), np.uint8)
    road[: h * 2] = 255
    lane = np.zeros_like(road)
    lane[h : h * 2, : w * 2] = 255
    crosswalk = np.zeros_like(road)
    mask = np.full_like(road, 255)
    cv2.imwrite(str(tmp_path / "bev-5cm-road.jpg"), road)
    cv2.imwrite(str(tmp_path / "bev-5cm-lanes.jpg"), lane)
    cv2.imwrite(str(tmp_path / "bev-5cm-crosswalks.jpg"), crosswalk)
    cv2.imwrite(str(tmp_path / "bev-5cm-mask.jpg"), mask)
    return str(tmp_path)


def test_evaluator_end_to_end(tmp_path):
    gt_dir = _fake_gt_dir(tmp_path)
    ev = MapEvaluator(ground_truth_dir=gt_dir)
    h, w = ev.ground_truth.shape

    # perfect prediction: render the ground truth back to RGB
    pred = np.zeros((h, w, 3), np.uint8)
    pred[ev.ground_truth == 1] = LABEL_COLORS[0]
    pred[ev.ground_truth == 3] = LABEL_COLORS[2]
    result = ev.test_single_map(pred, verbose=False)
    assert result["iou"]["road"] == pytest.approx(1.0)
    assert result["iou"]["lane"] == pytest.approx(1.0)
    assert result["missing_rate"] == pytest.approx(0.0)

    # truth.npy cache was written and reloads
    ev2 = MapEvaluator(ground_truth_dir=gt_dir)
    np.testing.assert_array_equal(ev2.ground_truth, ev.ground_truth)


def test_evaluator_partial_iou(tmp_path):
    gt_dir = _fake_gt_dir(tmp_path)
    ev = MapEvaluator(ground_truth_dir=gt_dir)
    h, w = ev.ground_truth.shape
    pred = np.zeros((h, w, 3), np.uint8)
    road_mask = ev.ground_truth == 1
    rows = np.where(road_mask.any(axis=1))[0]
    half = rows[: len(rows) // 2]
    sel = np.zeros_like(road_mask)
    sel[half] = road_mask[half]
    pred[sel] = LABEL_COLORS[0]
    result = ev.test_single_map(pred, verbose=False)
    # first half of road rows are full-width, the rest shares with lane
    assert 0.5 < result["iou"]["road"] < 0.8
    assert result["missing_rate"] > 0.2


def test_full_test_batch(tmp_path):
    import cv2

    gt_dir = _fake_gt_dir(tmp_path)
    ev = MapEvaluator(ground_truth_dir=gt_dir)
    h, w = ev.ground_truth.shape
    maps_dir = tmp_path / "global_maps"
    maps_dir.mkdir()
    pred = np.zeros((h, w, 3), np.uint8)
    pred[ev.ground_truth == 1] = LABEL_COLORS[0][::-1]  # BGR on disk
    cv2.imwrite(str(maps_dir / "m0.png"), pred)
    cv2.imwrite(str(maps_dir / "m1.png"), pred)
    summary = ev.full_test(str(maps_dir))
    assert summary["num_maps"] == 2
    assert summary["iou"]["road"] == pytest.approx(1.0)
