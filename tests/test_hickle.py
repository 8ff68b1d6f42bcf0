"""Hickle (.hkl) schema reader/writer tests.

The reference's recorded-input contract is ``input_list.hkl`` written by
``hickle.dump`` (ref mapping.py:323-326) and read back by ``hickle.load``
(ref mapping_replay.py:146-159).  These tests pin our h5py-backed schema
implementation: round-trips through the vendored writer, tolerance for the
hickle-3 layout the reference's vintage produced, and reconstruction of the
pickled ``geometry_msgs/Pose`` payloads without a ROS installation.
"""
import pickle
import sys
import types

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from vision_semantic_segmentation_tpu.runtime.hickle_io import (
    Pose,
    Point,
    Quaternion,
    RosMessageStub,
    dump_hickle,
    load_hickle,
)
from vision_semantic_segmentation_tpu.runtime.io import load_reference_dump


def _install_ros_like_modules(monkeypatch):
    """Register genpy-style Pose/Point/Quaternion under the real ROS module
    paths so pickling records ``geometry_msgs.msg._Pose.Pose`` etc., exactly
    as a reference-produced dump would."""
    made = {}
    for mod_name, cls_name, slots in [
        ("geometry_msgs.msg._Point", "Point", ("x", "y", "z")),
        ("geometry_msgs.msg._Quaternion", "Quaternion", ("x", "y", "z", "w")),
        ("geometry_msgs.msg._Pose", "Pose", ("position", "orientation")),
    ]:
        cls = type(cls_name, (RosMessageStub,), {
            "__module__": mod_name, "__slots__": slots,
        })
        mod = types.ModuleType(mod_name)
        setattr(mod, cls_name, cls)
        monkeypatch.setitem(sys.modules, mod_name, mod)
        made[cls_name] = cls
    for pkg in ("geometry_msgs", "geometry_msgs.msg"):
        monkeypatch.setitem(sys.modules, pkg, types.ModuleType(pkg))
    return made


class TestRoundTrip:
    def test_containers_and_scalars(self, tmp_path):
        obj = {
            "a": [1, 2, 3],
            "b": (1.5, "two"),
            "c": {"nested": True, "none": None},
            "s": "frame_id",
            "raw": b"\x00\x01\x02",
            "n": 42,
            "f": -0.25,
            7: "int key",
        }
        path = str(tmp_path / "rt.hkl")
        dump_hickle(obj, path)
        out = load_hickle(path)
        assert out["a"] == [1, 2, 3]
        assert out["b"] == (1.5, "two")
        assert out["c"] == {"nested": True, "none": None}
        assert out["s"] == "frame_id"
        assert out["raw"] == b"\x00\x01\x02"
        assert out["n"] == 42 and isinstance(out["n"], int)
        assert out["f"] == -0.25 and isinstance(out["f"], float)
        assert out[7] == "int key"

    def test_ndarrays(self, rng, tmp_path):
        obj = [rng.random((4, 17)), (rng.random((3, 5, 2)) * 255).astype(np.uint8)]
        path = str(tmp_path / "arr.hkl")
        dump_hickle(obj, path)
        out = load_hickle(path)
        np.testing.assert_array_equal(out[0], obj[0])
        np.testing.assert_array_equal(out[1], obj[1])
        assert out[1].dtype == np.uint8

    def test_list_order_preserved_past_ten(self, tmp_path):
        """data_2 must sort after data_10 numerically, not lexically."""
        obj = list(range(13))
        # Heterogeneous tail forces the group (per-element) representation.
        obj.append("tail")
        path = str(tmp_path / "order.hkl")
        dump_hickle(obj, path)
        assert load_hickle(path) == list(range(13)) + ["tail"]


class _Odd:
    def __init__(self):
        self.value = 7


class TestPickledRosPayloads:
    def test_pose_unpickles_via_stubs(self, tmp_path, monkeypatch):
        ros = _install_ros_like_modules(monkeypatch)
        pose = ros["Pose"](
            ros["Point"](1.0, 2.0, 3.0), ros["Quaternion"](0.0, 0.0, 0.0, 1.0)
        )
        payload = pickle.dumps(pose)
        monkeypatch.undo()  # remove the fake ROS modules before loading

        from vision_semantic_segmentation_tpu.runtime.hickle_io import _loads

        out = _loads(payload)
        assert isinstance(out, Pose)
        assert (out.position.x, out.position.y, out.position.z) == (1, 2, 3)
        assert out.orientation.w == 1.0

    def test_unknown_class_falls_back_to_generic_stub(self):
        payload = pickle.dumps(_Odd())
        payload = payload.replace(b"test_hickle", b"rospy_fakem")
        from vision_semantic_segmentation_tpu.runtime.hickle_io import _loads

        out = _loads(payload)
        assert out.value == 7

    def test_reference_input_list_hkl(self, rng, tmp_path, monkeypatch):
        """Full contract: .hkl input_list with pickled ROS poses ->
        FrameRecords (ref mapping.py:309-313, mapping_replay.py:146-159)."""
        ros = _install_ros_like_modules(monkeypatch)
        input_list = []
        for i in range(3):
            pose = ros["Pose"](
                ros["Point"](float(i), 2.0 * i, 0.5),
                ros["Quaternion"](0.0, 0.0, 0.0, 1.0),
            )
            input_list.append({
                "pcd": rng.random((4, 20)),
                "pcd_frame_id": "world",
                "semantic_image": (rng.random((6, 8, 3)) * 255).astype(np.uint8),
                "pose": pose,
            })
        path = str(tmp_path / "input_list_0.hkl")
        dump_hickle(input_list, path)
        monkeypatch.undo()

        frames = load_reference_dump(path)
        assert len(frames) == 3
        np.testing.assert_array_equal(frames[1].position, [1.0, 2.0, 0.5])
        np.testing.assert_array_equal(frames[1].quaternion, [0, 0, 0, 1])
        np.testing.assert_allclose(frames[2].pcd, input_list[2]["pcd"])
        np.testing.assert_array_equal(
            frames[0].semantic_image, input_list[0]["semantic_image"]
        )
        assert frames[0].pcd_frame_id == "world"


class TestHickle3Layout:
    """The reference era shipped hickle 3.x: root child ``data_0``, ``type``
    attrs as length-1 byte arrays, dict children under plain str(key) names
    with ``key_type`` attrs."""

    def test_v3_file_loads(self, rng, tmp_path):
        path = str(tmp_path / "v3.hkl")
        img = (rng.random((4, 4, 3)) * 255).astype(np.uint8)
        with h5py.File(path, "w") as f:
            f.attrs["CLASS"] = b"hickle"
            f.attrs["VERSION"] = 3
            root = f.create_group("data_0")
            root.attrs["type"] = [b"list"]
            frame = root.create_group("data_0")
            frame.attrs["type"] = [b"dict"]

            ds = frame.create_dataset("pcd", data=rng.random((4, 9)))
            ds.attrs["type"] = [b"ndarray"]
            ds.attrs["key_type"] = [b"str"]

            ds = frame.create_dataset(
                "pcd_frame_id", data=np.bytes_(b"velodyne")
            )
            ds.attrs["type"] = [b"str"]
            ds.attrs["key_type"] = [b"str"]

            ds = frame.create_dataset("semantic_image", data=img)
            ds.attrs["type"] = [b"ndarray"]
            ds.attrs["key_type"] = [b"str"]

            # Homogeneous primitive list -> single dataset in 3.x.
            ds = frame.create_dataset("pose", data=np.arange(7.0))
            ds.attrs["type"] = [b"list"]
            ds.attrs["key_type"] = [b"str"]

        out = load_hickle(path)
        assert isinstance(out, list) and len(out) == 1
        d = out[0]
        assert d["pcd_frame_id"] == "velodyne"
        assert d["pose"] == list(np.arange(7.0))
        np.testing.assert_array_equal(d["semantic_image"], img)

    def test_v2_class_repr_type_attr(self, tmp_path):
        """Oldest layout writes type as "<type 'list'>" style reprs."""
        path = str(tmp_path / "v2.hkl")
        with h5py.File(path, "w") as f:
            f.attrs["CLASS"] = b"hickle"
            root = f.create_group("data_0")
            root.attrs["type"] = b"<type 'dict'>"
            ds = root.create_dataset("name", data=np.bytes_(b"map"))
            ds.attrs["type"] = b"<type 'str'>"
        assert load_hickle(path) == {"name": "map"}


class TestReplayIngestsHkl:
    def test_replay_dir_picks_up_hkl(self, rng, tmp_path, monkeypatch):
        from test_runtime import small_cfg
        from test_mapping import make_frame
        from vision_semantic_segmentation_tpu.runtime.replay import MappingReplay

        cfg = small_cfg(tmp_path)
        input_dir = tmp_path / "inputs"
        input_dir.mkdir(parents=True, exist_ok=True)

        ros = _install_ros_like_modules(monkeypatch)
        input_list = []
        for i in range(2):
            pts, img, position, quaternion = make_frame(rng, cfg, n=800)
            pose = ros["Pose"](
                ros["Point"](*position.tolist()),
                ros["Quaternion"](*quaternion.tolist()),
            )
            input_list.append({
                "pcd": pts,
                "pcd_frame_id": "world",
                "semantic_image": img,
                "pose": pose,
            })
        dump_hickle(input_list, str(input_dir / "input_list_0.hkl"))
        monkeypatch.undo()

        replay = MappingReplay(cfg)
        results = replay.replay_dir(str(input_dir))
        assert len(results) == 1
        color_map = results[0]
        assert color_map.ndim == 3 and color_map.shape[2] == 3
        assert color_map.any()


class TestSlashKeys:
    def test_dict_keys_with_slashes_roundtrip(self, tmp_path):
        """'/'-bearing keys (e.g. ROS topic names) must not split into
        nested HDF5 groups (writer escapes, reader unescapes)."""
        obj = {"/camera1/image_raw": [1, 2, 3], "plain": "x"}
        path = str(tmp_path / "slash.hkl")
        dump_hickle(obj, path)
        assert load_hickle(path) == obj
