"""Rosbag (v2.0) reader/writer + playback adapter tests.

Pins the bag container parsing, the per-type deserializers, the bus
playback adapter (ref scripts/launch/camera1_mapping.launch:6-15 dataflow),
and the TF-driven dynamic camera extrinsics path (ref mapping.py:142-163,
528-541).
"""
import bz2
import struct

import numpy as np
import pytest

from vision_semantic_segmentation_tpu.runtime.rosbag import (
    BagMessage,
    CompressedImageMsg,
    Header,
    ImageMsg,
    PointCloud2Msg,
    PointField,
    PoseStampedMsg,
    RosbagReader,
    TFMessageMsg,
    TransformStampedMsg,
    write_bag,
)


def _pc2(stamp, frame_id, pts):
    """(4, N) xyzi -> PointCloud2Msg with x,y,z,intensity float32 fields."""
    pts = np.asarray(pts, np.float32)
    n = pts.shape[1]
    data = np.ascontiguousarray(pts.T).tobytes()
    fields = [
        PointField("x", 0, 7, 1),
        PointField("y", 4, 7, 1),
        PointField("z", 8, 7, 1),
        PointField("intensity", 12, 7, 1),
    ]
    return PointCloud2Msg(Header(0, stamp, frame_id), 1, n, fields, 16, data)


def _make_bag(path, rng, n_frames=3):
    msgs = []
    pts = rng.random((4, 40)).astype(np.float32)
    for i in range(n_frames):
        stamp = 10.0 + i
        img = (rng.random((8, 12, 3)) * 255).astype(np.uint8)
        msgs.append(("/reduced_map", _pc2(stamp, "/world", pts), stamp))
        msgs.append((
            "/current_pose",
            PoseStampedMsg(
                Header(i, stamp, "/world"),
                np.array([1.0 * i, 2.0, 0.0]),
                np.array([0.0, 0.0, 0.0, 1.0]),
            ),
            stamp,
        ))
        msgs.append((
            "/camera1/image_raw",
            ImageMsg(Header(i, stamp, "camera1"), 8, 12, "rgb8", img),
            stamp,
        ))
    msgs.append((
        "/tf",
        TFMessageMsg([
            TransformStampedMsg(
                Header(0, 10.0, "/base_link"), "/camera1",
                np.array([1.0, 0.0, 1.5]), np.array([0.0, 0.0, 0.0, 1.0]),
            )
        ]),
        10.0,
    ))
    write_bag(str(path), msgs)
    return msgs, pts


class TestReaderWriter:
    def test_roundtrip(self, rng, tmp_path):
        path = tmp_path / "seq.bag"
        msgs, pts = _make_bag(path, rng)
        out = list(RosbagReader(str(path)).read_messages())
        assert len(out) == len(msgs)
        images = [m for m in out if m.type == "sensor_msgs/Image"]
        clouds = [m for m in out if m.type == "sensor_msgs/PointCloud2"]
        poses = [m for m in out if m.type == "geometry_msgs/PoseStamped"]
        tfs = [m for m in out if m.type == "tf2_msgs/TFMessage"]
        assert len(images) == 3 and len(clouds) == 3 and len(poses) == 3 and len(tfs) == 1
        np.testing.assert_allclose(clouds[0].message.xyzi(), pts, rtol=1e-6)
        np.testing.assert_array_equal(
            images[1].message.rgb(), msgs[5][1].data
        )
        assert poses[2].message.position[0] == 2.0
        assert tfs[0].message.transforms[0].child_frame_id == "/camera1"
        assert images[0].message.header.frame_id == "camera1"
        assert abs(images[0].message.header.stamp - 10.0) < 1e-6

    def test_topic_filter(self, rng, tmp_path):
        path = tmp_path / "seq.bag"
        _make_bag(path, rng)
        out = list(RosbagReader(str(path)).read_messages(topics=["/current_pose"]))
        assert len(out) == 3
        assert all(m.topic == "/current_pose" for m in out)

    def test_bz2_chunk(self, rng, tmp_path):
        """Reader must handle bz2-compressed chunks (rosbag default -j)."""
        path = tmp_path / "plain.bag"
        _make_bag(path, rng)
        raw = path.read_bytes()
        # recompress: find the chunk record and bz2 it
        magic_end = raw.index(b"\n") + 1
        off = magic_end
        out = raw[:magic_end]
        u32 = struct.Struct("<I")
        while off < len(raw):
            (hlen,) = u32.unpack_from(raw, off)
            header = raw[off + 4 : off + 4 + hlen]
            (dlen,) = u32.unpack_from(raw, off + 4 + hlen)
            data = raw[off + 8 + hlen : off + 8 + hlen + dlen]
            if b"compression=none" in header:
                cdata = bz2.compress(data)
                fix = b""
                hoff = 0
                while hoff < len(header):
                    (n,) = u32.unpack_from(header, hoff)
                    field = header[hoff + 4 : hoff + 4 + n]
                    if field.startswith(b"compression="):
                        field = b"compression=bz2"
                    fix += u32.pack(len(field)) + field
                    hoff += 4 + n
                out += u32.pack(len(fix)) + fix + u32.pack(len(cdata)) + cdata
            else:
                out += raw[off : off + 8 + hlen + dlen]
            off += 8 + hlen + dlen
        bz_path = tmp_path / "bz2.bag"
        bz_path.write_bytes(out)
        msgs = list(RosbagReader(str(bz_path)).read_messages())
        assert len(msgs) == 10

    def test_rejects_non_bag(self, tmp_path):
        p = tmp_path / "x.bag"
        p.write_bytes(b"not a bag")
        with pytest.raises(ValueError):
            RosbagReader(str(p))


class TestBagAdapter:
    def test_play_bag_publishes_typed_messages(self, rng, tmp_path):
        from vision_semantic_segmentation_tpu.runtime.bag_adapter import play_bag
        from vision_semantic_segmentation_tpu.runtime.bus import TopicBus
        from vision_semantic_segmentation_tpu.utils.ros_compat import TransformTree

        path = tmp_path / "seq.bag"
        _make_bag(path, rng)
        bus = TopicBus()
        got = {"img": [], "pcd": [], "pose": []}
        bus.subscribe("/camera1/image_raw", lambda m: got["img"].append(m))
        bus.subscribe("/reduced_map", lambda m: got["pcd"].append(m))
        bus.subscribe("/current_pose", lambda m: got["pose"].append(m))
        tree = TransformTree()

        n = play_bag(str(path), bus, tf_tree=tree)
        assert n == 10
        assert len(got["img"]) == 3 and len(got["pcd"]) == 3 and len(got["pose"]) == 3
        assert got["img"][0].data.shape == (8, 12, 3)
        assert got["img"][0].frame_id == "camera1"
        assert got["pcd"][0].data.shape[0] == 4
        position, quaternion = got["pose"][1].data
        assert position[0] == 1.0
        # TF folded into the tree: camera1 -> base_link available
        T = tree.lookup("base_link", "camera1")
        np.testing.assert_allclose(T[:3, 3], [1.0, 0.0, 1.5])

    def test_avt_topic_renames(self, rng, tmp_path):
        """The launch-file republisher mapping is applied by default
        (ref camera1_mapping.launch:13-15)."""
        from vision_semantic_segmentation_tpu.runtime.bag_adapter import play_bag
        from vision_semantic_segmentation_tpu.runtime.bus import TopicBus

        img = (rng.random((6, 6, 3)) * 255).astype(np.uint8)
        path = tmp_path / "avt.bag"
        write_bag(
            str(path),
            [(
                "/avt_cameras/camera1/image_color",
                ImageMsg(Header(0, 5.0, "camera1"), 6, 6, "rgb8", img),
                5.0,
            )],
        )
        bus = TopicBus()
        got = []
        bus.subscribe("/camera1/image_raw", lambda m: got.append(m))
        play_bag(str(path), bus)
        assert len(got) == 1
        np.testing.assert_array_equal(got[0].data, img)

    def test_bag_to_frames_sync(self, rng, tmp_path):
        from vision_semantic_segmentation_tpu.runtime.bag_adapter import bag_to_frames

        path = tmp_path / "seq.bag"
        _make_bag(path, rng)
        frames = bag_to_frames(str(path))
        assert len(frames) == 3
        assert frames[0].pcd.shape[0] == 4
        # EVERY frame must pair with ITS OWN stamp's pose — hardware-synced
        # (exactly equal) stamps are the common recorded case, and the
        # node's reference queue-walk falls through to the newest entry on
        # ties, which would pair frame 0 with pose 2 here
        assert frames[0].position[0] == 0.0
        assert frames[1].position[0] == 1.0
        assert frames[2].position[0] == 2.0
        assert frames[0].pcd_frame_id == "world"
        assert frames[0].camera == "camera1"

    def test_bag_to_frames_nearest_on_offset_stamps(self, rng, tmp_path):
        """Poses offset from image stamps: nearest wins, not newest."""
        from vision_semantic_segmentation_tpu.runtime.bag_adapter import bag_to_frames

        img = (rng.random((4, 4, 3)) * 255).astype(np.uint8)
        pts = rng.random((4, 8)).astype(np.float32)
        msgs = []
        for i, s in enumerate([10.0, 20.0, 30.0]):
            msgs.append(("/current_pose", PoseStampedMsg(
                Header(i, s, "/world"), np.array([float(i), 0, 0]),
                np.array([0, 0, 0, 1.0])), s))
        msgs.append(("/reduced_map", _pc2(19.0, "/world", pts), 19.0))
        msgs.append(("/camera1/image_raw", ImageMsg(
            Header(0, 19.0, "camera1"), 4, 4, "rgb8", img), 19.0))
        write_bag(str(tmp_path / "o.bag"), msgs)
        frames = bag_to_frames(str(tmp_path / "o.bag"))
        assert len(frames) == 1
        assert frames[0].position[0] == 1.0  # pose at 20.0 is nearest to 19.0

    def test_duplicate_image_variants_collapse(self, rng, tmp_path):
        """raw + compressed variants of one stream must not double frames."""
        import cv2

        from vision_semantic_segmentation_tpu.runtime.bag_adapter import (
            bag_to_frames,
            play_bag,
        )
        from vision_semantic_segmentation_tpu.runtime.bus import TopicBus
        from vision_semantic_segmentation_tpu.runtime.rosbag import (
            CompressedImageMsg,
        )

        img = np.full((4, 4, 3), 128, np.uint8)
        ok, enc = cv2.imencode(".png", img)
        assert ok
        pts = rng.random((4, 8)).astype(np.float32)
        msgs = [
            ("/reduced_map", _pc2(10.0, "/world", pts), 10.0),
            ("/current_pose", PoseStampedMsg(
                Header(0, 10.0, "/world"), np.zeros(3),
                np.array([0, 0, 0, 1.0])), 10.0),
            ("/avt_cameras/camera1/image_color", ImageMsg(
                Header(0, 10.0, "camera1"), 4, 4, "rgb8", img), 10.0),
        ]
        # also record the compressed variant of the same frame
        msgs.append((
            "/avt_cameras/camera1/image_color/compressed",
            CompressedImageMsg(Header(0, 10.0, "camera1"), "png", enc.tobytes()),
            10.0,
        ))
        path = str(tmp_path / "dup.bag")
        # CompressedImageMsg has no serializer; write raw twice under the
        # two topic names instead (same dedupe path)
        msgs[-1] = (
            "/avt_cameras/camera1/image_color/compressed",
            ImageMsg(Header(0, 10.0, "camera1"), 4, 4, "rgb8", img),
            10.0,
        )
        write_bag(path, msgs)

        bus = TopicBus()
        got = []
        bus.subscribe("/camera1/image_raw", lambda m: got.append(m))
        play_bag(path, bus)
        assert len(got) == 1

        frames = bag_to_frames(path)
        assert len(frames) == 1


class TestTFExtrinsics:
    def test_node_registers_tf_camera(self, rng, tmp_path):
        """A TF-carried camera1 -> base_link calibration overrides the
        hardcoded extrinsics before the first fuse (ref mapping.py:142-163)."""
        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.mapping.engine import (
            SemanticMappingEngine,
        )
        from vision_semantic_segmentation_tpu.runtime.bus import TopicBus
        from vision_semantic_segmentation_tpu.runtime.node import MappingNode
        from vision_semantic_segmentation_tpu.utils.ros_compat import TransformTree
        from vision_semantic_segmentation_tpu.geometry.camera import get_camera

        cfg = small_cfg(tmp_path)
        bus = TopicBus()
        tree = TransformTree()
        engine = SemanticMappingEngine(cfg)
        node = MappingNode(cfg, bus, engine=engine, tf_tree=tree)

        # broadcast a camera1 calibration that matches the built-in one:
        # T_cam_to_base = T_velodyne_to_baselink @ T_cam_to_velodyne
        builtin = get_camera("camera1")
        T_cam_to_velo = np.linalg.inv(np.asarray(builtin.T, np.float64))
        T_cam_to_base = engine.T_velodyne_to_baselink @ T_cam_to_velo
        bus.publish(
            "/tf",
            TFMessageMsg([
                TransformStampedMsg(
                    Header(0, 1.0, "base_link"), "camera1",
                    T_cam_to_base[:3, 3].copy(),
                    _mat_to_quat(T_cam_to_base[:3, :3]),
                )
            ]),
        )
        node._maybe_register_tf_camera("camera1")
        assert "camera1" in node._tf_cameras_registered
        cam = engine.cameras["camera1"]
        # tolerance: the calibration round-trips through a quaternion
        np.testing.assert_allclose(cam.P, builtin.P, rtol=1e-5, atol=1e-3)

    def test_unknown_tf_keeps_builtin(self, tmp_path):
        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.mapping.engine import (
            SemanticMappingEngine,
        )
        from vision_semantic_segmentation_tpu.runtime.bus import TopicBus
        from vision_semantic_segmentation_tpu.runtime.node import MappingNode
        from vision_semantic_segmentation_tpu.utils.ros_compat import TransformTree
        from vision_semantic_segmentation_tpu.geometry.camera import get_camera

        cfg = small_cfg(tmp_path)
        engine = SemanticMappingEngine(cfg)
        node = MappingNode(cfg, TopicBus(), engine=engine, tf_tree=TransformTree())
        node._maybe_register_tf_camera("camera1")
        np.testing.assert_allclose(
            engine.cameras["camera1"].P, get_camera("camera1").P
        )


def _mat_to_quat(R):
    """Rotation matrix -> quaternion (x, y, z, w)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([
            (R[2, 1] - R[1, 2]) / s,
            (R[0, 2] - R[2, 0]) / s,
            (R[1, 0] - R[0, 1]) / s,
            0.25 * s,
        ])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    q[3] = (R[k, j] - R[j, k]) / s
    return q


class TestTFRegistrationRetry:
    def test_late_tf_broadcast_still_registers(self, tmp_path):
        """A failed lookup must NOT permanently disable TF extrinsics:
        the calibration may arrive after the first (dropped) frame."""
        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.mapping.engine import (
            SemanticMappingEngine,
        )
        from vision_semantic_segmentation_tpu.runtime.bus import TopicBus
        from vision_semantic_segmentation_tpu.runtime.node import MappingNode
        from vision_semantic_segmentation_tpu.utils.ros_compat import TransformTree

        cfg = small_cfg(tmp_path)
        engine = SemanticMappingEngine(cfg)
        tree = TransformTree()
        node = MappingNode(cfg, TopicBus(), engine=engine, tf_tree=tree)

        node._maybe_register_tf_camera("camera1")   # no TF yet -> retry later
        assert "camera1" not in node._tf_cameras_registered

        tree.set_pose(
            np.array([1.0, 0.0, 1.5]), np.array([0.0, 0.0, 0.0, 1.0]),
            parent="base_link", child="camera1",
        )
        node._maybe_register_tf_camera("camera1")
        assert "camera1" in node._tf_cameras_registered


class TestMalformedPayloads:
    def test_truncated_pointcloud_raises(self):
        from vision_semantic_segmentation_tpu.runtime.rosbag import (
            PointCloud2Msg,
            PointField,
            Header,
        )

        fields = [PointField(n, o, 7, 1) for n, o in
                  [("x", 0), ("y", 4), ("z", 8), ("intensity", 12)]]
        msg = PointCloud2Msg(Header(0, 1.0, "w"), 1, 100, fields, 16, b"\x00" * 64)
        with pytest.raises(ValueError, match="truncated"):
            msg.xyzi()

    def test_out_of_bounds_field_offset_raises(self):
        from vision_semantic_segmentation_tpu.runtime.rosbag import (
            PointCloud2Msg,
            PointField,
            Header,
        )

        fields = [PointField("x", 0, 7, 1), PointField("y", 4, 7, 1),
                  PointField("z", 8, 7, 1), PointField("intensity", 14, 7, 1)]
        msg = PointCloud2Msg(Header(0, 1.0, "w"), 1, 4, fields, 16, b"\x00" * 64)
        with pytest.raises(ValueError, match="offset"):
            msg.xyzi()

    def test_avt_image_topic_export_camera_name(self, rng, tmp_path):
        """bag_to_frames with the raw AVT topic must still tag camera1."""
        from vision_semantic_segmentation_tpu.runtime.bag_adapter import bag_to_frames

        img = (rng.random((4, 4, 3)) * 255).astype(np.uint8)
        pts = rng.random((4, 8)).astype(np.float32)
        msgs = [
            ("/reduced_map", _pc2(10.0, "/world", pts), 10.0),
            ("/current_pose", PoseStampedMsg(
                Header(0, 10.0, "/world"), np.zeros(3),
                np.array([0, 0, 0, 1.0])), 10.0),
            ("/avt_cameras/camera1/image_color", ImageMsg(
                Header(0, 10.0, "camera1"), 4, 4, "rgb8", img), 10.0),
        ]
        path = str(tmp_path / "avt2.bag")
        write_bag(path, msgs)
        frames = bag_to_frames(
            path, image_topic="/avt_cameras/camera1/image_color"
        )
        assert len(frames) == 1
        assert frames[0].camera == "camera1"


class TestCompressedImageRoundtrip:
    def test_write_read_lossless_png(self, rng, tmp_path):
        """CompressedImage serializes through write_bag and decodes back
        (the recording format real camera bags use; the streaming decoder
        overlaps its cv2.imdecode with device compute)."""
        import cv2

        img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
        ok, enc = cv2.imencode(".png", img[:, :, ::-1])
        assert ok
        msg = CompressedImageMsg(Header(0, 1.5, "camera1"), "png", enc.tobytes())
        path = str(tmp_path / "c.bag")
        write_bag(path, [("/camera1/image_raw", msg, 1.5)])
        recs = list(RosbagReader(path).read_messages())
        assert len(recs) == 1
        assert recs[0].type == "sensor_msgs/CompressedImage"
        np.testing.assert_array_equal(recs[0].message.rgb(), img)
