"""ROS-free equivalents of the reference's ROS glue.

Rebuild of `/root/reference/src/utils/utils_ros.py:31-123` without rospy:
  * :func:`create_point_cloud` — labeled point clouds as a structured
    numpy array with the same field layout as the PointCloud2 message
    (x, y, z float32 + packed rgba uint32), vectorized instead of the
    reference's per-point struct loop;
  * :class:`TransformTree` — a minimal TF buffer: register stamped rigid
    transforms between named frames and compose lookups through their
    common root (the subset of tf the pipeline uses).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from ..geometry.transforms import pose_to_matrix


def pack_rgba(rgb: np.ndarray, alpha: int = 255) -> np.ndarray:
    """(N, 3) uint8 colors -> (N,) packed little-endian RGBA uint32.

    Vectorized equivalent of the reference's per-point ``struct.pack``
    loop (ref utils_ros.py:50-52: bytes B,B,B,255 unpacked as one 'I').
    """
    rgb = np.asarray(rgb, dtype=np.uint32)
    a = np.uint32(alpha)
    return rgb[:, 0] | (rgb[:, 1] << 8) | (rgb[:, 2] << 16) | (a << 24)


def unpack_rgba(packed: np.ndarray) -> np.ndarray:
    """(N,) packed uint32 -> (N, 4) uint8 r, g, b, a."""
    packed = np.asarray(packed, dtype=np.uint32)
    return np.stack(
        [packed & 0xFF, (packed >> 8) & 0xFF, (packed >> 16) & 0xFF, (packed >> 24) & 0xFF],
        axis=1,
    ).astype(np.uint8)


def create_point_cloud(
    xyz: np.ndarray, rgb: Optional[np.ndarray] = None, frame_id: str = "world"
) -> Dict[str, object]:
    """Build a PointCloud2-shaped record (ref utils_ros.py:31-59).

    Returns a dict with 'frame_id', 'fields' and a structured 'data'
    array — the wire layout a downstream ROS bridge would serialize.
    """
    xyz = np.asarray(xyz, dtype=np.float32)
    assert xyz.ndim == 2 and xyz.shape[1] == 3, "xyz must be (N, 3)"
    if rgb is None:
        dtype = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
        data = np.empty(xyz.shape[0], dtype=dtype)
        data["x"], data["y"], data["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        fields = ["x", "y", "z"]
    else:
        dtype = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("rgba", "<u4")])
        data = np.empty(xyz.shape[0], dtype=dtype)
        data["x"], data["y"], data["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        data["rgba"] = pack_rgba(np.asarray(rgb)[:, :3])
        fields = ["x", "y", "z", "rgba"]
    return {"frame_id": frame_id, "fields": fields, "data": data}


@dataclasses.dataclass
class StampedTransform:
    parent: str
    child: str
    T: np.ndarray  # parent_from_child
    stamp: float = 0.0


class TransformTree:
    """Tiny TF buffer: frame graph of rigid transforms with composition.

    Covers the reference's usage: ``set_map_pose`` broadcasts a transform
    (ref utils_ros.py:62-75), ``get_transformation`` looks one up and
    composes (ref :77-102).
    """

    def __init__(self):
        self._edges: Dict[str, StampedTransform] = {}  # child -> edge

    def set_transform(self, parent: str, child: str, T: np.ndarray, stamp: float = 0.0):
        self._edges[child] = StampedTransform(parent, child, np.asarray(T, float), stamp)

    def set_pose(self, pose_position, pose_quaternion, parent: str, child: str, stamp: float = 0.0):
        """ROS-pose flavored setter (the set_map_pose shape)."""
        T = np.asarray(
            pose_to_matrix(
                np.asarray(pose_position, np.float64),
                np.asarray(pose_quaternion, np.float64),
            ),
            dtype=np.float64,
        )
        self.set_transform(parent, child, T, stamp)

    def _path_to_root(self, frame: str):
        path = []
        while frame in self._edges:
            edge = self._edges[frame]
            path.append(edge)
            frame = edge.parent
        return frame, path

    def lookup(self, frame_to: str, frame_from: str) -> np.ndarray:
        """T such that p_to = T @ p_from (tf lookupTransform order)."""
        root_a, path_a = self._path_to_root(frame_from)
        root_b, path_b = self._path_to_root(frame_to)
        if root_a != root_b:
            raise LookupError(
                f"frames {frame_from!r} and {frame_to!r} are not connected"
            )
        T_root_from = np.eye(4)
        for edge in reversed(path_a):
            T_root_from = T_root_from @ edge.T
        T_root_to = np.eye(4)
        for edge in reversed(path_b):
            T_root_to = T_root_to @ edge.T
        # float64 host-side rigid inverse (jnp would downcast to float32)
        R, t = T_root_to[:3, :3], T_root_to[:3, 3:4]
        T_to_root = np.eye(4)
        T_to_root[:3, :3] = R.T
        T_to_root[:3, 3:4] = -R.T @ t
        return T_to_root @ T_root_from

    def get_transformation(self, frame_from: str, frame_to: str):
        """(T, translation, quaternion-less) lookup mirroring ref :77-102."""
        try:
            T = self.lookup(frame_to, frame_from)
        except LookupError:
            return None, None
        return T, T[:3, 3].copy()


def get_normal_from_pose(position, quaternion_xyzw) -> "np.ndarray":
    """Unit z-axis of a pose's orientation, as a (3, 1) normal.

    Rebuild of ref utils_ros.py:113-123 (which pulled the frame's UnitZ
    via tf_conversions): the rotation matrix's third column IS that axis.
    Used to derive a ground-plane normal from a vehicle pose.
    """
    import jax.numpy as jnp

    from ..geometry.transforms import quaternion_matrix

    T = quaternion_matrix(jnp.asarray(quaternion_xyzw))
    return np.asarray(T)[0:3, 2:3]
