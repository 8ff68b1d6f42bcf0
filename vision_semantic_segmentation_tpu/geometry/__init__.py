from .transforms import (
    de_skew,
    dehomogenize,
    deparameterize_rotation,
    euler_matrix,
    homogenize,
    parameterize_rotation,
    pose_to_matrix,
    quaternion_matrix,
    rotation_2d,
    se3_inverse,
    sinc,
    skew,
    transform_points,
)
from .camera import Camera, camera_setup_1, camera_setup_6, get_camera
from .plane import Plane3D, clip_pcd_by_distance_plane, ground_plane
from .homography import find_homography, generate_homography, warp_perspective
from .bounding_box import BoundingBox

__all__ = [
    "homogenize",
    "dehomogenize",
    "skew",
    "de_skew",
    "sinc",
    "deparameterize_rotation",
    "parameterize_rotation",
    "rotation_2d",
    "euler_matrix",
    "quaternion_matrix",
    "pose_to_matrix",
    "se3_inverse",
    "transform_points",
    "Camera",
    "camera_setup_1",
    "camera_setup_6",
    "get_camera",
    "Plane3D",
    "clip_pcd_by_distance_plane",
    "ground_plane",
    "find_homography",
    "generate_homography",
    "warp_perspective",
    "BoundingBox",
]
