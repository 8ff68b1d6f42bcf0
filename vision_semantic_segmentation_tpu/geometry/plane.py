"""3D plane: ax + by + cz + d = 0.

JAX-friendly rebuild of `/root/reference/src/plane_3d.py:18-160`.  The plane
is a frozen dataclass of python floats (static under jit); the vectorized
ray-intersection used in the homography BEV path is a pure function.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Plane3D:
    a: float = 0.0
    b: float = 0.0
    c: float = 0.0
    d: float = 0.0

    def __post_init__(self):
        s = math.sqrt(self.a**2 + self.b**2 + self.c**2)
        if s == 0:
            raise ValueError("Degenerate plane: a = b = c = 0")
        if self.c < 0:
            s = -s
        object.__setattr__(self, "a", self.a / s)
        object.__setattr__(self, "b", self.b / s)
        object.__setattr__(self, "c", self.c / s)
        object.__setattr__(self, "d", self.d / s)

    @property
    def normal(self) -> np.ndarray:
        return np.array([[self.a], [self.b], [self.c]])

    @property
    def param(self) -> np.ndarray:
        return np.array([[self.a], [self.b], [self.c], [self.d]])

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_list(cls, p) -> "Plane3D":
        return cls(float(p[0]), float(p[1]), float(p[2]), float(p[3]))

    @classmethod
    def fit_minimal(cls, pts: np.ndarray) -> "Plane3D":
        """Exact plane through 3 points (rows) — ref plane_3d.py:45-54."""
        pts = np.asarray(pts, dtype=np.float64)
        assert pts.shape == (3, 3), "minimal fit needs exactly 3 points"
        v1 = pts[0] - pts[1]
        v2 = pts[2] - pts[1]
        n = np.cross(v1, v2)
        if np.allclose(n, 0):
            raise ValueError("Collinear points, plane underdetermined")
        d = -float(n @ pts[1])
        return cls(float(n[0]), float(n[1]), float(n[2]), d)

    @classmethod
    def from_vectors_and_point(cls, vec1, vec2, pt1) -> "Plane3D":
        """Plane containing pt1 spanned by vec1/vec2 (ref plane_3d.py:32-42)."""
        vec1 = np.asarray(vec1, dtype=np.float64).reshape(3)
        vec2 = np.asarray(vec2, dtype=np.float64).reshape(3)
        pt1 = np.asarray(pt1, dtype=np.float64).reshape(3)
        pt2 = vec1 / np.linalg.norm(vec1) + pt1
        pt3 = vec2 / np.linalg.norm(vec2) + pt1
        return cls.fit_minimal(np.vstack([pt1, pt2, pt3]))

    # -- queries (jit-compatible) -------------------------------------------
    def distance(self, points: Array) -> Array:
        """Unsigned distances for (N, 3) points (ref plane_3d.py:82-88)."""
        return jnp.abs(self.distance_signed(points))

    def distance_signed(self, points: Array) -> Array:
        """Signed distances for (N, 3) points (ref plane_3d.py:90-96)."""
        n = jnp.asarray([self.a, self.b, self.c])
        return points @ n + self.d

    def ray_intersection(self, d: Array, C: Array) -> Array:
        """Intersect rays with the plane (ref plane_3d.py:150-154).

        Args:
            d: (3, N) ray directions
            C: (3, 1) common ray origin
        Returns:
            (3, N) intersection points.
        """
        n = jnp.asarray([[self.a, self.b, self.c]])
        k = (-self.d - (n @ C)[0, 0]) / (n @ d)
        return k * d + C

    def normal_angle_to_vector(self, vector: Array) -> Array:
        """Angle between the plane normal and a vector (ref plane_3d.py:118-129)."""
        v = jnp.reshape(vector, (3,))
        v = v / jnp.linalg.norm(v)
        n = jnp.asarray([self.a, self.b, self.c])
        return jnp.arccos(jnp.clip(v @ n, -1.0, 1.0))

    def rotated_around_y(self, angle: float) -> "Plane3D":
        """New plane with the normal pitched around y (ref plane_3d.py:109-116)."""
        norm = math.sqrt(self.a**2 + self.c**2)
        theta = math.atan2(self.c, self.a) + angle
        return Plane3D(math.cos(theta) * norm, self.b, math.sin(theta) * norm, self.d)


def ground_plane() -> Plane3D:
    """z = 0 ground plane."""
    return Plane3D(0.0, 0.0, 1.0, 0.0)


def clip_pcd_by_distance_plane(points: Array, vec1, vec2, pt1, threshold):
    """Split a point cloud by signed distance to a plane (ref utils.py:35-53).

    The plane contains ``pt1`` and is spanned by ``vec1``/``vec2``;
    ``threshold`` is ``(max, min)`` signed distance.  Points are row-major
    (N, 3+) — extra columns (intensity, ...) ride along — vs the
    reference's column-major ``PointCloud.data``.

    Returns:
        (close, far): points with max > distance > min, and the rest.
    """
    points = jnp.asarray(points)
    plane = Plane3D.from_vectors_and_point(vec1, vec2, pt1)
    d = plane.distance_signed(points[:, :3])
    close = (d < threshold[0]) & (d > threshold[1])
    return points[close], points[~close]
