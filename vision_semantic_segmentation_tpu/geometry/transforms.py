"""Projective / SE(3) transform primitives.

JAX-native, batched equivalents of the reference's numpy helpers
(`/root/reference/src/utils/utils.py:68-162,222-227`) plus the small set of
ROS ``tf`` conveniences the pipeline relies on (``euler_matrix``,
pose -> 4x4, ref mapping.py:165-170 and utils_ros.py:104-127).

Convention: points are column stacks of shape ``(D, N)`` to match the
reference's math; every function is pure and jit-compatible.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def mm(a: Array, b: Array) -> Array:
    """float32-exact matmul.

    On TPU, ``@`` on float32 inputs runs the MXU at bfloat16 precision by
    default — fine for conv nets, fatal for projective geometry where a
    0.4%% error is many pixels.  Geometry matmuls are tiny, so always run
    them at HIGHEST precision (fp32 accumulation, 6-pass bf16).
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def homogenize(x: Array) -> Array:
    """(D, N) -> (D+1, N) by appending a row of ones (ref utils.py:68-70)."""
    return jnp.concatenate([x, jnp.ones((1, x.shape[1]), dtype=x.dtype)], axis=0)


def dehomogenize(x: Array) -> Array:
    """(D+1, N) -> (D, N) by dividing by the last row (ref utils.py:73-75)."""
    return x[:-1] / x[-1]


def skew(w: Array) -> Array:
    """3-vector -> 3x3 skew-symmetric matrix (ref utils.py:100-108)."""
    w = jnp.reshape(w, (3,))
    # result_type canonicalizes host float64 inputs to the default float
    # (avoids the x64-truncation UserWarning an explicit f64 request emits)
    zero = jnp.zeros((), dtype=jnp.result_type(w))
    return jnp.stack(
        [
            jnp.stack([zero, -w[2], w[1]]),
            jnp.stack([w[2], zero, -w[0]]),
            jnp.stack([-w[1], w[0], zero]),
        ]
    )


def de_skew(w_skew: Array) -> Array:
    """3x3 skew-symmetric matrix -> (3, 1) vector (ref utils.py:111-113)."""
    return jnp.array([[-w_skew[1, 2]], [w_skew[0, 2]], [-w_skew[0, 1]]])


def sinc(x: Array) -> Array:
    """sin(x)/x with sinc(0) = 1 (unnormalized; ref utils.py:82-90)."""
    return jnp.sinc(x / jnp.pi)


def deparameterize_rotation(w: Array) -> Array:
    """Axis-angle (3,) -> rotation matrix via Rodrigues (ref utils.py:150-162)."""
    w = jnp.reshape(w, (3, 1))
    theta = jnp.linalg.norm(w)
    w_skew = skew(w)
    eye = jnp.eye(3, dtype=jnp.result_type(w))
    # Taylor-safe coefficients: sinc(theta) and (1-cos)/theta^2
    small = theta < 1e-7
    k1 = jnp.where(small, 1.0, sinc(theta))
    theta_sq = jnp.where(small, 1.0, theta**2)
    k2 = jnp.where(small, 0.5, (1.0 - jnp.cos(theta)) / theta_sq)
    R_general = jnp.cos(theta) * eye + k1 * w_skew + k2 * (w @ w.T)
    R_small = eye + w_skew
    return jnp.where(small, R_small, R_general)


def parameterize_rotation(R: np.ndarray) -> Tuple[np.ndarray, float]:
    """Rotation matrix -> (axis-angle (3,1), angle). Host-side (SVD).

    Mirrors ref utils.py:124-147 including the singularity normalization at
    theta = pi and the small-angle fallback.
    """
    R = np.asarray(R, dtype=np.float64)
    _, _, VT = np.linalg.svd(R - np.eye(3))
    v = VT.T[:, -1:]
    v_hat = np.array([[R[2, 1] - R[1, 2]], [R[0, 2] - R[2, 0]], [R[1, 0] - R[0, 1]]])
    theta_sin = float((v.T @ v_hat).item()) / 2.0
    theta_cos = (np.trace(R) - 1.0) / 2.0
    theta = float(np.arctan2(theta_sin, theta_cos))
    w = theta * v / np.linalg.norm(v)

    # singularity at 2*pi (ref utils.py:116-121)
    norm_w = np.linalg.norm(w)
    if norm_w > np.pi:
        w = (1 - 2 * np.pi / norm_w * np.ceil((norm_w - np.pi) / (2 * np.pi))) * w
    theta = np.linalg.norm(w)
    if theta < 1e-7:
        w = v_hat / 2.0
        theta = np.linalg.norm(w)
    return w, float(theta)


def rotation_2d(angle: Array) -> Array:
    """2D rotation matrix (ref utils.py:222-227)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array([[c, -s], [s, c]])


def differentiate_sinc(x: Array) -> Array:
    """d/dx sinc(x), with the removable singularity at 0 (ref utils.py:93-97)."""
    x = jnp.asarray(x)
    safe = jnp.where(x == 0, 1.0, x)
    return jnp.where(x == 0, 0.0, jnp.cos(safe) / safe - jnp.sin(safe) / safe**2)


def singularity_normalization(w: np.ndarray) -> np.ndarray:
    """Wrap an axis-angle vector into |w| <= pi (ref utils.py:116-121).

    The axis-angle chart has a singularity at 2*pi; re-normalize whenever
    w changes (host-side, like the reference).
    """
    w = np.asarray(w, dtype=np.float64)
    theta = np.linalg.norm(w)
    if theta > np.pi:
        w = (1 - 2 * np.pi / theta * np.ceil((theta - np.pi) / (2 * np.pi))) * w
    return w


def jacobian_vector_norm(v: Array) -> Array:
    """d|v|/dv as a row vector, for a column vector v (ref utils.py:165-168)."""
    v = jnp.asarray(v)
    assert v.ndim == 2 and v.shape[1] == 1, "column vector expected"
    return v.T / jnp.linalg.norm(v)


def right_null(A: np.ndarray, tol: float = 1e-5):
    """Right null-space vector of A, or None when it does not exist
    (ref utils.py:171-177; host-side SVD diagnostic)."""
    A = np.asarray(A, dtype=np.float64)
    _, S, VT = np.linalg.svd(A)
    if S[-1] < tol:
        return VT.T[:, -1:]
    return None


def euler_matrix(ai: float, aj: float, ak: float) -> np.ndarray:
    """4x4 homogeneous rotation from static-frame xyz Euler angles.

    Matches ``tf.transformations.euler_matrix(ai, aj, ak, 'sxyz')`` used to
    build the tuned velodyne->baselink extrinsic (ref mapping.py:167):
    extrinsic x-y-z rotations compose as ``Rz(ak) @ Ry(aj) @ Rx(ai)``.
    Host-side (numpy): this is calibration setup, not per-frame math.
    """
    ci, si = np.cos(ai), np.sin(ai)
    cj, sj = np.cos(aj), np.sin(aj)
    ck, sk = np.cos(ak), np.sin(ak)
    Rx = np.array([[1, 0, 0], [0, ci, -si], [0, si, ci]])
    Ry = np.array([[cj, 0, sj], [0, 1, 0], [-sj, 0, cj]])
    Rz = np.array([[ck, -sk, 0], [sk, ck, 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = Rz @ Ry @ Rx
    return T


def quaternion_matrix(q: Array) -> Array:
    """Quaternion (x, y, z, w) -> 4x4 homogeneous rotation (ROS order).

    Equivalent of ``tf.transformations.quaternion_matrix`` used by
    ``get_transform_from_pose`` (ref utils_ros.py:104-127).
    """
    q = jnp.reshape(q, (4,))
    n = jnp.dot(q, q)
    q = q * jnp.sqrt(2.0 / n)
    x, y, z, w = q[0], q[1], q[2], q[3]
    R = jnp.array(
        [
            [1.0 - (y * y + z * z), x * y - z * w, x * z + y * w],
            [x * y + z * w, 1.0 - (x * x + z * z), y * z - x * w],
            [x * z - y * w, y * z + x * w, 1.0 - (x * x + y * y)],
        ]
    )
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    return T


def pose_to_matrix(position: Array, orientation_xyzw: Array) -> Array:
    """ROS Pose (position, quaternion) -> 4x4 ``T_base_to_origin``.

    Equivalent of ``get_transform_from_pose`` (ref utils_ros.py:104-127).
    """
    T = quaternion_matrix(orientation_xyzw)
    return T.at[:3, 3].set(jnp.reshape(position, (3,)))


def se3_inverse(T: Array) -> Array:
    """Closed-form inverse of a rigid 4x4 transform."""
    R = T[:3, :3]
    t = T[:3, 3:4]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3:4].set(-mm(R.T, t))
    return Ti


def transform_points(T: Array, points: Array) -> Array:
    """Apply a 4x4 transform to (3, N) points -> (3, N)."""
    return mm(T[:3, :3], points) + T[:3, 3:4]
