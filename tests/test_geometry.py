"""Geometry library tests: golden values + cross-checks against cv2/scipy."""
import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from vision_semantic_segmentation_tpu.geometry import (
    Camera,
    Plane3D,
    camera_setup_1,
    camera_setup_6,
    dehomogenize,
    deparameterize_rotation,
    euler_matrix,
    find_homography,
    generate_homography,
    homogenize,
    parameterize_rotation,
    pose_to_matrix,
    quaternion_matrix,
    rotation_2d,
    se3_inverse,
    skew,
    transform_points,
    warp_perspective,
)


def test_homogenize_roundtrip(rng):
    x = rng.standard_normal((3, 10))
    xh = homogenize(jnp.asarray(x))
    assert xh.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(dehomogenize(xh)), x, rtol=1e-6)


def test_skew_antisymmetric(rng):
    w = rng.standard_normal(3)
    S = np.asarray(skew(jnp.asarray(w)))
    np.testing.assert_allclose(S, -S.T, atol=1e-7)
    v = rng.standard_normal(3)
    np.testing.assert_allclose(S @ v, np.cross(w, v), rtol=1e-5, atol=1e-6)


def test_rotation_param_roundtrip(rng):
    from scipy.spatial.transform import Rotation

    for _ in range(5):
        R = Rotation.random(random_state=rng.integers(1 << 30)).as_matrix()
        w, theta = parameterize_rotation(R)
        R2 = np.asarray(deparameterize_rotation(jnp.asarray(w)))
        np.testing.assert_allclose(R2, R, atol=1e-5)
        assert 0 <= theta <= np.pi + 1e-9


def test_euler_matrix_matches_scipy():
    from scipy.spatial.transform import Rotation

    ai, aj, ak = 0.1, 0.14, -0.3
    T = euler_matrix(ai, aj, ak)
    # static xyz == scipy extrinsic 'xyz'
    R = Rotation.from_euler("xyz", [ai, aj, ak]).as_matrix()
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-12)
    assert T[3, 3] == 1.0


def test_velodyne_extrinsic_golden():
    """The tuned velodyne->baselink transform (ref mapping.py:165-170)."""
    T = euler_matrix(0.0, 0.140, 0.0)
    T[0:3, 3] = [2.64, 0, 1.98]
    np.testing.assert_allclose(T[0, 0], np.cos(0.140), atol=1e-12)
    np.testing.assert_allclose(T[0, 2], np.sin(0.140), atol=1e-12)
    np.testing.assert_allclose(T[:3, 3], [2.64, 0, 1.98])


def test_quaternion_matrix_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    R_scipy = Rotation.from_quat(q).as_matrix()  # scipy uses xyzw too
    T = np.asarray(quaternion_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(T[:3, :3], R_scipy, atol=1e-5)


def test_pose_to_matrix():
    T = np.asarray(pose_to_matrix(jnp.asarray([1.0, 2.0, 3.0]), jnp.asarray([0, 0, 0, 1.0])))
    np.testing.assert_allclose(T, np.array([[1, 0, 0, 1], [0, 1, 0, 2], [0, 0, 1, 3], [0, 0, 0, 1]]), atol=1e-6)


def test_se3_inverse(rng):
    T = euler_matrix(0.3, -0.2, 0.9)
    T[:3, 3] = rng.standard_normal(3)
    Ti = np.asarray(se3_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(Ti @ T, np.eye(4), atol=1e-6)


def test_rotation_2d():
    R = np.asarray(rotation_2d(jnp.asarray(np.pi / 2)))
    np.testing.assert_allclose(R @ np.array([1.0, 0.0]), [0.0, 1.0], atol=1e-6)


# ---------------------------------------------------------------------------
# Camera
# ---------------------------------------------------------------------------
class TestCamera:
    def test_projection_matrix_composition(self):
        cam = camera_setup_1()
        np.testing.assert_allclose(cam.P, cam.K @ np.concatenate([cam.R, cam.t], axis=1))
        # T is a rigid transform
        np.testing.assert_allclose(cam.T[3], [0, 0, 0, 1])
        np.testing.assert_allclose(cam.R @ cam.R.T, np.eye(3), atol=1e-10)

    def test_camera_center_projects_to_null(self):
        """P @ homog(C) = 0: the camera center is the projection null space."""
        for cam in (camera_setup_1(), camera_setup_6()):
            C_h = np.vstack([cam.C_world, [[1.0]]])
            np.testing.assert_allclose(cam.P @ C_h, 0, atol=1e-6)

    def test_project_and_ray_roundtrip(self):
        cam = camera_setup_1()
        pts = jnp.asarray([[500.0, 1000.0], [200.0, 700.0]])
        d, C = cam.pixel_to_ray(pts)
        # points along the ray reproject to the original pixels
        world_pts = jnp.asarray(d) * 10.0 + C
        pix = np.asarray(cam.project(world_pts))
        np.testing.assert_allclose(pix, np.asarray(pts), atol=1e-3)
        # unit norm
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=0), 1.0, atol=1e-6)

    def test_distortion_matches_cv2(self):
        cam = camera_setup_1()
        obj = np.array([[0.1, -0.05, 1.0], [0.02, 0.08, 1.2], [-0.15, 0.1, 0.9]])
        projected_cv, _ = cv2.projectPoints(
            obj, np.zeros(3), np.zeros(3), cam.K, cam.dist
        )
        xy = jnp.asarray((obj[:, :2] / obj[:, 2:3]).T)
        dist_norm = np.asarray(cam.distort_normalized(xy))
        pix = cam.K @ np.vstack([dist_norm, np.ones((1, 3))])
        pix = (pix[:2] / pix[2]).T
        np.testing.assert_allclose(pix, projected_cv.reshape(-1, 2), atol=1e-6)

    def test_undistort_maps_match_cv2(self):
        cam = camera_setup_6()
        # compare our inverse map against cv2.initUndistortRectifyMap
        map1, map2 = cv2.initUndistortRectifyMap(
            cam.K, cam.dist, None, cam.K, cam.im_size, cv2.CV_32FC1
        )
        ours = cam.undistort_maps()
        np.testing.assert_allclose(ours[0], map1, atol=2e-2)
        np.testing.assert_allclose(ours[1], map2, atol=2e-2)


# ---------------------------------------------------------------------------
# Plane
# ---------------------------------------------------------------------------
class TestPlane:
    def test_normalization(self):
        p = Plane3D(0, 0, 2.0, -4.0)
        assert p.c == pytest.approx(1.0)
        assert p.d == pytest.approx(-2.0)

    def test_sign_convention(self):
        p = Plane3D(0, 0, -2.0, 4.0)
        assert p.c == pytest.approx(1.0)  # c forced positive

    def test_fit_minimal(self):
        pts = np.array([[10, 0, 0], [0, 10, 0], [0, 0, 10]], dtype=float)
        p = Plane3D.fit_minimal(pts)
        np.testing.assert_allclose(np.asarray(p.distance(jnp.asarray(pts, dtype=jnp.float32))), 0, atol=1e-4)

    def test_ray_intersection(self):
        p = Plane3D(0, 0, 1, 0)  # ground plane
        d = jnp.asarray([[0.0, 0.5], [0.0, 0.0], [-1.0, -0.5]])
        C = jnp.asarray([[0.0], [0.0], [2.0]])
        hits = np.asarray(p.ray_intersection(d, C))
        np.testing.assert_allclose(hits[2], 0, atol=1e-6)
        np.testing.assert_allclose(hits[0, 1], 2.0, atol=1e-6)  # x = 0.5*t, z hits 0 at t=4

    def test_normal_angle(self):
        p = Plane3D(0, 0, 1, 0)
        ang = float(p.normal_angle_to_vector(jnp.asarray([0.0, 0.0, 1.0])))
        assert ang == pytest.approx(0.0, abs=1e-6)
        ang = float(p.normal_angle_to_vector(jnp.asarray([1.0, 0.0, 0.0])))
        assert ang == pytest.approx(np.pi / 2, abs=1e-6)


# ---------------------------------------------------------------------------
# Homography
# ---------------------------------------------------------------------------
class TestHomography:
    def test_find_homography_matches_cv2(self, rng):
        pts_src = np.array([[141.0, 131], [480, 159], [493, 630], [64, 601]])
        pts_dst = np.array([[318.0, 256], [534, 372], [316, 670], [73, 473]])
        H_cv, _ = cv2.findHomography(pts_src, pts_dst)
        H = find_homography(pts_src, pts_dst)
        np.testing.assert_allclose(H, H_cv, atol=1e-6)

    def test_exact_on_correspondences(self):
        pts_src = np.array([[0.0, 0], [100, 0], [100, 100], [0, 100]])
        pts_dst = np.array([[10.0, 5], [90, 10], [95, 120], [5, 95]])
        H = find_homography(pts_src, pts_dst)
        src_h = np.vstack([pts_src.T, np.ones(4)])
        mapped = H @ src_h
        mapped = (mapped[:2] / mapped[2]).T
        np.testing.assert_allclose(mapped, pts_dst, atol=1e-8)

    def test_warp_matches_cv2_nearest(self, rng):
        img = (rng.random((40, 50)) * 255).astype(np.uint8)
        H = np.array([[1.0, 0.05, 3.0], [-0.02, 0.98, 1.0], [1e-4, 0, 1.0]])
        ours = np.asarray(warp_perspective(jnp.asarray(img), H, (50, 40), mode="nearest"))
        ref = cv2.warpPerspective(img, H, (50, 40), flags=cv2.INTER_NEAREST)
        # Allow small mismatch count from tie-breaking at pixel borders
        mismatch = np.mean(ours != ref)
        assert mismatch < 0.02, f"nearest warp mismatch {mismatch:.4f}"

    def test_warp_matches_cv2_bilinear(self, rng):
        img = (rng.random((64, 48)) * 255).astype(np.float32)
        H = np.array([[0.9, 0.1, 5.0], [0.05, 1.1, -2.0], [0, 1e-4, 1.0]])
        ours = np.asarray(warp_perspective(jnp.asarray(img), H, (48, 64), mode="bilinear"))
        ref = cv2.warpPerspective(img, H, (48, 64), flags=cv2.INTER_LINEAR)
        # interior pixels should match tightly (cv2 uses fixed-point 5-bit weights)
        diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert np.percentile(diff, 99) < 4.0

    def test_generate_homography_roundtrip(self, rng):
        img = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
        pts = np.array([[10.0, 10], [70, 12], [68, 50], [12, 48]])
        out = generate_homography(img, pts, pts, out_size=[80, 60])
        np.testing.assert_allclose(np.asarray(out)[5:-5, 5:-5], img[5:-5, 5:-5], atol=1)


class TestClipPcdByDistancePlane:
    """ref utils.py:35-53 via geometry.plane.clip_pcd_by_distance_plane."""

    def test_split_matches_signed_distance(self):
        import numpy as np
        from vision_semantic_segmentation_tpu.geometry import (
            clip_pcd_by_distance_plane,
        )

        rng = np.random.default_rng(0)
        pts = rng.normal(scale=5.0, size=(200, 4))  # xyz + intensity
        # plane y = 0 (spanned by x and z axes through the origin);
        # signed distance is the y coordinate up to normal orientation
        close, far = clip_pcd_by_distance_plane(
            pts, [1, 0, 0], [0, 0, 1], [0, 0, 0], (3.0, -1.0)
        )
        assert close.shape[0] + far.shape[0] == 200
        y = np.asarray(close)[:, 1]
        sign = 1.0 if ((np.abs(y) < 3.0).all()) else -1.0
        d = sign * y
        assert ((d < 3.0) & (d > -1.0)).all()
        yf = sign * np.asarray(far)[:, 1]
        assert ((yf >= 3.0) | (yf <= -1.0)).all()
        # intensity column rides along
        assert close.shape[1] == 4


class TestSmallUtilParity:
    """The last reference utils.py functions (ref :93-177, :180-219)."""

    def test_differentiate_sinc(self):
        from vision_semantic_segmentation_tpu.geometry.transforms import (
            differentiate_sinc,
        )

        xs = np.array([0.0, 0.5, 1.3, -2.0])
        got = np.asarray(differentiate_sinc(xs))
        for x, g in zip(xs, got):
            want = 0.0 if x == 0 else np.cos(x) / x - np.sin(x) / x**2
            np.testing.assert_allclose(g, want, atol=1e-6)

    def test_singularity_normalization(self):
        from vision_semantic_segmentation_tpu.geometry.transforms import (
            deparameterize_rotation,
            singularity_normalization,
        )

        w = np.array([[0.0], [0.0], [np.pi + 0.5]])
        wn = singularity_normalization(w)
        assert np.linalg.norm(wn) <= np.pi + 1e-9
        # same rotation either way
        np.testing.assert_allclose(
            np.asarray(deparameterize_rotation(wn.ravel())),
            np.asarray(deparameterize_rotation(w.ravel())),
            atol=1e-6,
        )
        small = np.array([[0.1], [0.2], [0.0]])
        np.testing.assert_array_equal(singularity_normalization(small), small)

    def test_jacobian_vector_norm(self):
        from vision_semantic_segmentation_tpu.geometry.transforms import (
            jacobian_vector_norm,
        )

        v = np.array([[3.0], [4.0]])
        got = np.asarray(jacobian_vector_norm(v))
        np.testing.assert_allclose(got, [[0.6, 0.8]], atol=1e-6)

    def test_right_null(self):
        from vision_semantic_segmentation_tpu.geometry.transforms import right_null

        A = np.diag([1.0, 1.0, 0.0])  # rank-deficient square: null = e3
        n = right_null(A)
        np.testing.assert_allclose(np.abs(n.ravel()), [0, 0, 1], atol=1e-8)
        assert right_null(np.eye(3)) is None

    def test_concat_image_list(self):
        from vision_semantic_segmentation_tpu.utils.images import concat_image_list

        a = np.zeros((8, 10, 3), np.uint8)
        b = np.full((12, 6), 255, np.uint8)  # grayscale, larger
        panel = concat_image_list([a, b])
        # every image resizes to the min (8, 6) like the reference -> 6+6 wide
        assert panel.shape == (8, 12, 3)
        assert concat_image_list([]) is None
        one = concat_image_list([a])
        np.testing.assert_array_equal(one, a)
