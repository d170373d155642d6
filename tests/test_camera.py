"""Camera model parity: project/undistort vs OpenCV, depth-from-diameter math."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu.core import camera as cam_mod
from vision_basedsensor_tpu.core import transforms
from vision_basedsensor_tpu.core.camera import CameraModel

cv2 = pytest.importorskip("cv2")


def make_cam(with_extrinsics=True):
    rvec = np.array([0.05, -0.03, 0.1])
    R = cv2.Rodrigues(rvec)[0] if with_extrinsics else np.eye(3)
    T = np.array([1.0, -2.0, 80.0]) if with_extrinsics else np.zeros(3)
    return CameraModel.create(
        fx=600.0, fy=610.0, cx=320.0, cy=240.0, skew=0.0,
        dist=np.array([-0.21, 0.05, 0.001, -0.0005, 0.01]),
        R_wc=R, T_wc=T,
    )


def test_rodrigues_matches_cv2():
    for seed in range(5):
        rng = np.random.default_rng(seed)
        rvec = rng.normal(size=3)
        R_ours = np.asarray(transforms.rodrigues(jnp.asarray(rvec, jnp.float64)))
        R_cv = cv2.Rodrigues(rvec)[0]
        np.testing.assert_allclose(R_ours, R_cv, atol=1e-6)
        # Round trip (compare rotations, not representations: inverse returns
        # the canonical theta in [0, pi] form).
        r_back = transforms.inverse_rodrigues(jnp.asarray(R_cv))
        R_back = np.asarray(transforms.rodrigues(r_back))
        np.testing.assert_allclose(R_back, R_cv, atol=1e-9)


def test_inverse_rodrigues_near_pi():
    """Regression: theta ~ pi collapses the antisymmetric part to ~0; the axis
    must be recovered from (R + I)/2 instead of returning ~identity
    (ADVICE.md round 1: PnP/Zhang refinements seeded from a near-180-degree
    pose would otherwise start from a wrong rvec)."""
    rng = np.random.default_rng(42)
    for theta in [np.pi, np.pi - 1e-9, np.pi - 1e-5, np.pi - 1e-3,
                  -np.pi + 1e-6]:
        for _ in range(4):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            rvec = axis * theta
            R = cv2.Rodrigues(rvec)[0]
            r_back = transforms.inverse_rodrigues(jnp.asarray(R, jnp.float64))
            # Magnitude must be near pi, never collapsed toward zero.
            assert abs(np.linalg.norm(np.asarray(r_back)) - abs(theta)) < 1e-4
            R_back = np.asarray(transforms.rodrigues(r_back))
            np.testing.assert_allclose(R_back, R, atol=1e-6)
    # Exact axis-aligned pi rotations (degenerate diagonals).
    for axis in np.eye(3):
        R = cv2.Rodrigues(axis * np.pi)[0]
        r_back = transforms.inverse_rodrigues(jnp.asarray(R, jnp.float64))
        R_back = np.asarray(transforms.rodrigues(r_back))
        np.testing.assert_allclose(R_back, R, atol=1e-9)


def test_project_points_matches_cv2():
    cam = make_cam()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-15, 15, size=(50, 3))
    pts[:, 2] = rng.uniform(0, 6, size=50)

    ours = np.asarray(cam_mod.project_points(cam, jnp.asarray(pts, jnp.float32)))

    R = np.asarray(cam.R_wc)
    rvec = cv2.Rodrigues(R)[0]
    ref, _ = cv2.projectPoints(
        pts.reshape(-1, 1, 3).astype(np.float64), rvec,
        np.asarray(cam.T_wc, np.float64), np.asarray(cam.K, np.float64),
        np.asarray(cam.dist, np.float64))
    np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=2e-2)


def test_undistort_points_matches_cv2():
    cam = make_cam(with_extrinsics=False)
    rng = np.random.default_rng(1)
    uv = rng.uniform([50, 50], [590, 430], size=(100, 2))

    ours = np.asarray(cam_mod.undistort_points(cam, jnp.asarray(uv, jnp.float32)))
    ref = cv2.undistortPoints(
        uv.reshape(-1, 1, 2).astype(np.float64),
        np.asarray(cam.K, np.float64), np.asarray(cam.dist, np.float64),
        None, np.asarray(cam.K, np.float64)).reshape(-1, 2)
    # Matches the reference pipeline's usage at 3d_reconstruction.py:185-193.
    np.testing.assert_allclose(ours, ref, atol=5e-2)


def test_undistort_inverts_distortion():
    cam = make_cam(with_extrinsics=False)
    rng = np.random.default_rng(2)
    xy = rng.uniform(-0.3, 0.3, size=(64, 2)).astype(np.float32)
    uv_dist = cam_mod.normalized_to_pixel(cam, cam_mod.distort_normalized(cam, jnp.asarray(xy)))
    xy_back = np.asarray(cam_mod.undistort_points(cam, uv_dist, iters=20, to_pixels=False))
    np.testing.assert_allclose(xy_back, xy, atol=1e-5)


def test_depth_from_diameter_recovers_known_depth():
    """A marker of known diameter at depth h must reconstruct to h.

    Forward model: a disk of diameter D at camera depth h, at radial offset R
    from the principal point, subtends approximately
    d_px = D * f_avg / h * sqrt(R^2 + f^2)/f  (the foreshortening-corrected
    model inverted at 3d_reconstruction.py:215-220).
    """
    cam = CameraModel.create(fx=600.0, fy=600.0, cx=320.0, cy=240.0)
    D = 2.0
    h = 40.0
    u, v = 400.0, 300.0  # offset from principal point
    f = 600.0
    R = np.hypot(u - 320.0, v - 240.0)
    d_eff = (D / f) * np.sqrt(R**2 + f**2)
    d_px = f * d_eff / h

    world = np.asarray(cam_mod.backproject_depth_from_diameter(
        cam, jnp.asarray([u, v]), jnp.asarray(d_px), D))
    np.testing.assert_allclose(world[2], h, rtol=1e-5)
    np.testing.assert_allclose(world[0], h * (u - 320.0) / f, rtol=1e-5)
    np.testing.assert_allclose(world[1], h * (v - 240.0) / f, rtol=1e-5)


def test_world_cam_roundtrip():
    cam = make_cam()
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    p_cam = transforms.world_to_cam(pts, cam.R_wc, cam.T_wc)
    back = transforms.cam_to_world(p_cam, cam.R_wc, cam.T_wc)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)
