"""Calibration: homography, Zhang intrinsics, RANSAC PnP, artifacts."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_basedsensor_tpu.calibrate import (
    CalibrationArtifact,
    calibrate_intrinsics,
    fit_homography,
    solve_pnp_ransac,
)
from vision_basedsensor_tpu.config import CalibrateConfig
from vision_basedsensor_tpu.core import camera as cam_mod
from vision_basedsensor_tpu.core.camera import CameraModel
from vision_basedsensor_tpu.core.transforms import rodrigues

cv2 = pytest.importorskip("cv2")


def _board(pattern=(6, 6), square=3.0):
    """Planar board points like intrinsic_calibration.py:58-59."""
    xs, ys = np.meshgrid(np.arange(pattern[0]), np.arange(pattern[1]))
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1) * square
    return pts.astype(np.float64)


def _views(n_views=8, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[620.0, 0, 310.0], [0, 600.0, 245.0], [0, 0, 1]])
    dist = np.array([-0.15, 0.07, 0.0008, -0.0006, 0.02])
    cam = CameraModel.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2], 0.0, dist,
                             dtype=jnp.float64)
    obj = _board()
    objs, imgs = [], []
    for _ in range(n_views):
        rvec = rng.uniform(-0.35, 0.35, 3)
        tvec = np.array([rng.uniform(-8, 2), rng.uniform(-8, 2), rng.uniform(45, 75)])
        c = cam._replace(R_wc=rodrigues(jnp.asarray(rvec)), T_wc=jnp.asarray(tvec))
        uv = np.array(cam_mod.project_points(c, jnp.asarray(obj)))
        uv += rng.normal(0, noise, uv.shape)
        objs.append(obj)
        imgs.append(uv)
    return np.stack(objs), np.stack(imgs), K, dist


def test_fit_homography_exact(rng):
    H_true = np.array([[1.2, 0.1, 30.0], [-0.05, 0.9, -12.0], [1e-4, -2e-4, 1.0]])
    src = rng.uniform(0, 100, (40, 2))
    ones = np.ones((40, 1))
    dst_h = np.hstack([src, ones]) @ H_true.T
    dst = dst_h[:, :2] / dst_h[:, 2:]
    H = np.asarray(fit_homography(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(H, H_true / H_true[2, 2], atol=1e-6)


def test_zhang_recovers_intrinsics_noiseless():
    objs, imgs, K, dist = _views(noise=0.0)
    res = calibrate_intrinsics(objs, imgs, refine_iters=20)
    assert abs(float(res.cam.fx) - K[0, 0]) < 0.1
    assert abs(float(res.cam.fy) - K[1, 1]) < 0.1
    assert abs(float(res.cam.cx) - K[0, 2]) < 0.1
    assert abs(float(res.cam.cy) - K[1, 2]) < 0.1
    np.testing.assert_allclose(np.asarray(res.cam.dist), dist, atol=1e-3)
    assert float(res.mean_reproj_error) < 1e-3


def test_zhang_matches_cv2_with_noise():
    objs, imgs, K, dist = _views(noise=0.15, seed=3)
    res = calibrate_intrinsics(objs, imgs, refine_iters=25)

    ret, mtx, dist_cv, _, _ = cv2.calibrateCamera(
        [o.astype(np.float32) for o in objs],
        [i.astype(np.float32).reshape(-1, 1, 2) for i in imgs],
        (640, 480), None, None)
    # Both estimators see the same noisy data; they must agree closely.
    assert abs(float(res.cam.fx) - mtx[0, 0]) < 1.5
    assert abs(float(res.cam.fy) - mtx[1, 1]) < 1.5
    assert abs(float(res.cam.cx) - mtx[0, 2]) < 1.5
    assert abs(float(res.cam.cy) - mtx[1, 2]) < 1.5
    assert abs(float(res.mean_reproj_error) - ret) < 0.05


@pytest.mark.slow
def test_zhang_without_global_x64():
    """Production entry points (CLI) don't run under the test conftest's
    global x64 config; calibrate_intrinsics must opt into f64 itself
    (ADVICE.md round 1) or the refinement runs at a precision never
    validated."""
    objs, imgs, K, dist = _views(noise=0.0, n_views=6)
    with jax.enable_x64(False):
        res = calibrate_intrinsics(objs, imgs, refine_iters=20)
        err = float(res.mean_reproj_error)
        fx = float(res.cam.fx)
    assert np.asarray(res.cam.fx).dtype == np.float64
    assert abs(fx - K[0, 0]) < 0.1
    assert err < 1e-3


@pytest.mark.slow
def test_pnp_without_global_x64(rng):
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])
    cam = CameraModel.create(600.0, 600.0, 320.0, 240.0, dtype=jnp.float64)
    rvec_true = np.array([0.1, -0.2, 0.3])
    t_true = np.array([0.5, 1.0, 55.0])
    c_true = cam._replace(R_wc=rodrigues(jnp.asarray(rvec_true)),
                          T_wc=jnp.asarray(t_true))
    obj = rng.uniform(-16, 16, (40, 3))
    obj[:, 2] = rng.uniform(0, 6, 40)
    img = np.array(cam_mod.project_points(c_true, jnp.asarray(obj)))
    with jax.enable_x64(False):
        res = solve_pnp_ransac(obj, img, cam,
                               CalibrateConfig(ransac_iterations=200))
        T = np.asarray(res.T_wc)
    assert T.dtype == np.float64
    np.testing.assert_allclose(T, t_true, atol=1e-4)


def test_zhang_nearly_coplanar_views_stays_bounded():
    """Nearly fronto-parallel boards leave fx/fy weakly observable; undamped
    GN overshoots along the flat valley and can diverge. LM damping must keep
    every iterate finite and non-increasing in cost (VERDICT round 1, weak 5).
    """
    rng = np.random.default_rng(7)
    K = np.array([[620.0, 0, 310.0], [0, 600.0, 245.0], [0, 0, 1]])
    cam = CameraModel.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2], 0.0,
                             np.zeros(5), dtype=jnp.float64)
    obj = _board()
    objs, imgs = [], []
    for _ in range(6):
        rvec = rng.uniform(-0.02, 0.02, 3)   # nearly coplanar view set
        tvec = np.array([rng.uniform(-4, 4), rng.uniform(-4, 4),
                         rng.uniform(55, 65)])
        c = cam._replace(R_wc=rodrigues(jnp.asarray(rvec)), T_wc=jnp.asarray(tvec))
        uv = np.array(cam_mod.project_points(c, jnp.asarray(obj)))
        uv += rng.normal(0, 0.1, uv.shape)
        objs.append(obj)
        imgs.append(uv)
    res = calibrate_intrinsics(np.stack(objs), np.stack(imgs), refine_iters=30)
    # Intrinsics are not identifiable here; the requirement is numerical
    # sanity: finite parameters and a data fit at the noise floor.
    assert np.isfinite(np.asarray(res.cam.fx)) and np.isfinite(np.asarray(res.cam.fy))
    assert np.isfinite(np.asarray(res.cam.dist)).all()
    assert float(res.mean_reproj_error) < 0.5


@pytest.mark.slow
def test_pnp_ransac_with_outliers(rng):
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])
    dist = np.array([-0.1, 0.03, 0.0005, -0.0002, 0.0])
    cam = CameraModel.create(600.0, 600.0, 320.0, 240.0, 0.0, dist, dtype=jnp.float64)
    rvec_true = np.array([0.2, -0.1, 0.05])
    t_true = np.array([1.5, -2.0, 70.0])
    c_true = cam._replace(R_wc=rodrigues(jnp.asarray(rvec_true)), T_wc=jnp.asarray(t_true))

    obj = rng.uniform(-16, 16, (65, 3))
    obj[:, 2] = rng.uniform(0, 6, 65)
    img = np.array(cam_mod.project_points(c_true, jnp.asarray(obj)))
    img += rng.normal(0, 0.3, img.shape)
    # 15% gross outliers.
    out_idx = rng.choice(65, 10, replace=False)
    img[out_idx] += rng.uniform(30, 90, (10, 2))

    res = solve_pnp_ransac(obj, img, cam, CalibrateConfig(ransac_iterations=500))
    R_err = np.abs(np.asarray(res.R_wc) - np.asarray(rodrigues(jnp.asarray(rvec_true)))).max()
    assert R_err < 5e-3, R_err  # sigma=0.3 px observation noise floor
    np.testing.assert_allclose(np.asarray(res.T_wc), t_true, atol=0.3)
    assert int(res.num_inliers) >= 53
    # Outliers correctly excluded.
    assert not np.asarray(res.inliers)[out_idx].any()


@pytest.mark.slow
def test_pnp_outlier_rate_sweep_vs_cv2(rng):
    """Quantify the vectorized RANSAC against cv2.solvePnPRansac across
    outlier rates up to 40% (VERDICT round 1, weak 6: the single-rate test
    left high-contamination behavior unquantified). At every rate both
    solvers must recover the true pose; ours must land within the same
    tolerance of truth as cv2 does (it uses per-hypothesis ITERATIVE
    refinement, ours one final GN on the RANSAC winner —
    extrinsic_calibration.py:97-106 semantics)."""
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])
    cam = CameraModel.create(600.0, 600.0, 320.0, 240.0, dtype=jnp.float64)
    rvec_true = np.array([0.25, -0.12, 0.3])
    t_true = np.array([1.0, -1.5, 60.0])
    c_true = cam._replace(R_wc=rodrigues(jnp.asarray(rvec_true)),
                          T_wc=jnp.asarray(t_true))
    R_true = np.asarray(rodrigues(jnp.asarray(rvec_true)))

    for rate in (0.1, 0.25, 0.4):
        n_out = int(65 * rate)
        obj = rng.uniform(-16, 16, (65, 3))
        obj[:, 2] = rng.uniform(0, 6, 65)
        img = np.array(cam_mod.project_points(c_true, jnp.asarray(obj)))
        img += rng.normal(0, 0.3, img.shape)
        out_idx = rng.choice(65, n_out, replace=False)
        img[out_idx] += rng.uniform(25, 80, (n_out, 2)) * \
            rng.choice([-1, 1], (n_out, 2))

        res = solve_pnp_ransac(obj, img, cam,
                               CalibrateConfig(ransac_iterations=1000))
        ok, rvec_cv, t_cv, inl = cv2.solvePnPRansac(
            obj.astype(np.float32).reshape(-1, 1, 3),
            img.astype(np.float32).reshape(-1, 1, 2), K, np.zeros(5),
            flags=cv2.SOLVEPNP_ITERATIVE, confidence=0.99,
            reprojectionError=8.0, iterationsCount=1000)
        assert ok
        R_cv = cv2.Rodrigues(rvec_cv)[0]
        err_ours_R = np.abs(np.asarray(res.R_wc) - R_true).max()
        err_cv_R = np.abs(R_cv - R_true).max()
        err_ours_T = np.abs(np.asarray(res.T_wc) - t_true).max()
        err_cv_T = np.abs(t_cv.ravel() - t_true).max()
        # Absolute recovery at every contamination level...
        assert err_ours_R < 5e-3, (rate, err_ours_R)
        assert err_ours_T < 0.35, (rate, err_ours_T)
        # ...and no worse than cv2 beyond the shared noise floor.
        assert err_ours_R < err_cv_R + 2e-3, (rate, err_ours_R, err_cv_R)
        assert err_ours_T < err_cv_T + 0.15, (rate, err_ours_T, err_cv_T)
        # All injected outliers rejected.
        assert not np.asarray(res.inliers)[out_idx].any(), rate


def test_pnp_matches_cv2(rng):
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])
    cam = CameraModel.create(600.0, 600.0, 320.0, 240.0, dtype=jnp.float64)
    rvec_true = np.array([-0.15, 0.22, 0.4])
    t_true = np.array([0.5, 1.0, 55.0])
    c_true = cam._replace(R_wc=rodrigues(jnp.asarray(rvec_true)), T_wc=jnp.asarray(t_true))
    obj = rng.uniform(-16, 16, (40, 3))
    obj[:, 2] = rng.uniform(0, 6, 40)
    img = np.array(cam_mod.project_points(c_true, jnp.asarray(obj)))
    img += rng.normal(0, 0.2, img.shape)

    res = solve_pnp_ransac(obj, img, cam, CalibrateConfig(ransac_iterations=300))
    ok, rvec_cv, t_cv, _ = cv2.solvePnPRansac(
        obj.astype(np.float32).reshape(-1, 1, 3),
        img.astype(np.float32).reshape(-1, 1, 2), K, np.zeros(5),
        flags=cv2.SOLVEPNP_ITERATIVE, confidence=0.99,
        reprojectionError=8.0, iterationsCount=1000)
    R_cv = cv2.Rodrigues(rvec_cv)[0]
    np.testing.assert_allclose(np.asarray(res.R_wc), R_cv, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.T_wc), t_cv.ravel(), atol=0.25)


def test_artifact_roundtrip(tmp_path):
    art = CalibrationArtifact(
        fx=612.3, fy=598.7, cx=321.4, cy=239.2, skew=0.0,
        dist=np.array([-0.2, 0.05, 0.001, -0.0005, 0.01]),
        intrinsic_reproj_error=0.21,
        R_wc=np.asarray(rodrigues(jnp.asarray([0.1, 0.2, -0.3]))),
        T_wc=np.array([1.0, -2.0, 80.0]),
        extrinsic_reproj_error=0.4)

    ip = str(tmp_path / "IntrinsicParameters.xlsx")
    ep = str(tmp_path / "ExtrinsicParameters.xlsx")
    art.save_intrinsics_xlsx(ip)
    art.save_extrinsics_xlsx(ep)

    back = CalibrationArtifact.load_intrinsics_xlsx(ip).load_extrinsics_xlsx(ep)
    assert abs(back.fx - art.fx) < 1e-9
    np.testing.assert_allclose(back.dist, art.dist)
    np.testing.assert_allclose(back.R_wc, art.R_wc, atol=1e-12)
    np.testing.assert_allclose(back.T_wc, art.T_wc, atol=1e-12)

    jp = str(tmp_path / "calib.json")
    art.save_json(jp)
    back2 = CalibrationArtifact.load_json(jp)
    np.testing.assert_allclose(back2.T_wc, art.T_wc)


def test_xlsx_readable_by_pandas(tmp_path):
    """Our xlsx must parse with independent readers too (sanity of format)."""
    from vision_basedsensor_tpu.io import xlsx
    p = str(tmp_path / "t.xlsx")
    xlsx.write_xlsx(p, [["Parameter", "Value"], ["fx", 612.5], ["desc", "hello"]])
    rows = xlsx.read_xlsx(p)
    assert rows[0][:2] == ["Parameter", "Value"]
    assert rows[1][:2] == ["fx", 612.5]
    assert rows[2][:2] == ["desc", "hello"]


def test_load_intrinsics_reference_writer_schema(tmp_path):
    """The reference writes intrinsics under header 'Param'
    (intrinsic_calibration.py:51) while its loaders expect 'Parameter'
    (quirk 6); our reader must accept the reference's own files."""
    from vision_basedsensor_tpu.io import xlsx
    p = str(tmp_path / "ref_style.xlsx")
    xlsx.write_xlsx(p, [
        ["Param", "Value", "Desc"],
        ["fx", 601.5, "Focal length x"], ["fy", 599.0, "Focal length y"],
        ["cx", 321.0, "Principal point x"], ["cy", 239.5, "Principal point y"],
        ["skew", 0.0, "Skew coefficient"],
        ["k1", -0.2, ""], ["k2", 0.04, ""], ["p1", 0.001, ""],
        ["p2", -0.0005, ""], ["k3", 0.0, ""],
        ["Reproj Error", 0.31, "Mean error (px)"],
    ])
    art = CalibrationArtifact.load_intrinsics_xlsx(p)
    assert art.fx == 601.5 and art.cy == 239.5
    np.testing.assert_allclose(art.dist, [-0.2, 0.04, 0.001, -0.0005, 0.0])
    assert art.intrinsic_reproj_error == 0.31


def test_pnp_planar_world_points(rng):
    """Review finding (round 3): coplanar world points (markers measured on
    a flat plate — a standard rig) made every 6-point DLT rank-deficient
    and returned an all-NaN pose where cv2's ITERATIVE succeeds. The
    homography route must recover the pose for Z=0 and tilted planes, with
    outliers, and reject n < 4 with a clear error."""
    cam = CameraModel.create(600.0, 600.0, 320.0, 240.0, 0.0,
                             np.array([-0.1, 0.03, 0.0005, -0.0002, 0.0]),
                             dtype=jnp.float64)
    rvec_true = np.array([0.2, -0.1, 0.05])
    t_true = np.array([1.5, -2.0, 70.0])
    c_true = cam._replace(R_wc=rodrigues(jnp.asarray(rvec_true)),
                          T_wc=jnp.asarray(t_true))
    R_true = np.asarray(rodrigues(jnp.asarray(rvec_true)))

    q = rng.uniform(-16, 16, (40, 2))
    nrm = np.array([0.3, 0.5, 0.81])
    b1 = np.cross(nrm, [1.0, 0, 0]); b1 /= np.linalg.norm(b1)
    b2 = np.cross(nrm, b1)
    planes = {
        "z0": np.c_[q, np.zeros(40)],
        "tilted": np.outer(q[:, 0], b1) + np.outer(q[:, 1], b2) + [1, 2, 3],
    }
    for name, obj in planes.items():
        img = np.array(cam_mod.project_points(c_true, jnp.asarray(obj)))
        img += rng.normal(0, 0.3, img.shape)
        out_idx = rng.choice(40, 6, replace=False)
        img[out_idx] += rng.uniform(30, 90, (6, 2))
        res = solve_pnp_ransac(obj, img, cam,
                               CalibrateConfig(ransac_iterations=500))
        assert np.isfinite(np.asarray(res.R_wc)).all(), name
        assert np.abs(np.asarray(res.R_wc) - R_true).max() < 5e-3, name
        np.testing.assert_allclose(np.asarray(res.T_wc), t_true, atol=0.3)
        assert int(res.num_inliers) >= 30, name

    with pytest.raises(ValueError, match="at least 4"):
        solve_pnp_ransac(planes["z0"][:3], np.zeros((3, 2)), cam,
                         CalibrateConfig())


def test_zhang_rejects_too_few_views(rng):
    """< 3 views leaves the closed-form B system underdetermined; the old
    code returned confidently-wrong intrinsics with near-zero RMS (round-3
    review) — it must raise instead, on every entry path."""
    from vision_basedsensor_tpu.calibrate import calibrate_intrinsics
    objs = np.zeros((2, 36, 3))
    imgs = np.zeros((2, 36, 2))
    with pytest.raises(ValueError, match=">= 3 views"):
        calibrate_intrinsics(objs, imgs)
