"""Frame undistortion + image-based intrinsic calibration end-to-end."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu.calibrate.images import calibrate_from_images
from vision_basedsensor_tpu.core import camera as cam_mod
from vision_basedsensor_tpu.core.camera import CameraModel
from vision_basedsensor_tpu.core.transforms import rodrigues
from vision_basedsensor_tpu.core.undistort import (
    build_rectify_map,
    optimal_new_camera,
    remap_bilinear,
)

cv2 = pytest.importorskip("cv2")


def _cam():
    return CameraModel.create(300.0, 300.0, 160.0, 120.0,
                              dist=np.array([-0.25, 0.08, 0.001, -0.001, 0.0]))


def test_rectify_map_matches_cv2():
    cam = _cam()
    h, w = 240, 320
    new_cam = optimal_new_camera(cam, h, w, alpha=0.0)
    ours = np.asarray(build_rectify_map(cam, h, w, new_cam))

    K = np.asarray(cam.K, np.float64)
    D = np.asarray(cam.dist, np.float64)
    newK = np.asarray(new_cam.K, np.float64)
    m1, m2 = cv2.initUndistortRectifyMap(K, D, None, newK, (w, h), cv2.CV_32FC1)
    np.testing.assert_allclose(ours[..., 0], m1, atol=0.02)
    np.testing.assert_allclose(ours[..., 1], m2, atol=0.02)


def test_remap_straightens_lines():
    """Distorted straight lines become straight after remap."""
    cam = _cam()
    h, w = 240, 320
    # Render a vertical line at undistorted x=240 by distorting sample points.
    img = np.zeros((h, w), np.float32)
    ys = np.arange(h)
    pts = np.stack([np.full_like(ys, 240.0), ys], -1).astype(np.float32)
    xyn = cam_mod.pixel_to_normalized(cam, jnp.asarray(pts))
    uv_d = np.asarray(cam_mod.normalized_to_pixel(
        cam, cam_mod.distort_normalized(cam, xyn)))
    for (x, y) in uv_d:
        xi = int(round(x))
        if 0 <= xi < w and 0 <= int(y) < h:
            img[int(y), xi] = 255.0
    # The distorted "line" is curved: spread of x across rows is large.
    xs_d = [np.argmax(row) for row in img if row.max() > 0]
    assert np.ptp(xs_d) >= 3

    new_cam = optimal_new_camera(cam, h, w, alpha=0.0)
    m = build_rectify_map(cam, h, w, new_cam)
    und = np.asarray(remap_bilinear(jnp.asarray(img), m))
    xs_u = [np.argmax(row) for row in und if row.max() > 50]
    assert np.ptp(xs_u) <= 2  # straight to within quantization


def test_remap_batched():
    cam = _cam()
    m = build_rectify_map(cam, 60, 80, optimal_new_camera(cam, 60, 80))
    frames = jnp.asarray(np.random.default_rng(0).random((3, 60, 80)), jnp.float32)
    out = remap_bilinear(frames, m)
    assert out.shape == (3, 60, 80)
    one = remap_bilinear(frames[1], m)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(one), atol=1e-6)


@pytest.mark.slow
def test_pipeline_undistort_parity_with_cv2_flow():
    """cfg.undistort_frames must reproduce the reference's preprocess
    (marker_detection.py:88-109): run the pipeline (a) on raw distorted
    frames with the flag, (b) on cv2-undistorted frames without it (the
    reference flow), with the matching rectified camera — tracked centers
    must agree to remap-interpolation noise, and the staircase depth must
    reconstruct correctly under distortion."""
    from vision_basedsensor_tpu.config import PipelineConfig, ReconstructConfig
    from vision_basedsensor_tpu.pipeline import (
        prepare_undistortion, run_video)
    from vision_basedsensor_tpu.synth import default_scene, render_frames

    dist = np.array([-0.18, 0.05, 0.0, 0.0, 0.0])
    scene = default_scene(height=240, width=320, dist=dist)
    d = jnp.zeros((6, 65, 3), jnp.float32)
    d = d.at[:, :, 2].add(-0.7 * jnp.arange(6)[:, None])
    frames = np.asarray(render_frames(scene, d))

    cfg = PipelineConfig(undistort_frames=True,
                         reconstruct=ReconstructConfig(warmup_frames=0))
    out_flag = run_video(jnp.asarray(frames), scene.cam, cfg,
                         apply_warmup=False)

    # Reference flow: cv2 remap, then the plain pipeline with the new camera.
    src_map, new_cam = prepare_undistortion(scene.cam, 240, 320, cfg)
    K = np.asarray(scene.cam.K, np.float64)
    D = np.asarray(scene.cam.dist, np.float64)
    newK = np.asarray(new_cam.K, np.float64)
    m1, m2 = cv2.initUndistortRectifyMap(K, D, None, newK, (320, 240),
                                         cv2.CV_32FC1)
    und = np.stack([cv2.remap(f, m1, m2, cv2.INTER_LINEAR) for f in frames])
    cfg_plain = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))
    out_ref = run_video(jnp.asarray(und), new_cam, cfg_plain,
                        apply_warmup=False)

    # The alpha=0 valid-region zoom crops the outer ring at this distortion
    # level: both flows track the same 55 interior markers.
    v = np.asarray(out_flag.tracked.valid) & np.asarray(out_ref.tracked.valid)
    assert v.sum() >= 6 * 50
    dxy = np.abs(np.asarray(out_flag.tracked.xy) - np.asarray(out_ref.tracked.xy))
    assert dxy[v].max() < 0.1  # px; remap borders are BORDER_REPLICATE vs cv2 0

    # The rectified geometry must reconstruct the true -0.7 mm/frame steps
    # (a camera-matrix mixup between old/new f would be a ~12% systematic
    # scale error). Median over markers: the remapped border markers are
    # noisy at this scene's ~19 px marker diameter.
    z = np.asarray(out_flag.recon.world[..., 2])
    seen = np.asarray(out_flag.recon.seen)
    steps = np.array([np.median(z[t][seen[t] & seen[0]] - z[0][seen[t] & seen[0]])
                      for t in range(1, 6)])
    np.testing.assert_allclose(steps, -0.7 * np.arange(1, 6), rtol=0.12)


def _render_board_through_camera(K, rvec, tvec, square_mm, n, h, w, ss=3):
    """Checkerboard of n x n squares imaged through a pinhole camera pose."""
    yy, xx = (np.mgrid[:h * ss, :w * ss] + 0.5) / ss - 0.5
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    # Homography board(mm, Z=0) -> pixels: H = K [r1 r2 t].
    H = K @ np.stack([R[:, 0], R[:, 1], tvec], axis=1)
    Hinv = np.linalg.inv(H)
    pts = np.stack([xx.ravel(), yy.ravel(), np.ones(xx.size)])
    uvw = Hinv @ pts
    u = (uvw[0] / uvw[2]).reshape(xx.shape)
    v = (uvw[1] / uvw[2]).reshape(xx.shape)
    iu = np.floor(u / square_mm).astype(int)
    iv = np.floor(v / square_mm).astype(int)
    inside = (iu >= 0) & (iu < n) & (iv >= 0) & (iv < n)
    img = np.where(inside & (((iu + iv) % 2) == 0), 30.0, 215.0)
    return img.reshape(h, ss, w, ss).mean((1, 3)).astype(np.float32)


@pytest.mark.slow
def test_calibrate_from_images_end_to_end(rng):
    """Rendered posed chessboards -> detector -> Zhang: recover intrinsics."""
    K = np.array([[420.0, 0.0, 200.0], [0.0, 410.0, 150.0], [0.0, 0.0, 1.0]])
    h, w, n, sq = 300, 400, 8, 6.0
    images = []
    for k in range(6):
        rvec = np.array([0.25 * np.sin(k * 1.3), 0.25 * np.cos(k * 0.9),
                         0.3 * np.sin(k * 2.1)])
        tvec = np.array([-22.0 + 2 * k, -18.0 + 1.5 * k, 95.0 + 6 * k])
        images.append(_render_board_through_camera(K, rvec, tvec, sq, n, h, w))
    out = calibrate_from_images(images, pattern_size=(n - 1, n - 1),
                                square_mm=sq, min_images=3, refine_iters=20)
    assert out is not None
    assert len(out.used_images) >= 4
    assert float(out.result.mean_reproj_error) < 0.3
    assert abs(out.artifact.fx - K[0, 0]) < 6.0
    assert abs(out.artifact.fy - K[1, 1]) < 6.0
    assert abs(out.artifact.cx - K[0, 2]) < 6.0
    assert abs(out.artifact.cy - K[1, 2]) < 6.0
