"""3D reconstruction: staircase ground truth (the 12x0.7 mm experiment)."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu import layout
from vision_basedsensor_tpu.config import PipelineConfig, ReconstructConfig
from vision_basedsensor_tpu.pipeline import run_video
from vision_basedsensor_tpu.reconstruct import displacement_scan
from vision_basedsensor_tpu.synth import (
    default_scene,
    indentation_staircase,
    render_frames,
)


from vision_basedsensor_tpu.config import TrackConfig


def _cfg(association="frame0"):
    return PipelineConfig(
        reconstruct=ReconstructConfig(warmup_frames=0),
        track=TrackConfig(association_mode=association))


def test_displacement_scan_semantics():
    """Scan must reproduce the last-sighting recurrence incl. gaps and gate."""
    world = np.zeros((5, 2, 3), np.float32)
    world[:, 0, 2] = [0, 1, 2, 3, 4]       # marker 0 moves 1 mm/frame
    world[:, 1, 2] = [0, 0, 100, 0, 0]     # marker 1 jumps 100 mm at frame 2
    seen = np.ones((5, 2), bool)
    seen[2, 0] = False                     # marker 0 unseen at frame 2

    cfg = ReconstructConfig(warmup_frames=0)
    r = displacement_scan(jnp.asarray(world), jnp.asarray(seen), cfg)

    sv = np.asarray(r.step_valid)
    sn = np.asarray(r.step_norm)
    # Frame 0: no previous sighting.
    assert not sv[0].any()
    # Marker 0: steps at 1 (1mm), 3 (2mm vs last sighting at frame 1), 4 (1mm).
    np.testing.assert_allclose(sn[[1, 3, 4], 0], [1, 2, 1], atol=1e-6)
    assert not sv[2, 0]
    # Marker 1: 100 mm step exceeds the 50-unit gate both in and out.
    assert not sv[2, 1] and not sv[3, 1]
    assert sv[1, 1] and sv[4, 1]
    # Cumulative path for marker 0: 0,1,1,3,4.
    np.testing.assert_allclose(np.asarray(r.cum_path)[:, 0], [0, 1, 1, 3, 4], atol=1e-6)
    # from_first uses the first sighting (frame 0).
    np.testing.assert_allclose(np.asarray(r.from_first_norm)[:, 0], [0, 1, 0, 3, 4], atol=1e-6)


@pytest.mark.slow
def test_indentation_staircase_recovered():
    """End-to-end replication of the probe-indentation experiment
    (README.md:103-121): 12 prescribed 0.7 mm steps; the reference reports
    single-step absolute error 0.04-0.18 mm — we must do at least as well."""
    scene = default_scene(480, 640)
    disp = indentation_staircase(num_steps=12, step_mm=0.7)
    frames = render_frames(scene, disp)
    # 8.4 mm of compression drifts outer markers >20 px in the image, beyond
    # the reference's frame-0 gate — sequential association handles it.
    out = run_video(frames, scene.cam, _cfg("sequential"), apply_warmup=False)

    ffn = np.asarray(out.recon.from_first_norm)   # (13, 65)
    seen = np.asarray(out.recon.seen)
    assert seen[0].sum() == 65

    # Mean displacement across markers at each step vs prescribed depth.
    step_errors = []
    for k in range(1, 13):
        mean_disp = ffn[k][seen[k]].mean()
        step_errors.append(abs(mean_disp - 0.7 * k))
    step_errors = np.array(step_errors)
    # Single-step increments too.
    incr = np.diff(np.concatenate([[0.0], [ffn[k][seen[k]].mean() for k in range(1, 13)]]))
    incr_err = np.abs(incr - 0.7)
    assert incr_err.max() < 0.1, f"worst single-step error {incr_err.max():.3f} mm"
    assert step_errors[-1] < 0.5, f"cumulative error {step_errors[-1]:.3f} mm"


def test_reconstruction_absolute_positions():
    """Reconstructed rest positions must land near the true dome geometry."""
    scene = default_scene(480, 640)
    frames = render_frames(scene, jnp.zeros((2, 65, 3), jnp.float32))
    out = run_video(frames, scene.cam, _cfg(), apply_warmup=False)
    world = np.asarray(out.recon.world)[1]
    seen = np.asarray(out.recon.seen)[1]
    truth = layout.dome_layout()[:, 1:]
    err = np.linalg.norm(world[seen] - truth[seen], axis=1)
    # With the de-biased diameter estimate (~0.3%), absolute positions land
    # within a few tenths of a mm at ~40 mm depth.
    assert np.median(err) < 0.4, f"median abs position error {np.median(err):.2f} mm"


def test_membrane_tangential_recovery():
    """Full 3D displacement vectors (not just Z) recovered end-to-end under
    membrane kinematics: a probe indentation whose tangential flow moves
    markers up to ~0.5 mm in X/Y. The reference's rig only ever validates Z
    (README.md:103-121) although its schema carries dX/dY/dZ
    (3d_reconstruction.py:296-307); this pins the X/Y path."""
    from vision_basedsensor_tpu.synth import membrane_indentation_field
    scene = default_scene(480, 640)
    field = membrane_indentation_field(1.5, contact_xy=(2.0, -1.0),
                                       probe_radius_mm=5.0,
                                       tangential_frac=0.3)
    f = np.asarray(field)
    assert np.max(np.hypot(f[:, 0], f[:, 1])) > 0.3  # real tangential motion
    frames = render_frames(scene, jnp.stack([jnp.zeros((65, 3), jnp.float32),
                                             field]))
    out = run_video(frames, scene.cam, _cfg(), apply_warmup=False)
    seen = np.asarray(out.recon.seen)
    both = seen[0] & seen[1]
    assert both.sum() >= 60
    rec = np.asarray(out.recon.from_first)[1]   # (65, 3) recovered vectors

    err = rec[both] - f[both]
    # X/Y come from centroids (+ depth leverage), Z from depth-from-diameter.
    assert np.median(np.abs(err[:, 0])) < 0.05, np.median(np.abs(err[:, 0]))
    assert np.median(np.abs(err[:, 1])) < 0.05, np.median(np.abs(err[:, 1]))
    assert np.median(np.abs(err[:, 2])) < 0.10, np.median(np.abs(err[:, 2]))
    # The recovered tangential directions must agree with the prescribed
    # outward flow where it is appreciable (>0.1 mm).
    mag = np.hypot(f[:, 0], f[:, 1])
    m = both & (mag > 0.1)
    cos = ((rec[m, 0] * f[m, 0] + rec[m, 1] * f[m, 1])
           / np.maximum(np.hypot(rec[m, 0], rec[m, 1]) * mag[m], 1e-9))
    assert np.median(cos) > 0.95, np.median(cos)


def test_pipeline_with_lens_distortion():
    """End-to-end under a realistic Brown-Conrady lens: frames rendered
    THROUGH the distortion model, reconstruction undistorts with the same
    camera — recovered displacement must match the prescribed motion (this
    is the only path that exercises undistort_points inside the pipeline)."""
    import numpy as _np
    from vision_basedsensor_tpu.synth import default_scene
    dist = _np.array([-0.18, 0.05, 0.0008, -0.0006, 0.0])
    scene = default_scene(480, 640, dist=dist)
    zero = jnp.zeros((65, 3), jnp.float32)
    dz = zero + jnp.asarray([0.0, 0.0, -0.7])
    frames = render_frames(scene, jnp.stack([zero, dz]))
    out = run_video(frames, scene.cam, _cfg(), apply_warmup=False)
    seen = np.asarray(out.recon.seen)
    assert seen[0].sum() >= 63  # distortion shrinks edge markers slightly
    ffn = np.asarray(out.recon.from_first_norm)[1]
    both = seen[0] & seen[1]
    np.testing.assert_allclose(ffn[both].mean(), 0.7, atol=0.05)

    # Control: reconstructing while IGNORING the distortion must be visibly
    # wrong in absolute position (validates that undistortion matters here).
    from vision_basedsensor_tpu.core.camera import CameraModel
    naive_cam = CameraModel.create(
        scene.cam.fx, scene.cam.fy, scene.cam.cx, scene.cam.cy,
        R_wc=np.eye(3), T_wc=np.asarray(scene.cam.T_wc))
    out_naive = run_video(frames, naive_cam, _cfg(), apply_warmup=False)
    truth = layout.dome_layout()[:, 1:]
    err_good = np.linalg.norm(
        np.asarray(out.recon.world)[0][both] - truth[both], axis=1)
    err_naive = np.linalg.norm(
        np.asarray(out_naive.recon.world)[0][both] - truth[both], axis=1)
    assert np.median(err_good) < 0.5 * np.median(err_naive)
