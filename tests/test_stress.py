"""Accuracy stress sweeps: illumination gradient, defocus, motion blur,
vignetting, sensor noise (VERDICT round 3, next 6).

The reference's physical rig had all three optical effects (uneven LED ring
illumination, endoscope focus drift, rotating-bonnet motion blur —
README.md:103-121, 153-177) but never quantified them; its clean-scene
synthetic analog here is the rendered dome. Each sweep pins an explicit
degradation envelope: marker count must hold at 65/65 and the centroid
error must stay inside the measured-envelope * safety-margin tolerance
below (measured on CPU x64, 2026-08: see the table in each test).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu import layout
from vision_basedsensor_tpu.config import DetectConfig
from vision_basedsensor_tpu.core import camera as cam_mod
from vision_basedsensor_tpu.detect import detect_markers
from vision_basedsensor_tpu.synth import (
    default_scene,
    defocus,
    illumination_gradient,
    motion_blur,
    render_frames,
    sensor_noise,
    tilt_deviation_field,
    vignette,
)


@pytest.fixture(scope="module")
def scene():
    return default_scene(height=480, width=640)


@pytest.fixture(scope="module")
def clean(scene):
    d = jnp.zeros((1, layout.NUM_MARKERS, 3), jnp.float32)
    return render_frames(scene, d)


@pytest.fixture(scope="module")
def truth(scene):
    return np.asarray(cam_mod.project_points(scene.cam, scene.marker_world))


def _centroid_errors(frames, truth):
    det = detect_markers(frames, DetectConfig())
    got = np.asarray(det.xy)[0][np.asarray(det.valid)[0]]
    errs = np.array([np.linalg.norm(got - t, axis=1).min() for t in truth])
    return len(got), errs


# measured max err: 0.019 / 0.023 / 0.025 px — the DoG band-pass rejects
# smooth gain fields almost entirely.
@pytest.mark.parametrize("strength,tol_px", [(0.2, 0.05), (0.4, 0.05),
                                             (0.6, 0.06)])
def test_illumination_gradient_envelope(clean, truth, strength, tol_px):
    n, errs = _centroid_errors(illumination_gradient(clean, strength), truth)
    assert n == layout.NUM_MARKERS
    assert errs.max() < tol_px, f"max {errs.max():.4f} px at {strength}"


# measured max err: 0.020 / 0.023 / 0.025 px.
@pytest.mark.parametrize("strength,tol_px", [(0.2, 0.05), (0.4, 0.05),
                                             (0.6, 0.06)])
def test_vignette_envelope(clean, truth, strength, tol_px):
    n, errs = _centroid_errors(vignette(clean, strength), truth)
    assert n == layout.NUM_MARKERS
    assert errs.max() < tol_px


# measured max err: 0.019 / 0.091 / 0.224 / 0.339 px — defocus dilutes the
# NCC peak and widens the photometric window; degradation is graceful and
# stays sub-pixel even at sigma 3 (marker images are ~20 px across).
@pytest.mark.parametrize("sigma_px,tol_px", [(0.5, 0.05), (1.0, 0.15),
                                             (2.0, 0.35), (3.0, 0.55)])
def test_defocus_envelope(clean, truth, sigma_px, tol_px):
    n, errs = _centroid_errors(defocus(clean, sigma_px), truth)
    assert n == layout.NUM_MARKERS
    assert errs.max() < tol_px


# measured max err: 0.061 / 0.131 / 0.188 px at 30 deg streak direction —
# the symmetric line kernel keeps the blurred centroid on the true center;
# residual error comes from the anisotropic window weighting.
@pytest.mark.parametrize("length_px,tol_px", [(2.0, 0.12), (4.0, 0.25),
                                              (6.0, 0.35)])
def test_motion_blur_envelope(clean, truth, length_px, tol_px):
    n, errs = _centroid_errors(motion_blur(clean, length_px, 30.0), truth)
    assert n == layout.NUM_MARKERS
    assert errs.max() < tol_px


# measured max err: 0.018 / 0.244 / 0.860 px. sigma=2 is the JPEG-q70
# stream's real noise floor; sigma=10 models heavy gain (dim LEDs) and is
# the first sweep point where the 0.1 px north-star is genuinely lost.
@pytest.mark.parametrize("sigma,tol_px", [(2.0, 0.05), (5.0, 0.4),
                                          (10.0, 1.4)])
def test_sensor_noise_envelope(clean, truth, sigma, tol_px):
    n, errs = _centroid_errors(sensor_noise(clean, sigma, seed=7), truth)
    assert n == layout.NUM_MARKERS
    assert errs.max() < tol_px


@pytest.mark.slow
def test_combined_rig_conditions_tilt_recovery(scene):
    """All the rig effects together (gradient 0.3 + defocus 1 px + motion
    blur 2 px + noise sigma 2), through the FULL pipeline to the
    contact-plane tilt: the 15 deg reference pose (README.md:146) must come
    back within 0.75 deg under the combined degradation."""
    from vision_basedsensor_tpu.analysis.force import (
        analyze_deviation, deviation_field, start_end_displacement)
    from vision_basedsensor_tpu.config import (
        AnalysisConfig, PipelineConfig, ReconstructConfig)
    from vision_basedsensor_tpu.pipeline import run_video

    cfg = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))
    zero = jnp.zeros((65, 3), jnp.float32)
    d_vert = jnp.asarray([0.0, 0.0, -1.0]) + zero
    d_tilt = tilt_deviation_field(15.0, compression_mm=1.0)

    def degrade(frames):
        return sensor_noise(
            motion_blur(defocus(illumination_gradient(frames, 0.3), 1.0),
                        2.0, 30.0), 2.0, seed=3)

    out_v = run_video(degrade(render_frames(scene, jnp.stack([zero, d_vert]))),
                      scene.cam, cfg, apply_warmup=False)
    out_t = run_video(degrade(render_frames(scene, jnp.stack([zero, d_tilt]))),
                      scene.cam, cfg, apply_warmup=False)
    dv, ok_v = start_end_displacement(out_v.recon, (0, 0), (1, 1))
    dt, ok_t = start_end_displacement(out_t.recon, (0, 0), (1, 1))
    dev, ok = deviation_field(dv, ok_v, dt, ok_t)
    assert np.asarray(ok).sum() >= 60
    res = analyze_deviation(dev, ok, AnalysisConfig())
    assert abs(float(res.tilt_deg) - 15.0) < 0.75, float(res.tilt_deg)


# measured (decode_split end to end): q20 max 1.22 / q30 0.99 / q50 0.72 /
# q70 0.41 / q90 0.05 px — JPEG blocking is the dominant real-stream error
# source below q50; the camera's q~70 stream keeps the detector sub-half-px
# and q90 recovers the clean-scene 0.02 px regime.
@pytest.mark.parametrize("quality,tol_px", [(20, 1.8), (30, 1.5), (50, 1.1),
                                            (70, 0.65), (90, 0.1)])
def test_jpeg_quality_envelope(clean, truth, quality, tol_px):
    """End-to-end through the production transport: clean frame -> JPEG at
    the given quality -> native entropy decode -> split transport -> device
    IDCT -> detector. All 65 markers must survive and the centroid error
    stay inside the measured envelope x safety margin."""
    cv2 = pytest.importorskip("cv2")
    from vision_basedsensor_tpu.native import load_jpeg_lib
    if load_jpeg_lib() is None:
        pytest.skip("no C++ compiler for the native JPEG decoder")
    from vision_basedsensor_tpu.ops.jpeg import MjpegBatchDecoder

    img = np.asarray(clean)[0].astype(np.uint8)
    enc = cv2.imencode(".jpg", img,
                       [cv2.IMWRITE_JPEG_QUALITY, quality])[1].tobytes()
    frames = MjpegBatchDecoder().decode_split([enc])
    n, errs = _centroid_errors(frames, truth)
    assert n == layout.NUM_MARKERS
    assert errs.max() < tol_px, f"max {errs.max():.4f} px at q{quality}"
