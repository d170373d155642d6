"""Robustness: empty frames, occlusion, high-res profile, noise."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu import layout
from vision_basedsensor_tpu.config import (
    DetectConfig,
    PipelineConfig,
    ReconstructConfig,
    TrackConfig,
)
from vision_basedsensor_tpu.detect import detect_markers
from vision_basedsensor_tpu.pipeline import run_video
from vision_basedsensor_tpu.synth import default_scene, render_frames
from vision_basedsensor_tpu.track import assign_identities, associate


def _cfg():
    return PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))


def test_empty_frame_no_detections():
    frames = jnp.full((1, 240, 320), 190.0, jnp.float32)
    det = detect_markers(frames, DetectConfig())
    assert not bool(np.asarray(det.valid).any())


def test_empty_video_fails_loudly():
    """A first frame with no markers fails LOUDLY (the reference raises,
    marker_detection.py:278; round-3 review replaced the old silent
    all-invalid flow that "successfully" tracked a session of zeros).
    NaN-freedom when markers vanish AFTER frame 0 is pinned by
    test_occlusion_drops_only_hidden_markers."""
    scene = default_scene(240, 320)
    frames = jnp.full((3, 240, 320), 190.0, jnp.float32)
    with pytest.raises(ValueError, match="no markers detected"):
        run_video(frames, scene.cam, _cfg(), apply_warmup=False)


def test_occlusion_drops_only_hidden_markers():
    """Markers hidden after frame 0 drop out; the rest keep tracking
    (per-marker continue-on-failure, 3d_reconstruction.py:309-311 analog)."""
    scene = default_scene(480, 640)
    hidden = np.zeros(65, bool)
    hidden[[9, 20, 33, 50]] = True
    zero = jnp.zeros((65, 3), jnp.float32)
    f0 = render_frames(scene, zero[None])
    f1 = render_frames(scene, zero[None],
                       marker_mask=jnp.asarray(~hidden))
    frames = jnp.concatenate([f0, f1])
    out = run_video(frames, scene.cam, _cfg(), apply_warmup=False)
    seen = np.asarray(out.recon.seen)
    assert seen[0].sum() == 65
    assert not seen[1][hidden].any()
    assert seen[1][~hidden].sum() >= 59


def _occluded_frames(level_fn):
    """Two rest frames; frame 1 has marker 30's right half overwritten."""
    from vision_basedsensor_tpu.core import camera as cam_mod
    from vision_basedsensor_tpu import layout
    scene = default_scene(480, 640)
    zero = jnp.zeros((65, 3), jnp.float32)
    frames = np.array(render_frames(scene, jnp.stack([zero, zero])))
    world = layout.dome_layout()[:, 1:]
    uv = np.asarray(cam_mod.project_points(scene.cam, jnp.asarray(world)))
    mx, my = uv[30]
    frames[1, int(my) - 14:int(my) + 15, int(mx):int(mx) + 15] = \
        level_fn(frames[1])
    return scene, jnp.asarray(frames)


@pytest.mark.slow
def test_partial_occlusion_gated_by_axis_ratio():
    """A marker HALF-covered by bright debris leaves a half-disk whose
    moment ellipse passes every reference gate (fitEllipse on the clipped
    contour has no validity check beyond minor>=5 px,
    marker_detection.py:208,219) yet measures a ~2x-biased diameter —
    without any defense this fabricated a 13.9 mm phantom displacement.
    Two layers handle it (VERDICT round 2, #8): occlusion COMPLETION
    (default) recognises the censored disk and keeps the marker tracked
    with a recovered center/diameter (sub-mm residual instead of 13.9 mm);
    with completion off, the half-disk's ~1.9-2.0 major/minor still trips
    ReconstructConfig.max_axis_ratio (1.6) and the observation drops for
    the frame while every other marker keeps tracking."""
    scene, frames = _occluded_frames(lambda f: f.max())  # bright occluder
    out = run_video(frames, scene.cam, _cfg(), apply_warmup=False)
    seen = np.asarray(out.recon.seen)
    assert seen[0].sum() == 65
    ffn = np.asarray(out.recon.from_first_norm)[1]
    assert seen[1][30], "completion must keep the half-occluded marker"
    assert ffn[30] < 1.0, f"completed marker residual {ffn[30]} (was 13.9)"
    others = np.ones(65, bool)
    others[30] = False
    assert seen[1][others].sum() >= 62
    assert ffn[others & seen[1]].max() < 0.05, ffn[others & seen[1]].max()

    import dataclasses
    cfg = _cfg()
    cfg_off = dataclasses.replace(
        cfg, detect=dataclasses.replace(cfg.detect,
                                        occlusion_completion=False))
    out2 = run_video(frames, scene.cam, cfg_off, apply_warmup=False)
    assert not np.asarray(out2.recon.seen)[1][30], \
        "without completion the axis-ratio gate must drop the half-disk"


@pytest.mark.slow
def test_blob_merge_gated_by_step_displacement():
    """DARK debris touching a marker merges into one blob (the reference's
    contour labeling merges identically — SURVEY §2.2; its only defense is
    the 50-unit step gate, 3d_reconstruction.py:293-294). The merged blob
    stays near-circular (ratio ~1.15) so no shape gate can catch it; the
    inflated diameter reads as a ~14 mm depth jump in one frame. With the
    step gate at a physical value (5 mm/frame; the reference's 50 is a
    replicated quirk-8 constant) the phantom step is masked, and the scan's
    carry semantics recover the marker once the debris clears."""
    from vision_basedsensor_tpu.config import (PipelineConfig,
                                               ReconstructConfig)
    scene, frames = _occluded_frames(lambda f: f.min())  # dark = merge
    cfg = PipelineConfig(reconstruct=ReconstructConfig(
        warmup_frames=0, max_step_displacement_mm=5.0))
    out = run_video(frames, scene.cam, cfg, apply_warmup=False)
    sv = np.asarray(out.recon.step_valid)
    assert not sv[1, 30], "phantom 14 mm step must fail the 5 mm/frame gate"
    others = np.ones(65, bool)
    others[30] = False
    assert sv[1][others].sum() >= 62


def test_sensor_noise_tolerance(rng):
    """Additive sensor noise (sigma=3 gray levels): all markers still found;
    centroid scatter stays within the photometric estimator's noise floor
    (~0.2 px median at 2% weight noise over ~300 active pixels)."""
    scene = default_scene(480, 640)
    clean = np.asarray(render_frames(scene, jnp.zeros((1, 65, 3), jnp.float32)))[0]
    noisy = np.clip(clean + rng.normal(0, 3.0, clean.shape), 0, 255)
    det_c = detect_markers(jnp.asarray(clean, jnp.float32), DetectConfig())
    det_n = detect_markers(jnp.asarray(noisy, jnp.float32), DetectConfig())
    assert int(np.asarray(det_n.valid).sum()) >= 64
    xc = np.asarray(det_c.xy)[np.asarray(det_c.valid)]
    xn = np.asarray(det_n.xy)[np.asarray(det_n.valid)]
    errs = np.array([np.linalg.norm(xc - p, axis=1).min() for p in xn])
    assert np.median(errs) < 0.3
    assert np.percentile(errs, 90) < 0.7


@pytest.mark.slow
def test_high_res_profile_end_to_end():
    """960x1280 frames select the >480-row profile (marker_detection.py:117)
    and the full pipeline still finds and reconstructs the dome."""
    scene = default_scene(960, 1280)
    zero = jnp.zeros((65, 3), jnp.float32)
    dz = jnp.asarray([0.0, 0.0, -1.0]) + zero
    frames = render_frames(scene, jnp.stack([zero, dz]))
    out = run_video(frames, scene.cam, _cfg(), apply_warmup=False)
    seen = np.asarray(out.recon.seen)
    assert seen[0].sum() >= 60, f"high-res frame 0 tracked {seen[0].sum()}"
    ffn = np.asarray(out.recon.from_first_norm)[1]
    np.testing.assert_allclose(ffn[seen[1]].mean(), 1.0, atol=0.15)
