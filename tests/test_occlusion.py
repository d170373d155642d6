"""Partial-occlusion completion (VERDICT round 2, #8): half-occluded
markers stay tracked with recovered center/diameter instead of being
dropped by the reconstruct-stage axis-ratio gate."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu.config import DetectConfig
from vision_basedsensor_tpu.core.camera import project_points
from vision_basedsensor_tpu.detect import detect_markers
from vision_basedsensor_tpu.synth import default_scene, render_frames

# Ring-3/4 markers, well separated; covering their left half with the
# background level simulates the probe hiding them (markers are dark on a
# light bonnet).
OCC_IDS = [19, 22, 25, 28, 31, 34, 37, 40, 43]


@pytest.fixture(scope="module")
def occluded_scene():
    scene = default_scene(480, 640)
    frame = np.asarray(render_frames(scene,
                                     jnp.zeros((1, 65, 3), jnp.float32)))[0]
    uv = np.asarray(project_points(scene.cam, scene.marker_world))
    det0 = detect_markers(jnp.asarray(frame[None]), DetectConfig())
    xy0 = np.asarray(det0.xy)[0][np.asarray(det0.valid)[0]]
    ax0 = np.asarray(det0.axes)[0][np.asarray(det0.valid)[0]]
    r_px = ax0[:, 0].mean() / 2

    img = frame.copy()
    for m in OCC_IDS:
        cx, cy = uv[m]
        x0 = int(cx - r_px - 3)
        img[int(cy - r_px - 3):int(cy + r_px + 4), x0:int(cx)] = 190.0
    return scene, frame, img, uv, xy0, ax0


def _match(xy, valid, target, gate=6.0):
    d = np.linalg.norm(xy[valid] - target, axis=1)
    if d.size == 0 or d.min() > gate:
        return None
    return int(np.flatnonzero(valid)[d.argmin()])


def test_half_occluded_markers_completed(occluded_scene):
    """>= 90% of half-occluded markers must stay tracked, flagged, with
    recovered centers within 0.6 px and diameters within 5% (measured:
    0.17-0.52 px / <=3.5% on this fixture; an unoccluded marker measures
    ~0.01 px, and before this feature the marker was LOST for the frame)."""
    scene, frame, img, uv, xy0, ax0 = occluded_scene
    det = detect_markers(jnp.asarray(img[None]), DetectConfig())
    xy = np.asarray(det.xy)[0]
    valid = np.asarray(det.valid)[0]
    occl = np.asarray(det.occluded)[0]
    axes = np.asarray(det.axes)[0]
    true_d = ax0[:, 0].mean()

    kept = 0
    for m in OCC_IDS:
        i = _match(xy, valid, uv[m])
        if i is None:
            continue
        err = np.linalg.norm(xy[i] - uv[m])
        if occl[i] and err < 0.6 and abs(axes[i, 0] - true_d) / true_d < 0.05:
            kept += 1
    assert kept >= int(np.ceil(0.9 * len(OCC_IDS))), \
        f"only {kept}/{len(OCC_IDS)} half-occluded markers completed"


def test_unoccluded_markers_unaffected(occluded_scene):
    """The occlusion gates (ratio window + skew floor) must not fire on
    ordinary markers: every unoccluded marker's center/axes must be
    IDENTICAL with completion on vs off."""
    scene, frame, img, uv, xy0, ax0 = occluded_scene
    import dataclasses
    det_on = detect_markers(jnp.asarray(frame[None]), DetectConfig())
    det_off = detect_markers(
        jnp.asarray(frame[None]),
        dataclasses.replace(DetectConfig(), occlusion_completion=False))
    assert not np.asarray(det_on.occluded).any()
    np.testing.assert_array_equal(np.asarray(det_on.valid),
                                  np.asarray(det_off.valid))
    np.testing.assert_array_equal(np.asarray(det_on.xy),
                                  np.asarray(det_off.xy))
    np.testing.assert_array_equal(np.asarray(det_on.axes),
                                  np.asarray(det_off.axes))


@pytest.mark.slow
def test_occluded_markers_survive_reconstruction(occluded_scene):
    """End-to-end: the completed circle passes the max_axis_ratio depth
    gate, so the marker contributes a world position for the frame — with
    completion off it is absent (the reference's drop semantics)."""
    import dataclasses

    from vision_basedsensor_tpu.config import PipelineConfig, ReconstructConfig
    from vision_basedsensor_tpu.pipeline import initialize, process_frames

    scene, frame, img, uv, xy0, ax0 = occluded_scene
    frames = jnp.asarray(np.stack([frame, img]))
    cfg = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))
    ref = initialize(frames[0], cfg)
    out = process_frames(frames, ref, scene.cam, cfg)
    seen = np.asarray(out.recon.seen)
    n_seen_on = seen[1, OCC_IDS].sum()

    cfg_off = dataclasses.replace(
        cfg, detect=dataclasses.replace(cfg.detect,
                                        occlusion_completion=False))
    ref2 = initialize(frames[0], cfg_off)
    out_off = process_frames(frames, ref2, scene.cam, cfg_off)
    n_seen_off = np.asarray(out_off.recon.seen)[1, OCC_IDS].sum()

    assert n_seen_on >= int(np.ceil(0.9 * len(OCC_IDS))), n_seen_on
    assert n_seen_on > n_seen_off  # the feature is what keeps them

    # Reconstructed world positions of the completed markers stay sane:
    # within 2 mm of the rest position (no displacement was applied).
    world = np.asarray(out.recon.world)[1]
    rest = np.asarray(scene.marker_world)
    for m in OCC_IDS:
        if seen[1, m]:
            assert np.linalg.norm(world[m] - rest[m]) < 2.0, m
