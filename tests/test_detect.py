"""Detection-stage accuracy on synthetic dome frames.

Ground truth comes from the synthetic renderer (projected marker positions);
parity comes from the reference-semantics oracle (tests/oracle.py).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu import layout
from vision_basedsensor_tpu.config import DetectConfig
from vision_basedsensor_tpu.core import camera as cam_mod
from vision_basedsensor_tpu.detect import detect_markers
from vision_basedsensor_tpu.synth import default_scene, render_frames


def _band_cfg():
    return DetectConfig(centroid_mode="band", diameter_mode="mask")


@pytest.fixture(scope="module")
def scene():
    return default_scene(height=480, width=640)


@pytest.fixture(scope="module")
def rest_frame(scene):
    d = jnp.zeros((1, layout.NUM_MARKERS, 3), jnp.float32)
    return np.asarray(render_frames(scene, d))[0]


def test_rendered_frame_sane(rest_frame):
    assert rest_frame.shape == (480, 640)
    assert rest_frame.max() > 150 and rest_frame.min() < 80


def test_detects_all_65_markers(scene, rest_frame):
    det = detect_markers(jnp.asarray(rest_frame), DetectConfig())
    valid = np.asarray(det.valid)
    assert valid.sum() == layout.NUM_MARKERS, f"found {valid.sum()} markers"


def test_centroid_accuracy_vs_ground_truth(scene, rest_frame):
    """Photometric centroid mode: <0.1 px absolute error (north-star)."""
    det = detect_markers(jnp.asarray(rest_frame), DetectConfig())
    got = np.asarray(det.xy)[np.asarray(det.valid)]
    truth = np.asarray(cam_mod.project_points(scene.cam, scene.marker_world))
    errs = []
    for t in truth:
        d = np.linalg.norm(got - t, axis=1)
        errs.append(d.min())
    errs = np.array(errs)
    # North-star: <0.1 px centroid error (BASELINE.md).
    assert errs.max() < 0.1, f"max centroid error {errs.max():.4f} px"


def test_band_centroid_bias_matches_reference_algorithm(scene, rest_frame):
    """The reference's band centroid carries a ~1 px radial bias from the
    DoG background of neighboring markers; our parity mode must reproduce the
    same bias (it is the algorithm's, not an implementation artifact). Two
    cardinal markers are lost to the reference's centroid-vs-ellipse gate in
    this tight geometry (the reference itself merges all four — see the
    parity test), so >= 63 of 65 here."""
    det = detect_markers(jnp.asarray(rest_frame), _band_cfg())
    got = np.asarray(det.xy)[np.asarray(det.valid)]
    assert len(got) >= 63
    truth = np.asarray(cam_mod.project_points(scene.cam, scene.marker_world))
    errs = np.array([np.linalg.norm(got - t, axis=1).min() for t in truth])
    # All but the gated-out cardinals within the algorithm's bias envelope.
    assert np.percentile(errs, 95) < 3.0


def test_centroid_parity_vs_reference_oracle(rest_frame):
    """Band-centroid parity vs the reference algorithm: <0.1 px at the 90th
    percentile. The oracle *merges* the 4 cardinal markers with adjacent
    ring-4 blobs (its connected-component labeling fuses regions whose edges
    touch), so its 4 worst centers are wrong by ~9 px; we keep them separate
    via the Voronoi gate, hence percentile rather than max."""
    oracle = pytest.importorskip("oracle")
    ref_centers, _, _ = oracle.detect_centers(rest_frame.astype(np.uint8))
    det = detect_markers(jnp.asarray(rest_frame), _band_cfg())
    got = np.asarray(det.xy)[np.asarray(det.valid)]
    assert len(ref_centers) >= 60  # oracle merges the 4 cardinals
    errs = []
    for r in ref_centers:
        d = np.linalg.norm(got - r, axis=1)
        errs.append(d.min())
    errs = np.array(errs)
    assert np.median(errs) < 0.05, f"median parity error {np.median(errs):.4f} px"
    assert np.percentile(errs, 90) < 0.1, \
        f"p90 parity error {np.percentile(errs, 90):.4f} px"


def test_diameter_accuracy(scene, rest_frame):
    """Photometric major axis must track the true projected diameter.

    The renderer projects marker balls, so the true image major axis carries
    the same foreshortening factor sqrt(R^2+f^2)/f the reference's depth
    model inverts (3d_reconstruction.py:219).
    """
    det = detect_markers(jnp.asarray(rest_frame), DetectConfig())
    valid = np.asarray(det.valid)
    got_xy = np.asarray(det.xy)[valid]
    got_major = np.asarray(det.axes)[valid][:, 0]

    truth_uv = np.asarray(cam_mod.project_points(scene.cam, scene.marker_world))
    depth = np.asarray(scene.marker_world)[:, 2] + 40.0
    f = float(scene.cam.fx)
    R = np.linalg.norm(truth_uv - [320.0, 240.0], axis=1)
    true_major = 2 * scene.marker_radius_mm * np.sqrt(R**2 + f**2) / depth
    rel = []
    for t_uv, t_d in zip(truth_uv, true_major):
        i = np.argmin(np.linalg.norm(got_xy - t_uv, axis=1))
        rel.append(abs(got_major[i] - t_d) / t_d)
    rel = np.array(rel)
    # Half-level-area de-biasing (ops/moments.py sum 18) brings the
    # moment-based estimate to ~0.3% median.
    assert np.median(rel) < 0.01, f"median diameter rel err {np.median(rel):.4f}"
    assert rel.max() < 0.02, f"max diameter rel err {rel.max():.4f}"


def test_detection_tracks_displacement(scene):
    """A 0.5 mm -Z shift moves centroids by the projected amount."""
    d0 = jnp.zeros((1, layout.NUM_MARKERS, 3), jnp.float32)
    d1 = d0.at[:, :, 2].add(-0.5)
    frames = render_frames(scene, jnp.concatenate([d0, d1]))
    det = detect_markers(frames, DetectConfig())
    xy = np.asarray(det.xy)
    valid = np.asarray(det.valid)

    truth0 = np.asarray(cam_mod.project_points(scene.cam, scene.marker_world))
    truth1 = np.asarray(cam_mod.project_points(
        scene.cam, scene.marker_world + jnp.asarray([0, 0, -0.5])))

    for t0, t1 in zip(truth0, truth1):
        i0 = np.argmin(np.linalg.norm(xy[0][valid[0]] - t0, axis=1))
        i1 = np.argmin(np.linalg.norm(xy[1][valid[1]] - t1, axis=1))
        shift_got = xy[1][valid[1]][i1] - xy[0][valid[0]][i0]
        shift_true = t1 - t0
        assert np.linalg.norm(shift_got - shift_true) < 0.15


def test_fast_filters_bf16_equivalent(scene, rest_frame):
    """bf16 filter matmuls (fast_filters): matched detections identical to
    the f32 path to sub-0.01 px (8-bit pixel values are exact in bf16; only
    slot ordering may differ via peak-score ties)."""
    d32 = detect_markers(jnp.asarray(rest_frame), DetectConfig())
    d16 = detect_markers(jnp.asarray(rest_frame), DetectConfig(fast_filters=True))
    a = np.asarray(d32.xy)[np.asarray(d32.valid)]
    b = np.asarray(d16.xy)[np.asarray(d16.valid)]
    assert len(a) == len(b) == 65
    errs = [np.linalg.norm(b - p, axis=1).min() for p in a]
    assert max(errs) < 0.01
