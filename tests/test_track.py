"""Identity assignment + association on synthetic dome detections."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu import layout
from vision_basedsensor_tpu.config import DetectConfig, TrackConfig
from vision_basedsensor_tpu.core import camera as cam_mod
from vision_basedsensor_tpu.detect import detect_markers
from vision_basedsensor_tpu.synth import default_scene, render_frames
from vision_basedsensor_tpu.track import assign_identities, associate, kmeans_1d


@pytest.fixture(scope="module")
def scene():
    return default_scene(height=480, width=640)


@pytest.fixture(scope="module")
def rest_det(scene):
    frame = render_frames(scene, jnp.zeros((1, 65, 3), jnp.float32))
    return detect_markers(frame[0], DetectConfig())


def test_kmeans_1d_separates_rings(rng):
    radii = np.concatenate([rng.normal(35, 0.5, 6), rng.normal(62, 0.5, 12),
                            rng.normal(92, 0.5, 18), rng.normal(120, 0.5, 24),
                            rng.normal(143, 0.5, 4)])
    mask = np.ones(len(radii), bool)
    cents, labels = kmeans_1d(jnp.asarray(radii), jnp.asarray(mask), 5, 32)
    cents = np.asarray(cents)
    np.testing.assert_allclose(cents, [35, 62, 92, 120, 143], atol=1.0)
    expected = np.repeat([0, 1, 2, 3, 4], [6, 12, 18, 24, 4])
    np.testing.assert_array_equal(np.asarray(labels), expected)


def test_kmeans_respects_mask(rng):
    vals = np.concatenate([rng.normal(10, 0.1, 20), np.full(10, 1e6)])
    mask = np.arange(30) < 20
    cents, _ = kmeans_1d(jnp.asarray(vals), jnp.asarray(mask), 2, 16)
    assert np.asarray(cents).max() < 100  # junk never pollutes centroids


def test_assign_identities_all_65(scene, rest_det):
    ref = assign_identities(rest_det, TrackConfig())
    valid = np.asarray(ref.valid)
    assert valid.sum() == 65, f"assigned {valid.sum()}"

    # Every canonical slot must hold the detection nearest its true
    # projected position.
    truth = np.asarray(cam_mod.project_points(scene.cam, scene.marker_world))
    xy = np.asarray(ref.xy)
    err = np.linalg.norm(xy - truth, axis=1)
    assert err.max() < 0.5, f"worst id-position error {err.max():.3f} px"

    rings = np.asarray(ref.ring)
    np.testing.assert_array_equal(rings, layout.marker_rings())


def test_assign_identities_with_clutter(scene, rest_det):
    """Injected clutter detections must not steal canonical slots."""
    det = rest_det
    xy = np.asarray(det.xy).copy()
    valid = np.asarray(det.valid).copy()
    score = np.asarray(det.score).copy()
    # Add 3 fake low-score detections in free slots, far from real markers.
    free = np.where(~valid)[0][:3]
    xy[free] = [[30.0, 30.0], [600.0, 30.0], [30.0, 440.0]]
    valid[free] = True
    score[free] = 0.11
    det2 = det._replace(xy=jnp.asarray(xy), valid=jnp.asarray(valid),
                        score=jnp.asarray(score))
    ref = assign_identities(det2, TrackConfig())
    truth = np.asarray(cam_mod.project_points(scene.cam, scene.marker_world))
    err = np.linalg.norm(np.asarray(ref.xy) - truth, axis=1)
    # Real markers all win their slots (higher score wins collisions).
    assert err.max() < 0.5


def test_associate_under_translation(scene, rest_det):
    ref = assign_identities(rest_det, TrackConfig())
    shift = jnp.zeros((1, 65, 3), jnp.float32) + jnp.asarray([0.3, -0.2, -0.4])
    frame = render_frames(scene, shift)
    det1 = detect_markers(frame, DetectConfig())
    tracked = associate(ref, det1, TrackConfig().min_marker_distance_px)
    valid = np.asarray(tracked.valid)[0]
    assert valid.sum() == 65

    truth = np.asarray(cam_mod.project_points(
        scene.cam, scene.marker_world + jnp.asarray([0.3, -0.2, -0.4])))
    err = np.linalg.norm(np.asarray(tracked.xy)[0] - truth, axis=1)
    assert err.max() < 0.1


def test_associate_gate_drops_far_markers(rest_det):
    ref = assign_identities(rest_det, TrackConfig())
    # Empty detection set: nothing within the gate.
    empty = rest_det._replace(valid=jnp.zeros_like(rest_det.valid))
    tracked = associate(ref, empty, 20.0)
    assert not bool(np.asarray(tracked.valid).any())


def test_associate_batched(scene, rest_det):
    ref = assign_identities(rest_det, TrackConfig())
    d = jnp.zeros((3, 65, 3), jnp.float32)
    d = d.at[1, :, 2].add(-0.3).at[2, :, 2].add(-0.6)
    frames = render_frames(default_scene(480, 640), d)
    det = detect_markers(frames, DetectConfig())
    tracked = associate(ref, det, 20.0)
    assert tracked.xy.shape == (3, 65, 2)
    assert np.asarray(tracked.valid).all()


def test_kmeans_matches_sklearn(rng):
    """Our fixed-iteration KMeans agrees with sklearn on ring-radius data
    (the reference's clusterer, marker_detection.py:308-309)."""
    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    radii = np.concatenate([rng.normal(c, 1.0, n) for c, n in
                            [(35, 6), (62, 12), (92, 18), (120, 24), (143, 4)]])
    ours_c, ours_l = kmeans_1d(jnp.asarray(radii), jnp.ones(len(radii), bool), 5, 32)
    km = sklearn_cluster.KMeans(n_clusters=5, n_init=10, random_state=0)
    km.fit(radii.reshape(-1, 1))
    sk_c = np.sort(km.cluster_centers_.ravel())
    np.testing.assert_allclose(np.asarray(ours_c), sk_c, atol=1e-6)
    sk_order = np.argsort(km.cluster_centers_.ravel())
    sk_l = np.argsort(sk_order)[km.labels_]
    np.testing.assert_array_equal(np.asarray(ours_l), sk_l)


def test_sequential_association_does_not_latch_onto_neighbor():
    """Review finding (round 3): while marker A is occluded, a neighbor B
    drifting inside A's gate used to CAPTURE A's last-sighting carry —
    slot A then tracked B forever (permanent identity duplication +
    phantom displacement). The mutual-nearest (one-to-one) constraint
    keeps B's detection with slot B, A's carry stays put, and A
    re-associates the moment it reappears."""
    from vision_basedsensor_tpu.detect.detector import Detections
    from vision_basedsensor_tpu.track.associate import associate_sequential
    from vision_basedsensor_tpu.track.rings import ReferenceMarkers

    n, k = 65, 4
    ref_xy = np.zeros((n, 2), np.float32)
    ref_xy[0] = [100.0, 100.0]      # marker A
    ref_xy[1] = [130.0, 100.0]      # marker B
    ref_valid = np.zeros(n, bool)
    ref_valid[:2] = True
    ref = ReferenceMarkers(xy=jnp.asarray(ref_xy),
                           axes=jnp.ones((n, 2)), angle=jnp.zeros(n),
                           ring=jnp.zeros(n, jnp.int32),
                           valid=jnp.asarray(ref_valid), axis_scale=1.0)

    # 4 frames: t0 both visible; t1-t2 A occluded while B drifts to within
    # A's 20 px gate; t3 A reappears at its original spot.
    det_xy = np.zeros((4, k, 2), np.float32)
    det_valid = np.zeros((4, k), bool)
    det_xy[0, 0], det_xy[0, 1] = [100, 100], [130, 100]
    det_valid[0, :2] = True
    det_xy[1, 0] = [118, 100]       # B only, 18 px from A's carry
    det_valid[1, 0] = True
    det_xy[2, 0] = [112, 100]
    det_valid[2, 0] = True
    det_xy[3, 0], det_xy[3, 1] = [100, 100], [112, 100]   # A returns
    det_valid[3, :2] = True

    det = Detections(xy=jnp.asarray(det_xy),
                     axes=jnp.ones((4, k, 2)), angle=jnp.zeros((4, k)),
                     score=jnp.ones((4, k)), valid=jnp.asarray(det_valid),
                     occluded=jnp.zeros((4, k), bool))
    tracked = associate_sequential(ref, det, 20.0)
    v = np.asarray(tracked.valid)
    xy = np.asarray(tracked.xy)
    # While A is occluded, its slot must stay INVALID (B's detection is
    # closer to B's own carry), not adopt B's position.
    assert v[0, 0] and v[0, 1]
    assert not v[1, 0] and v[1, 1]
    assert not v[2, 0] and v[2, 1]
    # On reappearance A recovers its own detection at (100, 100).
    assert v[3, 0] and v[3, 1]
    np.testing.assert_allclose(xy[3, 0], [100, 100])
    np.testing.assert_allclose(xy[3, 1], [112, 100])


def test_initialize_raises_on_empty_first_frame():
    """A first frame with no detectable markers (capped lens, wrong
    channel order) must fail loudly like the reference
    (marker_detection.py:278), not hand back an all-invalid table that
    tracks a whole session of zeros."""
    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.pipeline import initialize

    dark = jnp.zeros((240, 384), jnp.float32)
    with pytest.raises(ValueError, match="no markers detected"):
        initialize(dark, PipelineConfig())
