"""Op-level parity: NCC decomposition, DoG mask, peak extraction."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu.config import DetectProfile
from vision_basedsensor_tpu.ops.dog import dog_area_mask
from vision_basedsensor_tpu.ops.ncc import normxcorr_gaussian
from vision_basedsensor_tpu.ops.peaks import find_peaks

cv2 = pytest.importorskip("cv2")

import oracle  # test-local reference-semantics oracle


def _blob_image(h=120, w=160, centers=((40, 50), (80, 110)), r=9):
    img = np.full((h, w), 190, np.uint8)
    for cy, cx in centers:
        yy, xx = np.mgrid[:h, :w]
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 40
    return img


def test_ncc_matches_fft_oracle(rng):
    mask = (rng.random((100, 140)) > 0.9).astype(np.float64)
    # Dilate a bit so there are real structures.
    mask = cv2.dilate(mask.astype(np.uint8), np.ones((5, 5), np.uint8)).astype(np.float64)
    ours = np.asarray(normxcorr_gaussian(jnp.asarray(mask, jnp.float32), 33, 7.4))
    ref = oracle.normxcorr(oracle.gaussian_template(33, 7.4), mask)
    # Compare where the mean-subtracted image has meaningful local variance
    # (the oracle zeroes nonfinite ratios, we zero below the variance floor).
    ones = np.ones((33, 33))
    from scipy.signal import fftconvolve
    m0 = mask - mask.mean()
    box = fftconvolve(m0, ones, mode="same")
    var_n = fftconvolve(m0 * m0, ones, mode="same") - box**2 / ones.size
    sel = var_n > 0.5
    assert np.abs(ours[sel] - ref[sel]).max() < 2e-3


def test_ncc_scale_invariance():
    img = _blob_image().astype(np.float32)
    a = np.asarray(normxcorr_gaussian(jnp.asarray(img / 255.0), 21, 5.0, min_variance=1e-6))
    b = np.asarray(normxcorr_gaussian(jnp.asarray(img), 21, 5.0, min_variance=1e-2))
    sel = np.abs(b) > 0.05
    np.testing.assert_allclose(a[sel], b[sel], atol=1e-3)


def test_dog_area_mask_matches_uint8_oracle():
    img = _blob_image()
    prof = DetectProfile()
    ours = np.asarray(dog_area_mask(jnp.asarray(img, jnp.float32), prof))
    ref = oracle.area_mask_uint8(img, low_res=True) > 0
    # cv2's uint8 Gaussian uses fixed-point arithmetic; allow disagreement
    # only on borderline pixels (DoG value within 1 level of a threshold).
    disagree = ours != ref
    assert disagree.mean() < 0.003, f"disagreement {disagree.mean():.4f}"


def test_find_peaks_extracts_blobs():
    img = _blob_image(centers=((40, 50), (80, 110), (30, 120)))
    prof = DetectProfile()
    area = dog_area_mask(jnp.asarray(img, jnp.float32), prof)
    ncc = normxcorr_gaussian(area.astype(jnp.float32), 33, 7.4)
    peaks = find_peaks(ncc, 0.1, 9, 16, 9.0)
    got = np.asarray(peaks.xy)[np.asarray(peaks.valid)]
    assert len(got) == 3
    expected = np.array([[50, 40], [110, 80], [120, 30]], float)
    for e in expected:
        assert np.min(np.linalg.norm(got - e, axis=1)) < 3.0


def test_find_peaks_suppresses_plateau_ties():
    score = np.zeros((50, 50), np.float32)
    score[20:23, 20:23] = 0.8  # 3x3 plateau
    peaks = find_peaks(jnp.asarray(score), 0.1, 9, 8, 9.0)
    assert int(np.asarray(peaks.valid).sum()) == 1


def test_find_peaks_batched():
    img = _blob_image()
    prof = DetectProfile()
    frames = jnp.asarray(np.stack([img, img]), jnp.float32)
    area = dog_area_mask(frames, prof)
    ncc = normxcorr_gaussian(area.astype(jnp.float32), 33, 7.4)
    peaks = find_peaks(ncc, 0.1, 9, 16, 9.0)
    assert peaks.xy.shape == (2, 16, 2)
    np.testing.assert_array_equal(np.asarray(peaks.valid[0]), np.asarray(peaks.valid[1]))


def test_ncc_binary_shortcut_exact(rng):
    """The binary-input NCC path (2 fewer filter passes) must match the
    general path to float tolerance on 0/1 masks."""
    mask = (rng.random((90, 120)) > 0.85).astype(np.float32)
    mask = cv2.dilate(mask.astype(np.uint8), np.ones((5, 5), np.uint8)).astype(np.float32)
    a = np.asarray(normxcorr_gaussian(jnp.asarray(mask), 33, 7.4))
    b = np.asarray(normxcorr_gaussian(jnp.asarray(mask), 33, 7.4, binary_input=True))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_cut_geometry_small_candidate_sets():
    """Review finding (round 2): top_k(k=3) crashed at trace time for
    max_candidates < 4. Missing halfplanes must be disabled instead."""
    from vision_basedsensor_tpu.ops.moments import cut_geometry
    from vision_basedsensor_tpu.ops.peaks import Peaks

    for k in (1, 2, 3):
        pk = Peaks(xy=jnp.asarray(np.random.default_rng(0).random((k, 2)) * 50,
                                  jnp.float32),
                   score=jnp.ones(k), valid=jnp.ones(k, bool))
        geom = cut_geometry(pk)
        assert geom.rhs.shape == (k, 3)
        # Slots beyond the k-1 possible neighbors are disabled.
        assert bool(jnp.all(jnp.isinf(geom.rhs[:, k - 1:])))
