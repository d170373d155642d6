"""Reference-semantics oracle for parity tests.

Implements the *documented behavior* of the reference detector (SURVEY.md §2,
C4/C5: uint8 DoG band-pass -> inRange -> FFT NCC vs Gaussian template ->
local-maxima labeling -> mask center-of-mass) directly on top of
OpenCV/SciPy, so the TPU implementation can be compared against the same
numeric pipeline the reference runs. Test fixture only — not part of the
framework.
"""
from __future__ import annotations

import numpy as np

import cv2
from scipy import ndimage
from scipy.signal import fftconvolve


def gaussian_template(size: int, sigma: float) -> np.ndarray:
    ax = np.linspace(-(size - 1) / 2.0, (size - 1) / 2.0, size)
    xx, yy = np.meshgrid(ax, ax)
    k = np.exp(-0.5 * (xx**2 + yy**2) / sigma**2)
    return k / k.sum()


def normxcorr(template: np.ndarray, image: np.ndarray) -> np.ndarray:
    t = template - template.mean()
    img = image - image.mean()
    num = fftconvolve(img, t[::-1, ::-1], mode="same")
    ones = np.ones(t.shape)
    box = fftconvolve(img, ones, mode="same")
    var_n = fftconvolve(img * img, ones, mode="same") - box**2 / t.size
    var_n[var_n < 0] = 0
    with np.errstate(divide="ignore", invalid="ignore"):
        out = num / np.sqrt(var_n * np.sum(t * t))
    out[~np.isfinite(out)] = 0
    return out


def area_mask_uint8(gray_u8: np.ndarray, low_res: bool = True) -> np.ndarray:
    """uint8 DoG + inRange with native wraparound."""
    if low_res:
        small = cv2.GaussianBlur(gray_u8, (21, 21), 4.56)
        large = cv2.GaussianBlur(gray_u8, (35, 35), 11.4)
        lo, hi = 35, 180
    else:
        small = cv2.GaussianBlur(gray_u8, (39, 39), 8)
        large = cv2.GaussianBlur(gray_u8, (101, 101), 20)
        lo, hi = 20, 200
    dog = large - small + np.uint8(15)  # wraps mod 256 like the reference
    return cv2.inRange(dog, np.array(lo), np.array(hi))


def detect_centers(gray_u8: np.ndarray, low_res: bool = True):
    """Full oracle: returns (centers_xy (N,2) float, ncc, area_mask)."""
    area = area_mask_uint8(gray_u8, low_res)
    tmpl = gaussian_template(33 if low_res else 80, 7.4 if low_res else 13)
    ncc = normxcorr(tmpl, area.astype(np.float64))
    mask = (ncc > 0.1).astype(np.uint8)

    nb = 8 if gray_u8.shape[0] <= 480 else 14
    data_max = ndimage.maximum_filter(mask, nb)
    maxima = (mask == data_max)
    spread = (data_max - ndimage.minimum_filter(mask, nb)) > 0
    maxima &= spread

    labeled, n = ndimage.label(maxima)
    if n == 0:
        return np.zeros((0, 2)), ncc, area
    com = ndimage.center_of_mass(mask, labeled, range(1, n + 1))
    centers = np.array(com, dtype=np.float64).reshape(-1, 2)
    return centers[:, ::-1].copy(), ncc, area  # (x, y)
