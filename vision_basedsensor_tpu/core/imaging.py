"""Imaging primitives: grayscale, separable Gaussian/box filters, morphology.

TPU-native replacements for the reference's OpenCV/SciPy image ops
(``cv2.cvtColor``/``cv2.GaussianBlur`` at ``marker_detection.py:114-124``,
``scipy.ndimage`` max/min filters at ``:171-173``, ``cv2.morphologyEx`` at
``:194-195``). Everything is batched over a leading frame axis and uses only
fixed-shape ops.

TPU performance note: single-channel stencil convolutions lower terribly on
the MXU (measured ~27 GB/s effective), so separable filters are evaluated as
*tiled banded matmuls* — each t-wide output tile contracts a (t + k - 1, t)
correlation matrix against the padded input window, keeping the work on the
MXU at ~(t + k - 1)/k times the minimal MAC count. Morphology lowers to
``lax.reduce_window``.

Convention: images are ``(..., H, W)`` float32 (values 0..255 for 8-bit
sources).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 luma weights used by cv2.COLOR_BGR2GRAY.
_BGR_WEIGHTS = (0.114, 0.587, 0.299)


def to_grayscale(frames: jnp.ndarray, channel_order: str = "bgr",
                 quantize: bool = True) -> jnp.ndarray:
    """``(..., H, W, 3)`` color (or ``(..., H, W)`` gray) -> float32 gray.

    Matches ``cv2.cvtColor(. , COLOR_BGR2GRAY)`` on uint8 inputs: BT.601
    weights, rounded to the nearest integer when ``quantize`` is set.
    """
    frames = jnp.asarray(frames)
    if frames.ndim >= 1 and frames.shape[-1] == 3:
        w = _BGR_WEIGHTS if channel_order == "bgr" else _BGR_WEIGHTS[::-1]
        w = jnp.asarray(w, jnp.float32)
        gray = jnp.tensordot(frames.astype(jnp.float32), w, axes=[[-1], [0]])
    else:
        gray = frames.astype(jnp.float32)
    if quantize:
        gray = jnp.floor(gray + 0.5)
    return gray


def gaussian_taps(ksize: int, sigma: float) -> np.ndarray:
    """Normalized 1D Gaussian taps (host numpy), identical to
    ``cv2.getGaussianKernel``."""
    ax = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    return k / k.sum()


def gaussian_kernel_1d(ksize: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 1D Gaussian taps as a device array."""
    return jnp.asarray(gaussian_taps(ksize, sigma), dtype)


def gaussian_kernel_2d(ksize: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 2D Gaussian, identical to ``MarkerTracker._gkern``
    (``marker_detection.py:137-143``)."""
    k = gaussian_kernel_1d(ksize, sigma, dtype)
    k2 = jnp.outer(k, k)
    return k2 / k2.sum()


@functools.lru_cache(maxsize=64)
def _tile_matrix(taps: tuple, tile: int) -> np.ndarray:
    """Per-tile correlation matrix: ``y[o] = sum_j taps[j] * xpad[o + j]``."""
    k = len(taps)
    T = np.zeros((tile + k - 1, tile), np.float32)
    for o in range(tile):
        for j, wgt in enumerate(taps):
            T[o + j, o] += wgt
    return T


def _pick_tile(n: int, max_tile: int = 160) -> int:
    for d in range(min(max_tile, n), 0, -1):
        if n % d == 0:
            return d
    return n


def _filter_axis_tiled(x: jnp.ndarray, taps: np.ndarray, mode: str,
                       axis: int) -> jnp.ndarray:
    """Banded filter along one axis as a tiled MXU matmul.

    The dense banded-matmul trick costs ``n`` MACs per output element; tiling
    the output into ``t``-wide chunks that each contract over ``t + k - 1``
    padded inputs cuts that to ``t + k - 1`` (~4-5x fewer FLOPs for the
    kernels used here) while staying on the MXU.
    """
    k = len(taps)
    lo, hi = (k - 1) // 2, k // 2
    n = x.shape[axis]
    tile = _pick_tile(n)
    if tile < 32:  # degenerate sizes: dense fallback
        tile = n
    nt = n // tile
    dt = x.dtype

    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (lo, hi)
    xp = jnp.pad(x, pad_cfg, mode="reflect" if mode == "reflect101" else "constant")

    Tm = jnp.asarray(_tile_matrix(tuple(float(t) for t in taps), tile), dt)
    idx = [slice(None)] * x.ndim
    parts = []
    for t in range(nt):
        idx[axis] = slice(t * tile, t * tile + tile + k - 1)
        parts.append(xp[tuple(idx)])
    stacked = jnp.stack(parts, axis=axis if axis >= 0 else x.ndim + axis)
    # stacked: (..., nt, tile+k-1, ...) with the windowed dim right after nt.
    if axis in (-1, x.ndim - 1):
        y = jnp.einsum("...ti,io->...to", stacked, Tm, preferred_element_type=dt)
        return y.reshape(x.shape)
    assert axis in (-2, x.ndim - 2)
    y = jnp.einsum("...tiw,io->...tow", stacked, Tm, preferred_element_type=dt)
    return y.reshape(x.shape)


def _sep_filter(x: jnp.ndarray, taps_h, taps_w, mode: str) -> jnp.ndarray:
    """Separable filter along (H, W) via tiled MXU matmuls."""
    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    y = x.astype(dt)
    if taps_h is not None:
        y = _filter_axis_tiled(y, np.asarray(taps_h), mode, -2)
    if taps_w is not None:
        y = _filter_axis_tiled(y, np.asarray(taps_w), mode, -1)
    return y


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float,
                  quantize: bool = False) -> jnp.ndarray:
    """Separable Gaussian blur with BORDER_REFLECT_101, matching
    ``cv2.GaussianBlur(src, (k, k), sigma)``.

    ``quantize`` rounds to the nearest integer, emulating uint8 output
    quantization of the reference's 8-bit pipeline.
    """
    k = gaussian_taps(ksize, sigma)
    y = _sep_filter(x, k, k, "reflect101")
    if quantize:
        y = jnp.floor(y + 0.5)
    return y


def box_sum(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Unnormalized ksize x ksize box sum with zero padding (fftconvolve-style
    'same' borders), used by the NCC decomposition."""
    ones = np.ones(ksize)
    return _sep_filter(x, ones, ones, "zero")


def conv_same_zero(x: jnp.ndarray, kh, kw) -> jnp.ndarray:
    """Separable 'same' convolution with zero padding along (H, W)."""
    return _sep_filter(x, np.asarray(kh), np.asarray(kw), "zero")


def _reduce_window_2d(x: jnp.ndarray, ksize: int, init, op) -> jnp.ndarray:
    dims = (1,) * (x.ndim - 2) + (ksize, ksize)
    # Window offsets [-k//2, k//2-1] for even k, matching scipy.ndimage's
    # footprint placement (the reference uses even neighborhoods 8/14 at
    # marker_detection.py:170).
    pad = [(0, 0)] * (x.ndim - 2) + [(ksize // 2, (ksize - 1) // 2)] * 2
    return jax.lax.reduce_window(x, init, op, dims, (1,) * x.ndim, pad)


def max_filter(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Sliding-window maximum (scipy ``maximum_filter`` analog; grey dilation)."""
    return _reduce_window_2d(x, ksize, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min, jax.lax.max)


def min_filter(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Sliding-window minimum (scipy ``minimum_filter`` analog; grey erosion)."""
    return _reduce_window_2d(x, ksize, jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max, jax.lax.min)


def morph_open(mask: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Binary morphological opening (erode then dilate) with a square
    structuring element — ``cv2.morphologyEx(MORPH_OPEN)`` analog
    (``marker_detection.py:194-195``). ``mask`` is float 0/1."""
    return max_filter(min_filter(mask, ksize), ksize)


@functools.partial(jax.jit, static_argnums=(1, 2))
def crop_frames(frames: jnp.ndarray, hw: tuple[int, int],
                crop_ratios: tuple[float, float, float, float]) -> jnp.ndarray:
    """Ratio crop (left, right, top, bottom), matching
    ``marker_detection.py:81-85`` integer arithmetic. ``hw`` is the full
    (H, W); crop bounds are static so shapes stay fixed under jit."""
    h, w = hw
    left = int(w * crop_ratios[0])
    right = w - int(w * crop_ratios[1])
    top = int(h * crop_ratios[2])
    bottom = h - int(h * crop_ratios[3])
    return frames[..., top:bottom, left:right]
