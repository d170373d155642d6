"""Imaging primitives: grayscale, separable Gaussian/box filters, morphology.

TPU-native replacements for the reference's OpenCV/SciPy image ops
(``cv2.cvtColor``/``cv2.GaussianBlur`` at ``marker_detection.py:114-124``,
``scipy.ndimage`` max/min filters at ``:171-173``, ``cv2.morphologyEx`` at
``:194-195``). Everything is batched over a leading frame axis and uses only
XLA-friendly fixed-shape ops: separable convolutions lower to fused TPU
convs, morphology lowers to ``lax.reduce_window``.

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


def gaussian_kernel_1d(ksize: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 1D Gaussian taps, identical to ``cv2.getGaussianKernel``."""
    ax = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    return jnp.asarray(k / k.sum(), dtype)


def gaussian_kernel_2d(ksize: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 2D Gaussian, identical to ``MarkerTracker._gkern``
    (``marker_detection.py:137-143``)."""
    k = gaussian_kernel_1d(ksize, sigma, dtype)
    k2 = jnp.outer(k, k)
    return k2 / k2.sum()


def _reflect101_pad(x: jnp.ndarray, pad_h: tuple[int, int], pad_w: tuple[int, int]) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 == numpy/jnp 'reflect'."""
    cfg = [(0, 0)] * (x.ndim - 2) + [pad_h, pad_w]
    return jnp.pad(x, cfg, mode="reflect")


def _conv_sep(x: jnp.ndarray, kh: jnp.ndarray | None, kw: jnp.ndarray | None) -> jnp.ndarray:
    """Separable valid-mode convolution along the trailing (H, W) axes.

    Input must already be padded. Kernels are 1D taps (correlation form; all
    kernels used here are symmetric so conv == corr).
    """
    batch_shape = x.shape[:-2]
    h, w = x.shape[-2:]
    y = x.reshape((-1, 1, h, w))
    dn = jax.lax.conv_dimension_numbers(y.shape, (1, 1, 1, 1), ("NCHW", "OIHW", "NCHW"))
    if kh is not None:
        k = kh.astype(y.dtype).reshape(1, 1, -1, 1)
        y = jax.lax.conv_general_dilated(y, k, (1, 1), "VALID", dimension_numbers=dn)
    if kw is not None:
        k = kw.astype(y.dtype).reshape(1, 1, 1, -1)
        y = jax.lax.conv_general_dilated(y, k, (1, 1), "VALID", dimension_numbers=dn)
    return y.reshape(batch_shape + y.shape[-2:])


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float,
                  quantize: bool = False) -> jnp.ndarray:
    """Separable Gaussian blur with BORDER_REFLECT_101, matching
    ``cv2.GaussianBlur(src, (k, k), sigma)``.

    ``quantize`` rounds to the nearest integer, emulating uint8 output
    quantization of the reference's 8-bit pipeline.
    """
    k = gaussian_kernel_1d(ksize, sigma)
    p = ksize // 2
    y = _conv_sep(_reflect101_pad(x, (p, p), (p, p)), k, k)
    if quantize:
        y = jnp.floor(y + 0.5)
    return y


def box_sum(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Unnormalized ksize x ksize box sum with zero padding (fftconvolve-style
    'same' borders), used by the NCC decomposition."""
    ones = jnp.ones((ksize,), x.dtype)
    p_lo, p_hi = (ksize - 1) // 2, ksize // 2
    cfg = [(0, 0)] * (x.ndim - 2) + [(p_lo, p_hi), (p_lo, p_hi)]
    return _conv_sep(jnp.pad(x, cfg), ones, ones)


def conv_same_zero(x: jnp.ndarray, kh: jnp.ndarray, kw: jnp.ndarray) -> jnp.ndarray:
    """Separable 'same' convolution with zero padding along (H, W)."""
    ph = ((kh.shape[0] - 1) // 2, kh.shape[0] // 2)
    pw = ((kw.shape[0] - 1) // 2, kw.shape[0] // 2)
    cfg = [(0, 0)] * (x.ndim - 2) + [ph, pw]
    return _conv_sep(jnp.pad(x, cfg), kh, kw)


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
