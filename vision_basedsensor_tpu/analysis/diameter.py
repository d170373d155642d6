"""Marker-diameter precision validation (reference C19).

Rebuild of ``code/Precision_Validation/DiameterValidation.py``: compute a
px/mm scale from a chessboard in the image (mean adjacent-corner spacing,
:45-74), binarize, and measure each circular marker's diameter with area /
circularity gates (:113-144). Fixed-shape redesign:

* the interactive trackbar threshold picker (:76-111) becomes Otsu's method
  on device; an explicit threshold can still be passed, and ``cli diameter
  --interactive`` reproduces the reference's cv2 trackbar picker when a
  display is available (``cli/main.py:select_threshold_interactive``);
* contours + ``minEnclosingCircle`` become fixed-shape component moments:
  each blob peak's window is restricted to the CONNECTED COMPONENT
  containing the peak (iterative morphological reconstruction — other dark
  objects in the window, like chessboard squares, must not contaminate the
  measurement); area = m00, perimeter = boundary-pixel count (calibrated
  0.75x cv2's contour metric on rasterized blobs), circularity =
  4 pi A / P^2, enclosing-circle diameter = 2 max distance from the
  centroid to a component pixel; components touching the window border are
  rejected rather than mismeasured (the reference's global contours are
  never truncated).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_basedsensor_tpu.core.imaging import gaussian_blur, to_grayscale
from vision_basedsensor_tpu.ops.patches import extract_patches, patch_coords
from vision_basedsensor_tpu.ops.peaks import find_peaks


def otsu_threshold(gray: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Otsu's threshold on a grayscale image (device-side histogram)."""
    hist = jnp.histogram(gray.reshape(-1), bins=bins, range=(0.0, 256.0))[0]
    p = hist.astype(jnp.float32) / jnp.maximum(hist.sum(), 1)
    centers = (jnp.arange(bins) + 0.5) * (256.0 / bins)
    w0 = jnp.cumsum(p)
    m0 = jnp.cumsum(p * centers)
    mt = m0[-1]
    w1 = 1.0 - w0
    between = jnp.where((w0 > 0) & (w1 > 0),
                        (mt * w0 - m0) ** 2 / jnp.maximum(w0 * w1, 1e-12), 0.0)
    # The between-class variance is flat across empty histogram gaps; take
    # the middle of the argmax plateau (argmax alone returns its left edge,
    # which would clip anti-aliased blob skirts).
    best = jnp.max(between)
    on_plateau = between >= best * (1.0 - 1e-6)
    return jnp.sum(jnp.where(on_plateau, centers, 0.0)) / jnp.maximum(
        on_plateau.sum(), 1)


def chessboard_scale(corners: np.ndarray, pattern_size: tuple[int, int],
                     square_mm: float) -> float:
    """px/mm from mean adjacent-corner spacing (DiameterValidation.py:54-71).

    ``corners`` must be grid-ordered row-major ``(rows*cols, 2)``.
    """
    cols, rows = pattern_size
    grid = np.asarray(corners, float).reshape(rows, cols, 2)
    dists = [np.linalg.norm(grid[:, 1:] - grid[:, :-1], axis=-1).ravel(),
             np.linalg.norm(grid[1:, :] - grid[:-1, :], axis=-1).ravel()]
    return float(np.concatenate(dists).mean() / square_mm)


class DiameterMeasurement(NamedTuple):
    centers: jnp.ndarray       # (K, 2)
    diameters_mm: jnp.ndarray  # (K,)
    circularity: jnp.ndarray   # (K,)
    area_px: jnp.ndarray       # (K,)
    valid: jnp.ndarray         # (K,)


def measure_diameters(image: jnp.ndarray, scale_px_per_mm: float,
                      threshold: float | None = None,
                      min_area_px: float = 100.0,
                      min_circularity: float = 0.85,
                      diameter_offset_mm: float = 0.0,
                      max_markers: int = 96,
                      patch: int = 64) -> DiameterMeasurement:
    """Measure dark circular markers against a light background.

    Replicates the reference's gates: ``MIN_AREA=100`` px,
    ``MIN_CIRCULARITY=0.85``, optional ``DIAMETER_OFFSET_MM``
    (DiameterValidation.py:34-38,121-141).
    """
    gray = to_grayscale(jnp.asarray(image))
    blur = gaussian_blur(gray, 5, 1.1)  # cv2 (5,5),sigma=0 auto-picks ~1.1
    thr = otsu_threshold(blur) if threshold is None else jnp.asarray(threshold, jnp.float32)
    mask = (blur < thr).astype(jnp.float32)  # THRESH_BINARY_INV semantics

    # Blob centers: peaks of the smoothed mask (interior plateaus give stable
    # peaks; distance suppression collapses each blob to one candidate).
    soft = gaussian_blur(mask, 15, 4.0)
    peaks = find_peaks(soft, 0.5, 15, max_markers, float(patch) / 2.0)

    m_patch, start = extract_patches(mask, peaks.xy, patch)
    gx, gy = patch_coords(start, patch)

    # Restrict each patch to the CONNECTED COMPONENT containing its peak
    # (morphological reconstruction: dilate the seed inside the mask until
    # it stops growing — patch/2 iterations reach any pixel of the
    # component). The reference's findContours measured exactly one
    # component; raw windowed sums would absorb any other dark object in
    # the window (a neighboring marker or a chessboard square — the
    # validation photo contains both), inflating area and the enclosing
    # radius.
    px = jnp.clip(jnp.round(peaks.xy[:, 0]).astype(jnp.int32)
                  - start[:, 0].astype(jnp.int32), 0, patch - 1)
    py = jnp.clip(jnp.round(peaks.xy[:, 1]).astype(jnp.int32)
                  - start[:, 1].astype(jnp.int32), 0, patch - 1)
    k = m_patch.shape[0]
    seed = jnp.zeros_like(m_patch).at[jnp.arange(k), py, px].set(1.0)
    seed = seed * m_patch

    def grow(_, s):
        d = jax.lax.reduce_window(s, -jnp.inf, jax.lax.max, (1, 3, 3),
                                  (1, 1, 1), "SAME")
        return d * m_patch

    comp = jax.lax.fori_loop(0, patch // 2, grow, seed)

    flat = lambda v: v.reshape(-1, patch * patch)
    w = flat(comp)
    area = w.sum(-1)
    tot = jnp.maximum(area, 1e-9)
    cx = (w * flat(gx)).sum(-1) / tot
    cy = (w * flat(gy)).sum(-1) / tot

    # Enclosing-circle radius: max distance of a masked pixel to the centroid.
    d2 = (flat(gx) - cx[:, None]) ** 2 + (flat(gy) - cy[:, None]) ** 2
    r_enc = jnp.sqrt(jnp.max(jnp.where(w > 0, d2, 0.0), axis=-1))
    # Boundary-pixel centers sit ~0.5 px inside the true contour, and
    # minEnclosingCircle circumscribes pixel corners: compensate +0.5 px.
    diameter_px = 2.0 * (r_enc + 0.5)

    # Circularity: the reference gates 4*pi*A/P^2 on the contour polygon
    # (DiameterValidation.py:131). The fixed-shape analog measures P by the
    # component's boundary-pixel count (comp minus its 3x3 erosion); the
    # count runs ~1.16x cv2.arcLength on rasterized blobs, so the metric
    # reads ~0.75x cv2's on the same shape (measured on digital circles
    # r=8..25: boundary-metric 0.64-0.69 vs cv2-metric 0.80-0.87). The
    # configured ``min_circularity`` keeps the reference's cv2 scale and is
    # mapped by that calibration — crucially this metric family (unlike an
    # enclosing-circle fill ratio) penalizes the long pinched boundary of
    # MERGED blobs, which the validation photo's dense layout produces.
    er = jax.lax.reduce_window(comp, jnp.inf, jax.lax.min, (1, 3, 3),
                               (1, 1, 1), "SAME")
    boundary = (comp - er).reshape(-1, patch * patch).sum(-1)
    circ = 4.0 * jnp.pi * area / jnp.maximum(boundary, 1.0) ** 2

    # A component touching the patch border extends beyond the window —
    # its in-window area/perimeter/radius are truncated and meaningless
    # (a clipped merged-blob pair can even look compact). The reference's
    # global findContours never truncates, so such blobs must be rejected,
    # not mismeasured.
    edge = jnp.zeros((patch, patch), comp.dtype)
    edge = edge.at[0, :].set(1).at[-1, :].set(1).at[:, 0].set(1).at[:, -1].set(1)
    touches = (comp * edge[None]).reshape(-1, patch * patch).sum(-1) > 0

    diameters_mm = diameter_px / scale_px_per_mm + diameter_offset_mm
    valid = (peaks.valid & (area >= min_area_px) & ~touches
             & (circ >= 0.75 * min_circularity))
    return DiameterMeasurement(
        centers=jnp.stack([cx, cy], -1), diameters_mm=diameters_mm,
        circularity=circ, area_px=area, valid=valid)
