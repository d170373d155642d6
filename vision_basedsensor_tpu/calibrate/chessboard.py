"""Chessboard corner detection + sub-pixel refinement (device-side).

Replaces ``cv2.findChessboardCorners`` + ``cv2.cornerSubPix``
(``intrinsic_calibration.py:76-81``; also the scale step of
``DiameterValidation.py:45-74``) with fixed-shape array ops:

1. inner corners of a checkerboard are intensity *saddle points*: the Hessian
   determinant is strongly negative there; the response map ``-det(H)`` is
   computed with Gaussian-derivative filters (banded-matmul separable
   filters, core/imaging.py);
2. top-K local maxima of the response (ops/peaks.py machinery);
3. sub-pixel refinement via the classic gradient-orthogonality iteration
   (the same fixed point ``cornerSubPix`` solves): q = argmin sum over window
   of (grad I(p) . (p - q))^2, iterated with a fixed count;
4. lattice ordering: corners are projected onto the two dominant
   nearest-neighbor directions and rounded to integer grid coordinates,
   giving OpenCV-compatible row-major ordering.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_basedsensor_tpu.core.imaging import _sep_filter
from vision_basedsensor_tpu.ops.patches import extract_patches, patch_coords
from vision_basedsensor_tpu.ops.peaks import find_peaks


def _gauss_deriv_taps(sigma: float, order: int) -> np.ndarray:
    """Gaussian (order 0/1/2) derivative taps."""
    radius = int(np.ceil(3 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    if order == 0:
        return g
    if order == 1:
        return -x / sigma**2 * g
    return (x**2 - sigma**2) / sigma**4 * g


def saddle_response(gray: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """``-det(Hessian)`` of the smoothed image: positive at checkerboard
    corners (saddles), negative at blobs/ridges."""
    g0 = _gauss_deriv_taps(sigma, 0)
    g1 = _gauss_deriv_taps(sigma, 1)
    g2 = _gauss_deriv_taps(sigma, 2)
    ixx = _sep_filter(gray, g0, g2, "reflect101")
    iyy = _sep_filter(gray, g2, g0, "reflect101")
    ixy = _sep_filter(gray, g1, g1, "reflect101")
    return ixy * ixy - ixx * iyy


def refine_subpixel(gray: jnp.ndarray, corners_xy: jnp.ndarray,
                    window: int = 11, iters: int = 10) -> jnp.ndarray:
    """cornerSubPix-STYLE refinement for corners ``(K, 2)`` on one image.

    Same normal-equation iteration as cv2.cornerSubPix but NOT the same
    parameters: ``window`` is the TOTAL window width (11 -> 11x11; cv2's
    winSize=(11,11) means a 23x23 window) and the default ``iters=10`` has
    no eps termination (the reference runs 30 with eps 1e-3,
    intrinsic_calibration.py:80-81). Accuracy is pinned on outputs by the
    chessboard tests rather than by parameter equality.

    Solves ``sum_w G(p) (p - q) = 0`` with ``G = grad I grad I^T`` over a
    Gaussian-weighted window, iterated ``iters`` times from the integer
    positions (matching cv2's (11, 11) window / 30-iteration setup at
    ``intrinsic_calibration.py:80-81``).
    """
    g0 = _gauss_deriv_taps(1.5, 0)
    g1 = _gauss_deriv_taps(1.5, 1)
    ix = _sep_filter(gray, g0, g1, "reflect101")
    iy = _sep_filter(gray, g1, g0, "reflect101")

    p = window + 4  # patch with margin for sub-pixel drift
    gxx_p, start = extract_patches(ix * ix, corners_xy, p)
    gxy_p, _ = extract_patches(ix * iy, corners_xy, p)
    gyy_p, _ = extract_patches(iy * iy, corners_xy, p)
    px, py = patch_coords(start, p)

    half = (window - 1) / 2.0

    def step(q, _):
        wx = jnp.clip(1.0 - jnp.abs(px - q[:, 0, None, None]) / (half + 1), 0, 1)
        wy = jnp.clip(1.0 - jnp.abs(py - q[:, 1, None, None]) / (half + 1), 0, 1)
        w = wx * wy
        a = (w * gxx_p).sum((-2, -1))
        b = (w * gxy_p).sum((-2, -1))
        c = (w * gyy_p).sum((-2, -1))
        bx = (w * (gxx_p * px + gxy_p * py)).sum((-2, -1))
        by = (w * (gxy_p * px + gyy_p * py)).sum((-2, -1))
        det = jnp.maximum(a * c - b * b, 1e-12)
        qx = (c * bx - b * by) / det
        qy = (a * by - b * bx) / det
        new = jnp.stack([qx, qy], axis=-1)
        # Don't run away from the window on degenerate patches.
        new = jnp.clip(new, q - 2.0, q + 2.0)
        return new, None

    q, _ = jax.lax.scan(step, corners_xy, None, length=iters)
    return q


def order_grid(corners: np.ndarray, pattern_size: tuple[int, int],
               scores: np.ndarray | None = None) -> np.ndarray | None:
    """Order scattered corners into row-major (cols-fast) grid order.

    Host-side (runs once per calibration image): estimates the two lattice
    directions from nearest-neighbor displacement vectors, assigns integer
    lattice coordinates by projection, and normalizes orientation.
    Returns ``(rows*cols, 2)`` or None if the set is not a clean grid.
    """
    cols, rows = pattern_size
    n = rows * cols
    if corners.shape[0] < n:
        return None
    c = corners

    # Nearest-neighbor vectors.
    d = c[:, None, :] - c[None, :, :]
    dist = np.linalg.norm(d, axis=-1)
    np.fill_diagonal(dist, np.inf)
    nn = np.argsort(dist, axis=1)[:, :4]
    vecs = np.concatenate([c[nn[:, k]] - c for k in range(4)])
    vecs = vecs[np.linalg.norm(vecs, axis=1) < 1.5 * np.median(dist.min(1))]
    ang = np.mod(np.arctan2(vecs[:, 1], vecs[:, 0]), np.pi)
    # Dominant direction via angle histogram.
    hist, edges = np.histogram(ang, bins=36, range=(0, np.pi))
    a0 = edges[np.argmax(hist)] + np.pi / 72
    dir0 = np.array([np.cos(a0), np.sin(a0)])
    dir1 = np.array([-np.sin(a0), np.cos(a0)])
    sel0 = np.abs(np.mod(ang - a0 + np.pi / 2, np.pi) - np.pi / 2) < np.pi / 8
    sel1 = np.abs(np.mod(ang - a0, np.pi) - np.pi / 2) < np.pi / 8
    if sel0.sum() < 2 or sel1.sum() < 2:
        return None
    # Flip each sample onto the +direction before taking the median (the
    # mod-pi angle loses the vector's sign).
    u = np.median(vecs[sel0] * np.sign(vecs[sel0] @ dir0)[:, None], axis=0)
    v = np.median(vecs[sel1] * np.sign(vecs[sel1] @ dir1)[:, None], axis=0)

    B = np.stack([u, v], axis=1)  # lattice basis (2, 2) columns
    try:
        coords = np.linalg.solve(B, (c - c.mean(0)).T).T
    except np.linalg.LinAlgError:
        return None
    ij = np.round(coords - coords.min(0)).astype(int)
    ij -= ij.min(0)
    span = ij.max(0) + 1

    # The candidate set may include spurious saddles (board outline); among
    # all completely-filled (cols x rows) lattice windows pick the one with
    # the highest total corner score (true inner corners respond strongest).
    sc = np.ones(len(c)) if scores is None else np.asarray(scores)

    def fill(window_cols, window_rows, transpose):
        a = ij[:, ::-1] if transpose else ij
        sp = a.max(0) + 1
        best = None
        best_score = -np.inf
        for oy in range(sp[1] - window_rows + 1):
            for ox in range(sp[0] - window_cols + 1):
                grid = np.full((window_rows, window_cols, 2), np.nan)
                gscore = np.full((window_rows, window_cols), -np.inf)
                for (i, j), pt, s in zip(a, c, sc):
                    gi, gj = i - ox, j - oy
                    if 0 <= gi < window_cols and 0 <= gj < window_rows \
                            and s > gscore[gj, gi]:
                        grid[gj, gi] = pt
                        gscore[gj, gi] = s
                if not np.isnan(grid).any() and gscore.sum() > best_score:
                    best = grid
                    best_score = gscore.sum()
        return best

    grid = fill(cols, rows, False)
    if grid is None:
        grid = fill(cols, rows, True)
    if grid is None:
        return None
    # Canonical orientation: first corner is the lattice origin; OpenCV's
    # ordering convention (which end is first) is resolved by the caller via
    # the board pose, so normalize deterministically: top-left first.
    flat = grid.reshape(-1, 2)
    if flat[0, 1] > flat[-1, 1] or (flat[0, 1] == flat[-1, 1] and flat[0, 0] > flat[-1, 0]):
        flat = flat[::-1]
    return flat


class ChessboardResult(NamedTuple):
    corners: np.ndarray | None  # (rows*cols, 2) ordered, sub-pixel
    found: bool


def find_chessboard(gray, pattern_size: tuple[int, int],
                    sigma: float = 2.0) -> ChessboardResult:
    """Full detection: response -> peaks -> sub-pixel -> grid ordering."""
    gray = jnp.asarray(gray, jnp.float32)
    n = pattern_size[0] * pattern_size[1]
    resp = saddle_response(gray, sigma)
    thresh = 0.15 * float(jnp.max(resp))
    # Generous budget: board-outline junctions saddle too; order_grid's
    # lattice-window search crops them away.
    # cell=4: the default 8 px cell reduction merges saddle peaks sharing a
    # tile, losing corners of small-scale boards that the requested 6 px
    # separation should resolve (e.g. a distant calibration image).
    peaks = find_peaks(resp, thresh, 9, n + 64, 6.0, cell=4)
    valid = np.asarray(peaks.valid)
    xy = np.asarray(peaks.xy)[valid]
    score = np.asarray(peaks.score)[valid]
    if xy.shape[0] < n:
        return ChessboardResult(None, False)
    # Cluttered scenes (e.g. the reference's diameter-validation photo:
    # board + 60 markers in frame) swamp the lattice estimate with spurious
    # saddles. True inner corners respond strongest, so try score-ranked
    # prefixes first — the exact-n prefix is usually the clean board — and
    # widen toward the full candidate set (whose outline saddles order_grid's
    # lattice-window search crops away) only as needed.
    order = np.argsort(-score)
    tried = set()
    for m in (n, n + 8, n + 24, xy.shape[0]):
        m = min(m, xy.shape[0])
        if m in tried:
            continue
        tried.add(m)
        sel = order[:m]
        refined = np.asarray(refine_subpixel(
            gray, jnp.asarray(xy[sel], jnp.float32)))
        ordered = order_grid(refined, pattern_size, scores=score[sel])
        if ordered is not None:
            return ChessboardResult(ordered.astype(np.float64), True)
    return ChessboardResult(None, False)
