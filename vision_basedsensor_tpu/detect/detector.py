"""2D marker detection: batched frames -> fixed-size candidate sets.

TPU-first redesign of the reference's per-frame detector
(``MarkerTracker._find_markers`` + ``_marker_center``,
``marker_detection.py:111-249``):

  reference (data-dependent, CPU)          this module (fixed-shape, XLA)
  ---------------------------------        --------------------------------
  uint8 DoG + inRange                      ops.dog (explicit modular op)
  FFT normxcorr vs Gaussian template       ops.ncc (6 separable 1-D convs)
  maximum/minimum_filter + ndimage.label   ops.peaks (local-max + top_k)
  center_of_mass over labeled mask         masked centroid in fixed windows
  findContours + fitEllipse per contour    windowed second moments
  per-contour Python matching loop         vectorized validity gates

Output is a ``Detections`` batch with ``max_candidates`` slots per frame and
a validity mask; invalid slots hold zeros. Everything vmaps/jits and lowers
to conv + reduce + gather ops.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vision_basedsensor_tpu.config import DetectConfig, DetectProfile
from vision_basedsensor_tpu.core.fit import ellipse_from_moments
from vision_basedsensor_tpu.core.imaging import min_filter, morph_open, to_grayscale
from vision_basedsensor_tpu.ops.dog import dog_area_mask
from vision_basedsensor_tpu.ops.ncc import normxcorr_gaussian
from vision_basedsensor_tpu.ops.patches import extract_patches, patch_coords
from vision_basedsensor_tpu.ops.peaks import find_peaks


class Detections(NamedTuple):
    """Fixed-size per-frame candidate set (slots beyond ``valid`` are zero)."""
    xy: jnp.ndarray      # (..., K, 2) sub-pixel centers (x, y)
    axes: jnp.ndarray    # (..., K, 2) (major, minor) full axis lengths, px
    angle: jnp.ndarray   # (..., K) major-axis angle, degrees in [0, 180)
    score: jnp.ndarray   # (..., K) NCC peak score
    valid: jnp.ndarray   # (..., K) bool


def _detect_one(gray: jnp.ndarray, ncc: jnp.ndarray, band: jnp.ndarray,
                area_open: jnp.ndarray, cfg: DetectConfig,
                profile: DetectProfile) -> Detections:
    """Single-frame candidate extraction from precomputed fields."""
    peaks = find_peaks(ncc, cfg.ncc_threshold, profile.peak_window,
                       cfg.max_candidates, float(profile.peak_window))

    p = profile.patch_size
    b_patch, start = extract_patches(band, peaks.xy, p)
    a_patch, _ = extract_patches(area_open, peaks.xy, p)
    g_patch, _ = extract_patches(gray, peaks.xy, p)
    gx, gy = patch_coords(start, p)

    # Radial cutoff around each peak isolates this marker's region from
    # neighbors sharing the window, and a Voronoi gate assigns each pixel to
    # its *nearest* peak — the reference got isolation for free from
    # connected-component labeling and loses it when regions merge (its
    # labeling fuses the cardinal markers with adjacent ring-4 blobs, whose
    # edges come within ~2 px here); the Voronoi split keeps them apart.
    # Exact Voronoi costs (K, P, P, K) pixel-peak distances; only the few
    # nearest neighbors can bind inside the cutoff disk, so the gate is the
    # intersection of halfplanes against the 3 nearest other peaks.
    dx = gx - peaks.xy[:, 0, None, None]
    dy = gy - peaks.xy[:, 1, None, None]
    d2_own = dx * dx + dy * dy
    k = peaks.xy.shape[0]
    pd2 = jnp.sum((peaks.xy[:, None, :] - peaks.xy[None, :, :]) ** 2, axis=-1)
    pd2 = jnp.where(jnp.eye(k, dtype=bool) | ~peaks.valid[None, :], jnp.inf, pd2)
    _, nbr = jax.lax.top_k(-pd2, 3)                     # (K, 3) nearest others
    nxy = peaks.xy[nbr]                                 # (K, 3, 2)
    nok = jnp.isfinite(jnp.take_along_axis(pd2, nbr, axis=1))
    # Halfplane: keep p when (p - own) . (nbr - own) <= |nbr - own|^2 / 2.
    ex = nxy[..., 0] - peaks.xy[:, None, 0]             # (K, 3)
    ey = nxy[..., 1] - peaks.xy[:, None, 1]
    rhs = 0.5 * (ex * ex + ey * ey)
    lhs = (dx[:, None] * ex[:, :, None, None]
           + dy[:, None] * ey[:, :, None, None])        # (K, 3, P, P)
    keep = jnp.all((lhs <= rhs[:, :, None, None] + 1e-3) | ~nok[:, :, None, None],
                   axis=1)
    cut = ((d2_own <= profile.radial_cutoff_px**2) & keep).astype(jnp.float32)

    flat = lambda v: v.reshape(-1, p * p)
    fx, fy = flat(gx), flat(gy)

    def centroid(w):
        tot = jnp.maximum(w.sum(-1), 1e-12)
        return jnp.stack([(w * fx).sum(-1) / tot, (w * fy).sum(-1) / tot], -1)

    # Reference-parity center: centroid of the boundary band of the NCC
    # superlevel mask — exactly the region the reference's
    # maximum/minimum_filter + label + center_of_mass computes
    # (marker_detection.py:170-181): mask pixels whose band_window
    # neighborhood touches background.
    band_center = centroid(flat(b_patch * cut))

    # Photometric weights: normalized darkness of the raw gray patch inside
    # the cutoff disk. Unbiased sub-pixel center/axes for absolute accuracy.
    g_cut = flat(g_patch)
    inside = flat(cut) > 0
    lo = jnp.min(jnp.where(inside, g_cut, jnp.inf), axis=-1, keepdims=True)
    hi = jnp.max(jnp.where(inside, g_cut, -jnp.inf), axis=-1, keepdims=True)
    contrast = jnp.maximum(hi - lo, 1e-3)
    w_photo = jnp.clip((hi - g_cut) / contrast, 0.0, 1.0) * flat(cut)
    photo = ellipse_from_moments(w_photo, fx, fy)

    center = band_center if cfg.centroid_mode == "band" else photo.center

    # Ellipse geometry from the opened area mask's second moments — the
    # analog of findContours + fitEllipse (:196-217).
    ell = ellipse_from_moments(flat(a_patch * cut), fx, fy)
    axes_src = ell if cfg.diameter_mode == "mask" else photo

    # Validity gates mirroring the reference's per-contour checks:
    #   minor >= 5 px (:219); NCC centroid within minor/10 of the ellipse
    #   center (:225-234); non-empty area region.
    match_d2 = jnp.sum((center - ell.center) ** 2, axis=-1)
    gate = (ell.minor / cfg.center_match_frac) ** 2
    valid = (peaks.valid
             & (ell.minor >= cfg.min_minor_axis_px)
             & (ell.area > 0.0)
             & (match_d2 < gate))

    z = lambda v: jnp.where(valid[..., None] if v.ndim > valid.ndim else valid, v, 0.0)
    return Detections(
        xy=z(center),
        axes=z(jnp.stack([axes_src.major, axes_src.minor], axis=-1)),
        angle=jnp.where(valid, axes_src.angle_deg, 0.0),
        score=jnp.where(valid, peaks.score, 0.0),
        valid=valid,
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def detect_markers(frames: jnp.ndarray, cfg: DetectConfig,
                   profile: DetectProfile | None = None) -> Detections:
    """Detect markers in frames ``(B, H, W[, 3])`` (uint8 or float 0..255).

    The resolution profile is chosen from the static frame height exactly as
    the reference does (``marker_detection.py:117``) unless given explicitly.
    """
    gray = to_grayscale(frames, cfg.channel_order)
    if profile is None:
        profile = cfg.low_res if gray.shape[-2] <= cfg.low_res_max_rows else cfg.high_res

    squeeze = gray.ndim == 2
    if squeeze:
        gray = gray[None]

    area = dog_area_mask(gray, profile, cfg.dog_offset)
    ncc = normxcorr_gaussian(area.astype(jnp.float32), profile.template_size,
                             profile.template_sigma)
    ncc_mask = (ncc > cfg.ncc_threshold).astype(jnp.float32)
    # Boundary band of the NCC mask: mask pixels whose band_window
    # neighborhood touches background (see _detect_one).
    band = ncc_mask * (min_filter(ncc_mask, profile.band_window) < 0.5)
    area_open = morph_open(area.astype(jnp.float32), cfg.open_ksize)

    det = jax.vmap(lambda n, b, a, g: _detect_one(g, n, b, a, cfg, profile))(
        ncc, band, area_open, gray)
    if squeeze:
        det = jax.tree.map(lambda x: x[0], det)
    return det
