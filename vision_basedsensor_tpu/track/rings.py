"""First-frame marker identity assignment (reference C6), fixed-shape.

The reference clusters marker radii with sklearn KMeans and then assigns
per-ring angle indices by CCW sort (``marker_detection.py:275-347``) — and
loses all but one marker per ring to the placeholder-key collision bug
(SURVEY.md §2.2 quirk 2: every marker awaiting an index is stored under the
same ``(layer, -1)`` dict key). This module implements the *intended*
semantics: a tiny fixed-iteration 1-D KMeans on device, rings ordered by
radius, and a direct angle->slot bijection into the canonical 65-id layout
(layout.py), so every detected marker gets a stable ``marker_id`` — fixing
quirks 2 and 5 in one place.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_basedsensor_tpu import layout
from vision_basedsensor_tpu.config import TrackConfig
from vision_basedsensor_tpu.detect.detector import Detections


class ReferenceMarkers(NamedTuple):
    """Frame-0 marker table in canonical id order (slot i <-> marker_id i+1)."""
    xy: jnp.ndarray      # (65, 2) first-frame sub-pixel centers
    axes: jnp.ndarray    # (65, 2)
    angle: jnp.ndarray   # (65,)
    ring: jnp.ndarray    # (65,) int32 ring index (0 = center)
    valid: jnp.ndarray   # (65,) bool
    # Photometric axis calibration (half/soft major-axis ratio) measured on
    # frame 0 and pinned for the session: every later detection pass reuses
    # it, so diameters/depths don't depend on how frames are batched
    # (ops/moments.finalize). 1.0 until the pipeline prologue fills it in.
    axis_scale: jnp.ndarray | float = 1.0


def kmeans_1d(values: jnp.ndarray, mask: jnp.ndarray, k: int, iters: int
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration 1-D KMeans. Returns (sorted centroids (k,), labels (N,)).

    Labels index the *sorted* centroids (ascending), i.e. label 0 is the
    innermost cluster — the radius-ordering step of ``marker_detection.py:312``
    built in. Deterministic: farthest-point initialization (quantile init
    fails on ring populations as unbalanced as 6/12/18/24/4).

    Caveat (shared with the reference's sklearn KMeans, whose k-means++
    init equally favors distant points): a single far-radius clutter
    detection claims its own centroid and merges two real rings. The
    DEFAULT ring_method='layout_prior' rejects such clutter geometrically;
    this mode exists for reference parity on clean first frames.
    """
    big = jnp.asarray(1e12, values.dtype)
    vals = jnp.where(mask, values, big)
    first = jnp.min(vals)

    init = first[None]
    for _ in range(k - 1):
        d = jnp.min(jnp.abs(values[:, None] - init[None, :]), axis=1)
        d = jnp.where(mask, d, -1.0)
        init = jnp.concatenate([init, values[jnp.argmax(d)][None]])

    def step(c, _):
        d = jnp.abs(values[:, None] - c[None, :])
        lab = jnp.argmin(d, axis=1)
        onehot = (lab[:, None] == jnp.arange(k)[None, :]) & mask[:, None]
        cnt = onehot.sum(0)
        s = (onehot * values[:, None]).sum(0)
        c_new = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), c)
        return c_new, None

    cents, _ = jax.lax.scan(step, init, None, length=iters)
    order_c = jnp.argsort(cents)
    cents_sorted = cents[order_c]
    inv = jnp.argsort(order_c)
    d = jnp.abs(values[:, None] - cents[None, :])
    labels = inv[jnp.argmin(d, axis=1)]
    return cents_sorted, labels


def expected_ring_radii(cfg: TrackConfig) -> np.ndarray:
    """Expected *image* ring radii up to scale: r_k / (d + z_k), normalized to
    the outer ring. Perspective-corrects the world ratios with the nominal
    camera distance (rings sit at different depths)."""
    r = np.asarray(layout.RING_RADII_MM[1:])
    z = np.asarray(layout.RING_HEIGHTS_MM[1:])
    e = r / (cfg.camera_distance_hint_mm + z)
    return e / e[-1]


def assign_rings_layout_prior(radius: jnp.ndarray, mask: jnp.ndarray,
                              cfg: TrackConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ring assignment by consensus scale against the known dome layout.

    Every (detection, ring) pair proposes a scale ``radius / e_ring``; the
    scale supported by the most detections wins; detections whose radius then
    sits further than ``ring_tolerance * scale`` from every expected ring are
    flagged as clutter. Returns (ring labels 0..k-1, on_dome mask).
    """
    e = jnp.asarray(expected_ring_radii(cfg), radius.dtype)   # (k,)
    cand = (radius[:, None] / e[None, :]).reshape(-1)          # (N*k,)
    cand_ok = jnp.repeat(mask, e.shape[0])
    # Residual of each detection against each candidate scale.
    resid = jnp.abs(radius[:, None, None] - cand[None, None, :] * e[None, :, None])
    best = jnp.min(resid, axis=1)                              # (N, N*k)
    support = jnp.sum((best < cfg.ring_tolerance * cand[None, :]) & mask[:, None],
                      axis=0)
    support = jnp.where(cand_ok & (cand > 1e-6), support, -1)
    s = cand[jnp.argmax(support)]
    d = jnp.abs(radius[:, None] - s * e[None, :])
    ring = jnp.argmin(d, axis=1)
    on_dome = jnp.min(d, axis=1) < cfg.ring_tolerance * s
    return ring, on_dome


def assign_identities(det: Detections, cfg: TrackConfig) -> ReferenceMarkers:
    """Map a first-frame detection set to canonical marker ids.

    Steps (reference semantics, ``marker_detection.py:275-347``, corrected):
      1. center marker = detection nearest the centroid of all detections;
      2. polar coordinates of the rest around it;
      3. ``num_rings`` 1-D KMeans clusters on radius, ordered by radius;
      4. angle -> slot via the canonical layout bijection (nearest nominal
         angular slot per ring), instead of the reference's fragile
         CCW-index bookkeeping.
    """
    xy = det.xy
    mask = det.valid
    m = mask[:, None].astype(xy.dtype)
    centroid = (xy * m).sum(0) / jnp.maximum(m.sum(), 1e-9)
    d_cent = jnp.where(mask, jnp.linalg.norm(xy - centroid, axis=1), jnp.inf)
    ci = jnp.argmin(d_cent)
    center_xy = xy[ci]

    rel = xy - center_xy
    radius = jnp.linalg.norm(rel, axis=1)
    theta_img = jnp.degrees(jnp.arctan2(rel[:, 1], rel[:, 0]))
    theta_world = cfg.angle_sign * theta_img + cfg.angle_offset_deg

    others = mask & (jnp.arange(xy.shape[0]) != ci)
    if cfg.ring_method == "layout_prior":
        ring0, on_dome = assign_rings_layout_prior(radius, others, cfg)
        mask = mask & (on_dome | (jnp.arange(xy.shape[0]) == ci))
    else:
        _, ring0 = kmeans_1d(radius, others, cfg.num_rings, cfg.kmeans_iters)
    ring = jnp.where(jnp.arange(xy.shape[0]) == ci, 0, ring0 + 1)

    # Canonical id via the layout bijection (vectorized re-implementation of
    # layout.ring_angle_to_id in jnp for use under jit).
    bases = jnp.asarray(layout._ring_base_ids())
    counts = jnp.asarray(layout.RING_COUNTS)
    starts = jnp.asarray(layout.RING_START_DEG, xy.dtype)
    steps = jnp.asarray(layout.RING_STEP_DEG, xy.dtype)
    r = jnp.clip(ring, 0, layout.NUM_RINGS)
    stepd = jnp.where(r == 0, 1.0, steps[r])

    phase = jnp.zeros_like(theta_world)
    if cfg.per_ring_phase:
        # Per-ring angular phase: circular mean of the slot residuals.
        # Real rings can be rotated vs the nominal table (the reference
        # prototype's outer markers sit ~45 deg off the published cardinals).
        for k in range(1, layout.NUM_RINGS + 1):
            in_ring = mask & (ring == k)
            step_k = float(layout.RING_STEP_DEG[k])
            resid = (theta_world - float(layout.RING_START_DEG[k])) / step_k
            frac = 2.0 * jnp.pi * (resid - jnp.floor(resid))
            m = in_ring.astype(xy.dtype)
            s = jnp.sum(m * jnp.sin(frac))
            c = jnp.sum(m * jnp.cos(frac))
            off = jnp.arctan2(s, c) / (2.0 * jnp.pi) * step_k
            phase = jnp.where(in_ring, off, phase)

    slot = jnp.round((theta_world - phase - starts[r]) / stepd).astype(jnp.int32)
    slot = jnp.mod(slot, counts[r])
    marker_id = jnp.where(r == 0, 1, bases[r] + slot)

    # One winner per canonical slot, chosen EXPLICITLY: XLA leaves the
    # update order of scatters with duplicate indices unspecified, so the
    # previous "write in ascending score order" scatter neither guaranteed
    # that the strongest detection wins an id collision nor that all five
    # output fields came from the same detection. A (65, K) match matrix +
    # per-slot argmax is deterministic (ties -> lowest detection index) and
    # atomically selects one source detection for every field.
    slots = marker_id - 1                                     # (K,)
    match = (jnp.arange(layout.NUM_MARKERS)[:, None] == slots[None, :]) \
        & mask[None, :]
    score_m = jnp.where(match, det.score[None, :], -jnp.inf)
    winner = jnp.argmax(score_m, axis=1)                      # (65,)
    occupied = jnp.any(match, axis=1)

    def take(src):
        v = src[winner]
        keep = occupied.reshape((-1,) + (1,) * (v.ndim - 1))
        return jnp.where(keep, v, jnp.zeros_like(v))

    return ReferenceMarkers(xy=take(xy), axes=take(det.axes),
                            angle=take(det.angle),
                            ring=jnp.where(occupied, ring[winner], 0),
                            valid=occupied)
