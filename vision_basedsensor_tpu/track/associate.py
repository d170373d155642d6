"""Frame-to-frame marker association (reference C7), batched over frames.

The reference matches every frame-0 marker to its nearest detection via
``scipy.spatial.distance.cdist`` + argmin with a 20 px gate, independently
per frame (``marker_detection.py:349-396``). That independence means the
whole video associates in one batched ``(B, 65, K)`` distance computation —
no sequential loop at all; only the 3D stage's last-sighting recurrence needs
a scan (reconstruct/displacement.py).

As in the reference, association is not one-to-one: several reference
markers may claim the same detection (it simply takes each row's argmin).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vision_basedsensor_tpu.detect.detector import Detections
from vision_basedsensor_tpu.track.rings import ReferenceMarkers


class TrackedFrames(NamedTuple):
    """Per-frame state of the 65 canonical markers (leading frame axes)."""
    xy: jnp.ndarray      # (..., 65, 2) current centers
    ref_xy: jnp.ndarray  # (65, 2) frame-0 centers (Ox, Oy columns of the CSV)
    axes: jnp.ndarray    # (..., 65, 2)
    angle: jnp.ndarray   # (..., 65)
    ring: jnp.ndarray    # (65,)
    valid: jnp.ndarray   # (..., 65)


def associate(ref: ReferenceMarkers, det: Detections,
              gate_px: float) -> TrackedFrames:
    """Nearest-detection association with a distance gate.

    ``det`` may carry arbitrary leading frame axes; ``ref`` is the frame-0
    table. A marker is valid in a frame when the reference slot is occupied
    and its nearest valid detection is within ``gate_px``
    (``min_marker_distance``, marker_detection.py:359-372).
    """
    d = jnp.linalg.norm(ref.xy[:, None, :] - det.xy[..., None, :, :], axis=-1)
    d = jnp.where(det.valid[..., None, :], d, jnp.inf)  # (..., 65, K)
    j = jnp.argmin(d, axis=-1)                           # (..., 65)
    dmin = jnp.min(d, axis=-1)
    valid = ref.valid & (dmin <= gate_px)

    xy = jnp.take_along_axis(det.xy, j[..., None].repeat(2, -1), axis=-2)
    axes = jnp.take_along_axis(det.axes, j[..., None].repeat(2, -1), axis=-2)
    angle = jnp.take_along_axis(det.angle, j, axis=-1)

    vz = valid[..., None]
    return TrackedFrames(
        xy=jnp.where(vz, xy, 0.0),
        ref_xy=ref.xy,
        axes=jnp.where(vz, axes, 0.0),
        angle=jnp.where(valid, angle, 0.0),
        ring=ref.ring,
        valid=valid,
    )


def associate_sequential(ref: ReferenceMarkers, det: Detections,
                         gate_px: float,
                         carry_xy: jnp.ndarray | None = None,
                         return_carry: bool = False):
    """Association against each marker's *last sighting* instead of frame 0.

    The reference always gates against frame-0 positions (20 px,
    marker_detection.py:363-372), which fails once cumulative deformation
    moves a marker further than the gate in the image — e.g. deep
    indentations. This mode carries last-seen positions through a
    ``lax.scan`` over frames: detection stays fully batched; only the tiny
    (65 x K) matching runs serially. ``det`` must have exactly one leading
    frame axis.

    ``carry_xy``: last-seen positions ``(65, 2)`` from a previous chunk, so a
    chunked/streaming run keeps the last-sighting gating across chunk
    boundaries (defaults to the frame-0 table). With ``return_carry`` the
    final last-seen positions are returned alongside the result.
    """
    def step(carry_xy, det_t):
        d = jnp.linalg.norm(carry_xy[:, None, :] - det_t.xy[None, :, :], axis=-1)
        d = jnp.where(det_t.valid[None, :] & ref.valid[:, None], d, jnp.inf)
        j = jnp.argmin(d, axis=-1)
        dmin = jnp.min(d, axis=-1)
        # One-to-one: a detection belongs only to its CLOSEST claiming slot.
        # Unlike the batch mode (which replicates the reference's
        # many-to-one argmin and re-anchors to frame 0 every frame), the
        # carried mode would otherwise LATCH permanently: while marker A is
        # occluded, a neighbor B drifting inside A's gate captures A's
        # carry, and from then on slot A tracks B forever — a fabricated
        # phantom displacement the stream never recovers from (round-3
        # review). With the mutual-nearest constraint, B's detection stays
        # with slot B (distance ~0), slot A keeps its stale carry, and A
        # re-associates the moment it reappears.
        same = j[None, :] == j[:, None]              # slots sharing my pick
        owner = jnp.argmin(jnp.where(same, dmin[None, :], jnp.inf), axis=-1)
        slots = jnp.arange(j.shape[0])
        valid = ref.valid & (dmin <= gate_px) & (owner == slots)
        xy = det_t.xy[j]
        new_carry = jnp.where(valid[:, None], xy, carry_xy)
        out = (jnp.where(valid[:, None], xy, 0.0),
               jnp.where(valid[:, None], det_t.axes[j], 0.0),
               jnp.where(valid, det_t.angle[j], 0.0),
               valid)
        return new_carry, out

    init = ref.xy if carry_xy is None else carry_xy
    final_xy, (xy, axes, angle, valid) = jax.lax.scan(step, init, det)
    tracked = TrackedFrames(xy=xy, ref_xy=ref.xy, axes=axes, angle=angle,
                            ring=ref.ring, valid=valid)
    if return_carry:
        return tracked, final_xy
    return tracked
