"""Displacement fields over the frame axis via ``lax.scan``.

The only sequential state in the reference's 3D stage is the last-sighting
dictionary (``marker_dict``, ``3d_reconstruction.py:252,314`` — SURVEY.md
§5.7): displacements are *per-step* deltas against the previous sighting
(quirk 9), while Stage 4 recomputes displacement from frame 0
(``MarkerDisplacement.py:161-173``). Both are emitted here: the recurrence is
a fixed-shape scan carrying (last position, first position) per marker.

Reference gates replicated: warm-up frame skip (:255-256) and the
50-unit step gate (:293-294; named ``max_displacement_px`` there but compared
against mm — quirk 8 — renamed honestly in ReconstructConfig).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vision_basedsensor_tpu.config import ReconstructConfig
from vision_basedsensor_tpu.core.camera import CameraModel
from vision_basedsensor_tpu.reconstruct.depth import reconstruct_positions
from vision_basedsensor_tpu.track.associate import TrackedFrames


class Reconstruction(NamedTuple):
    """Per-frame, per-marker 3D state. Leading axis = frames."""
    world: jnp.ndarray            # (B, 65, 3) world positions (valid obs only)
    seen: jnp.ndarray             # (B, 65) observation valid this frame
    step: jnp.ndarray             # (B, 65, 3) delta vs previous sighting
    step_norm: jnp.ndarray        # (B, 65)
    step_valid: jnp.ndarray       # (B, 65) had previous sighting & passed gate
    cum_path: jnp.ndarray         # (B, 65) cumulative sum of step_norm
    from_first: jnp.ndarray       # (B, 65, 3) delta vs first sighting
    from_first_norm: jnp.ndarray  # (B, 65)


def initial_carry(n: int, dtype=jnp.float32) -> dict:
    """Fresh scan state (also the session-checkpoint schema, io/session.py)."""
    return dict(
        last=jnp.zeros((n, 3), dtype), last_ok=jnp.zeros(n, bool),
        first=jnp.zeros((n, 3), dtype), first_ok=jnp.zeros(n, bool),
        cum=jnp.zeros(n, dtype),
    )


def displacement_scan(world: jnp.ndarray, seen: jnp.ndarray,
                      cfg: ReconstructConfig, carry: dict | None = None,
                      return_carry: bool = False):
    """Run the last-sighting recurrence over the frame axis.

    ``world: (B, 65, 3)``, ``seen: (B, 65)``. Pass a ``carry`` from a
    previous chunk (or a session checkpoint) to resume mid-video; with
    ``return_carry`` the final state is returned alongside the result.
    """
    n = world.shape[1]
    init = initial_carry(n, world.dtype) if carry is None else carry

    def step_fn(c, xs):
        pos, ok = xs
        had_prev = c["last_ok"] & ok
        d = pos - c["last"]
        dn = jnp.linalg.norm(d, axis=-1)
        emit = had_prev & (dn <= cfg.max_step_displacement_mm)
        dz = jnp.where(emit[:, None], d, 0.0)
        dnz = jnp.where(emit, dn, 0.0)
        cum = c["cum"] + dnz

        first = jnp.where((~c["first_ok"] & ok)[:, None], pos, c["first"])
        first_ok = c["first_ok"] | ok
        ff = jnp.where(ok[:, None], pos - first, 0.0)

        new_c = dict(
            last=jnp.where(ok[:, None], pos, c["last"]),
            last_ok=c["last_ok"] | ok,
            first=first, first_ok=first_ok, cum=cum,
        )
        out = (dz, dnz, emit, cum, ff, jnp.linalg.norm(ff, axis=-1))
        return new_c, out

    final, (step, step_norm, step_valid, cum, ff, ffn) = jax.lax.scan(
        step_fn, init, (world, seen))
    recon = Reconstruction(world=world, seen=seen, step=step,
                           step_norm=step_norm, step_valid=step_valid,
                           cum_path=cum, from_first=ff, from_first_norm=ffn)
    if return_carry:
        return recon, final
    return recon


def warmup_mask(world: jnp.ndarray, ok: jnp.ndarray,
                warmup_frames: int, offset=0):
    """Mask the first ``warmup_frames`` GLOBAL frames of a stream
    (``3d_reconstruction.py:255-256`` semantics). ``offset`` is the global
    index of this chunk's first frame — the single definition shared by
    the batch API (offset 0), StreamingPipeline, and the sharded pipeline,
    so the chunked/resumed variants cannot drift from the batch one again
    (round-3 review: two of the three hand-rolled copies had)."""
    if warmup_frames <= 0:
        return world, ok
    keep = (offset + jnp.arange(world.shape[0])) >= warmup_frames
    ok = ok & keep[:, None]
    return jnp.where(ok[..., None], world, 0.0), ok


def reconstruct_sequence(cam: CameraModel, tracked: TrackedFrames,
                         cfg: ReconstructConfig,
                         apply_warmup: bool = True) -> Reconstruction:
    """Full 3D stage: tracked 2D markers -> displacement fields.

    ``apply_warmup`` replicates the reference's skip of the first
    ``warmup_frames`` frames after the earliest frame
    (``3d_reconstruction.py:255-256``).
    """
    world, ok = reconstruct_positions(
        cam, tracked.xy, tracked.axes, tracked.valid, cfg)
    if apply_warmup:
        world, ok = warmup_mask(world, ok, cfg.warmup_frames)
    return displacement_scan(world, ok, cfg)
