"""Contact-state analysis: deviation field, contact-plane tilt, ring averages.

Jitted, mask-aware rebuild of the reference's Stage 4:

* deviation field ``d_tilt - d_vert`` over common markers
  (``ForceDistribution.py:168-208``, C14);
* least-squares contact plane over deviated end points and the tilt angle
  ``atan(sqrt(a^2+b^2))`` — the paper's pose-misalignment output
  (``ForceDistribution.py:138-162``, README.md:124, C15);
* frame-range-averaged start/end displacement vectors
  (``LocalAnalysis.py:53-94``, C17).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vision_basedsensor_tpu import layout
from vision_basedsensor_tpu.config import AnalysisConfig
from vision_basedsensor_tpu.core.fit import (PlaneFit, fit_plane,
                                             fit_plane_robust, masked_mean)
from vision_basedsensor_tpu.reconstruct.displacement import Reconstruction


class DeviationAnalysis(NamedTuple):
    deviation: jnp.ndarray      # (65, 3) d_tilt - d_vert
    valid: jnp.ndarray          # (65,)
    plane: PlaneFit             # contact plane over deviated end points
    tilt_deg: jnp.ndarray       # scalar pose-misalignment angle
    mean_vector: jnp.ndarray    # (3,) mean deviation vector
    mean_magnitude: jnp.ndarray  # scalar mean |deviation|


class ContactState(NamedTuple):
    """Per-frame contact state — the production-serving pose output."""
    tilt_deg: jnp.ndarray        # (B,) contact-plane tilt per frame
    plane: PlaneFit              # per-frame plane coefficients (each (B,))
    mean_vector: jnp.ndarray     # (B, 3) mean displacement vector
    mean_magnitude: jnp.ndarray  # (B,) mean |displacement|
    valid: jnp.ndarray           # (B,) enough markers to fit a plane


def contact_state_sequence(recon: Reconstruction, cfg: AnalysisConfig,
                           initial_mode: str = "plane") -> ContactState:
    """C14/C15 applied per frame in the hot path: contact-plane fit over each
    frame's cumulative displacement field -> per-frame tilt angle.

    The reference computes tilt once per *experiment pair* offline
    (``ForceDistribution.py:138-162``); for live pose-misalignment
    compensation (README.md:124) the same fit runs on every frame's
    from-first-sighting field — a batched (B, 65) masked lstsq, negligible
    next to detection."""
    table = jnp.asarray(layout.dome_layout()[:, 1:], recon.world.dtype)
    z0 = table[:, 2] if initial_mode == "shell" else jnp.zeros_like(table[:, 2])
    start = jnp.stack([table[:, 0], table[:, 1], z0], axis=-1)   # (65, 3)
    disp = cfg.deviation_scale * recon.from_first                # (B, 65, 3)
    end = start[None] + disp
    valid = recon.seen
    plane = (fit_plane_robust(end, valid) if cfg.robust_plane_fit
             else fit_plane(end, valid))
    mean_vec = masked_mean(disp, valid[..., None], axis=-2)
    mean_mag = masked_mean(recon.from_first_norm, valid, axis=-1)
    return ContactState(tilt_deg=plane.tilt_deg, plane=plane,
                        mean_vector=mean_vec, mean_magnitude=mean_mag,
                        valid=valid.sum(-1) >= 3)


def start_end_displacement(recon: Reconstruction,
                           start_range: tuple[int, int],
                           end_range: tuple[int, int]
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Displacement between frame-range-averaged positions.

    Replicates ``LocalAnalysis.calculate_average_coordinates`` (:53-60):
    positions are averaged over ``frameno in [start, end]`` (inclusive) and
    the displacement is end-average minus start-average. Returns
    ``((65, 3) displacement, (65,) valid)``.
    """
    b = recon.world.shape[0]
    frames = jnp.arange(b)

    def avg(rng):
        in_rng = (frames >= rng[0]) & (frames <= rng[1])
        m = recon.seen & in_rng[:, None]
        return masked_mean(recon.world, m[..., None], axis=0), m.any(axis=0)

    start, s_ok = avg(start_range)
    end, e_ok = avg(end_range)
    ok = s_ok & e_ok
    return jnp.where(ok[:, None], end - start, 0.0), ok


def deviation_field(d_vert: jnp.ndarray, vert_ok: jnp.ndarray,
                    d_tilt: jnp.ndarray, tilt_ok: jnp.ndarray
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-marker deviation ``d_tilt - d_vert`` over the common-id set
    (``ForceDistribution.py:184,197-204``)."""
    ok = vert_ok & tilt_ok
    return jnp.where(ok[:, None], d_tilt - d_vert, 0.0), ok


def analyze_deviation(deviation: jnp.ndarray, valid: jnp.ndarray,
                      cfg: AnalysisConfig,
                      initial_mode: str = "plane") -> DeviationAnalysis:
    """Contact-plane fit + summary over a deviation field.

    ``initial_mode``: 'plane' places start points at Z=0 like the reference's
    default (``ForceDistribution.py:15,222``); 'shell' uses the true dome
    heights. The plane is fitted to start + scaled deviation end points
    (:229-243) and the tilt is reported in degrees.
    """
    table = jnp.asarray(layout.dome_layout()[:, 1:], deviation.dtype)
    z0 = table[:, 2] if initial_mode == "shell" else jnp.zeros_like(table[:, 2])
    start = jnp.stack([table[:, 0], table[:, 1], z0], axis=-1)
    end = start + cfg.deviation_scale * deviation

    plane = (fit_plane_robust(end, valid) if cfg.robust_plane_fit
             else fit_plane(end, valid))
    mean_vec = masked_mean(cfg.deviation_scale * deviation, valid[:, None], axis=0)
    mean_mag = masked_mean(jnp.linalg.norm(deviation, axis=-1), valid)
    return DeviationAnalysis(
        deviation=deviation, valid=valid, plane=plane,
        tilt_deg=plane.tilt_deg, mean_vector=mean_vec, mean_magnitude=mean_mag)
