"""Per-marker displacement statistics (reference C18 + stats CSV).

Mask-aware summaries matching ``3d_reconstruction.analyze_displacement``'s
aggregation (:397-400: mean/std/max of per-step displacement + final
cumulative) and ``MarkerDisplacement``'s per-marker series (positions over
time, scalar displacement from frame 0 — the latter is already a field of
``Reconstruction``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vision_basedsensor_tpu.core.fit import masked_mean
from vision_basedsensor_tpu.reconstruct.displacement import Reconstruction


class DisplacementStats(NamedTuple):
    mean: jnp.ndarray   # (65,) mean per-step displacement
    std: jnp.ndarray    # (65,)
    max: jnp.ndarray    # (65,)
    final_cumulative: jnp.ndarray  # (65,) last cumulative path length
    count: jnp.ndarray  # (65,) number of valid steps


def displacement_statistics(recon: Reconstruction) -> DisplacementStats:
    m = recon.step_valid
    mean = masked_mean(recon.step_norm, m, axis=0)
    var = masked_mean((recon.step_norm - mean[None, :]) ** 2, m, axis=0)
    # Bessel correction to match pandas' default std (ddof=1), including
    # its NaN for a single observation (n-1 = 0), where clamping the
    # denominator silently produced 0.0.
    n = m.sum(axis=0)
    var = jnp.where(n >= 2, var * n / jnp.maximum(n - 1, 1), jnp.nan)
    mx = jnp.max(jnp.where(m, recon.step_norm, -jnp.inf), axis=0)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    return DisplacementStats(
        mean=mean, std=jnp.sqrt(var), max=mx,
        final_cumulative=recon.cum_path[-1], count=n)
