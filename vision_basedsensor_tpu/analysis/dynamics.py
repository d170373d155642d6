"""Dynamic contact monitoring: aggregate displacement signal + force indicator.

The reference's polishing-process demo (README.md:153-177) plots the
*filtered total marker Z-displacement* over ~2200 frames of a rotating
bonnet and shows it tracking a commercial force sensor's FZ channel
(``img/total_marker_displacement.png``: ~-9.8 mm plateau vs ~-3.8 N). This
module provides that signal path as jitted ops:

* per-frame aggregate displacement (mean/sum over tracked markers, Z or
  magnitude) robust to dropouts via masks;
* zero-phase moving-average filtering (forward+backward box, the standard
  "filtered" trace for a rotating-tool signal);
* a linear contact-force indicator ``F = stiffness * displacement`` with a
  calibration constant (the reference never converts to Newtons — it
  overlays scaled traces; the default constant reproduces its figure's
  ~-3.8 N per ~-9.8 mm ratio).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vision_basedsensor_tpu.core.fit import masked_mean
from vision_basedsensor_tpu.reconstruct.displacement import Reconstruction

# README.md:153-161: ~-3.8 N at ~-9.8 mm total Z displacement.
DEFAULT_STIFFNESS_N_PER_MM = 3.8 / 9.8


class ContactSignal(NamedTuple):
    raw: jnp.ndarray        # (B,) per-frame aggregate displacement
    filtered: jnp.ndarray   # (B,) zero-phase smoothed
    force_n: jnp.ndarray    # (B,) linear force indicator
    num_tracked: jnp.ndarray  # (B,) markers contributing per frame


def moving_average(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Zero-phase (forward+backward) box filter with edge renormalization."""
    if window <= 1:
        return x
    k = jnp.ones(window, x.dtype)
    num = jnp.convolve(x, k, mode="same")
    den = jnp.convolve(jnp.ones_like(x), k, mode="same")
    y = num / den
    num2 = jnp.convolve(y[::-1], k, mode="same")
    # The backward pass's coverage at position j is den[j] — coverage is a
    # function of position for ANY same-mode convolution of this length —
    # not den[::-1] (which mis-scales the edges for even windows, where
    # "same" centering makes den asymmetric).
    return (num2 / den)[::-1]


def contact_signal(recon: Reconstruction, component: str = "z",
                   window: int = 15,
                   stiffness_n_per_mm: float = DEFAULT_STIFFNESS_N_PER_MM
                   ) -> ContactSignal:
    """Aggregate displacement-from-start across markers, per frame.

    ``component``: 'z' (the reference's total-Z trace), or 'norm' for the
    Euclidean magnitude.
    """
    if component == "z":
        per_marker = recon.from_first[..., 2]
    else:
        per_marker = recon.from_first_norm
    raw = masked_mean(per_marker, recon.seen, axis=1)
    filt = moving_average(raw, window)
    return ContactSignal(
        raw=raw,
        filtered=filt,
        force_n=stiffness_n_per_mm * filt,
        num_tracked=recon.seen.sum(axis=1),
    )
