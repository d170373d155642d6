"""Difference-of-Gaussians band-pass + area mask with explicit uint8 semantics.

Implements the reference's marker-region detector
(``marker_detection.py:117-129``): two Gaussian blurs, ``large - small + 15``
computed in uint8 (which wraps modulo 256 — SURVEY.md §2.2 quirk 3; the
detector's selectivity against bright-centered regions depends on that wrap),
then an ``inRange(lo, hi)`` mask. Here the wrap is a documented modular op on
integer-quantized float blurs, so behavior is identical but explicit.
"""
from __future__ import annotations

import jax.numpy as jnp

from vision_basedsensor_tpu.config import DetectProfile
from vision_basedsensor_tpu.core.imaging import gaussian_blur


def dog_area_mask(gray: jnp.ndarray, profile: DetectProfile,
                  offset: int = 15, compute_dtype=None) -> jnp.ndarray:
    """Gray frames ``(..., H, W)`` (0..255 floats) -> boolean area mask.

    Exactly replicates ``im_blur_8 - im_blur_3 + 15`` in uint8 followed by
    ``cv2.inRange(., lo, hi)``: blurs are quantized to integers (uint8
    outputs) and the difference is reduced modulo 256 before the range test.
    """
    b_small = gaussian_blur(gray, profile.blur_small_ksize, profile.blur_small_sigma,
                            quantize=True, compute_dtype=compute_dtype)
    b_large = gaussian_blur(gray, profile.blur_large_ksize, profile.blur_large_sigma,
                            quantize=True, compute_dtype=compute_dtype)
    d = b_large - b_small + float(offset)
    wrapped = jnp.mod(d, 256.0)
    return (wrapped >= profile.dog_threshold) & (wrapped <= profile.dog_high)
