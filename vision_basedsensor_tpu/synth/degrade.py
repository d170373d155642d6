"""Optical degradations for robustness evaluation of the detector.

The reference's physical rig suffered all three of these (README.md:103-121
probe experiments, README.md:153-177 rotating-bonnet polishing): uneven LED
illumination across the dome, focus drift of the endoscopic lens, and motion
blur from the spinning tool. The reference never quantified their effect —
its only robustness evidence is the published result figures. These
transforms recreate each effect synthetically so tests can pin explicit
centroid/tilt degradation envelopes (VERDICT round 3, next 6).

All transforms are pure JAX over ``(B, H, W)`` float frames in 0..255 and
compose freely.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from vision_basedsensor_tpu.core.imaging import gaussian_blur


def illumination_gradient(frames: jnp.ndarray, strength: float = 0.4,
                          axis: str = "x") -> jnp.ndarray:
    """Linear illumination falloff: gain ramps from ``1 - strength`` at one
    edge to 1.0 at the other (a LED ring illuminating the dome from one side;
    the reference's 12-LED ring at brightness 20, ``collecting.py:34-36``,
    gives exactly this kind of gradient when LEDs age unevenly)."""
    h, w = frames.shape[-2:]
    n = w if axis == "x" else h
    ramp = ((1.0 - strength)
            + strength * jnp.arange(n, dtype=jnp.float32) / (n - 1))
    gain = ramp[None, None, :] if axis == "x" else ramp[None, :, None]
    return jnp.clip(frames * gain, 0.0, 255.0)


def vignette(frames: jnp.ndarray, strength: float = 0.4) -> jnp.ndarray:
    """Radial falloff: gain 1 at center, ``1 - strength`` at the corners —
    the endoscopic lens + in-bonnet LED geometry both vignette."""
    h, w = frames.shape[-2:]
    ys = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2) / (h / 2)
    xs = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2) / (w / 2)
    r2 = (ys[:, None] ** 2 + xs[None, :] ** 2) / 2.0  # 1.0 at the corners
    gain = 1.0 - strength * r2
    return jnp.clip(frames * gain[None], 0.0, 255.0)


def defocus(frames: jnp.ndarray, sigma_px: float) -> jnp.ndarray:
    """Defocus blur as an isotropic Gaussian PSF of the given sigma (the
    thin-lens defocus disk is well approximated by a Gaussian at the small
    blur diameters a drifting endoscope produces)."""
    if sigma_px <= 0:
        return frames
    k = int(2 * np.ceil(3 * sigma_px) + 1)
    return gaussian_blur(frames, k, float(sigma_px))


def motion_blur(frames: jnp.ndarray, length_px: float,
                angle_deg: float = 0.0) -> jnp.ndarray:
    """Linear motion blur: average of the frame translated along a segment
    of ``length_px`` at ``angle_deg`` (the bonnet spins under the camera, so
    markers streak tangentially; ~2200-frame polishing demo README.md:153).

    Implemented as a normalized line-kernel convolution via N shifted
    bilinear samples (N = ceil(length)+1, exact for the sub-pixel segment).
    """
    n = max(int(np.ceil(length_px)) + 1, 2)
    if length_px <= 0:
        return frames
    ts = np.linspace(-0.5, 0.5, n) * length_px
    dx = ts * np.cos(np.deg2rad(angle_deg))
    dy = ts * np.sin(np.deg2rad(angle_deg))
    acc = jnp.zeros_like(frames)
    for sx, sy in zip(dx, dy):
        acc = acc + _shift_bilinear(frames, float(sx), float(sy))
    return acc / n


def _shift_bilinear(frames: jnp.ndarray, dx: float, dy: float) -> jnp.ndarray:
    """Translate by a sub-pixel offset with bilinear sampling (edge clamp)."""
    ix, fx = int(np.floor(dx)), dx - np.floor(dx)
    iy, fy = int(np.floor(dy)), dy - np.floor(dy)

    def sh(f, ox, oy):
        h, w = f.shape[-2:]
        ys = jnp.clip(jnp.arange(h) - oy, 0, h - 1)
        xs = jnp.clip(jnp.arange(w) - ox, 0, w - 1)
        return f[..., ys[:, None], xs[None, :]]

    return ((1 - fx) * (1 - fy) * sh(frames, ix, iy)
            + fx * (1 - fy) * sh(frames, ix + 1, iy)
            + (1 - fx) * fy * sh(frames, ix, iy + 1)
            + fx * fy * sh(frames, ix + 1, iy + 1))


def sensor_noise(frames: jnp.ndarray, sigma: float, seed: int = 0) -> jnp.ndarray:
    """Additive Gaussian read noise (the camera's JPEG q70 stream carries
    ~1-2 gray levels of it; higher values model gain cranked for dim LEDs)."""
    import jax
    noise = sigma * jax.random.normal(jax.random.PRNGKey(seed), frames.shape,
                                      frames.dtype)
    return jnp.clip(frames + noise, 0.0, 255.0)
