"""Normalized DLT homography estimation (batched, pure JAX)."""
from __future__ import annotations

import jax.numpy as jnp


def _normalize(pts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley normalization: translate to centroid, scale to mean dist sqrt(2)."""
    c = pts.mean(axis=-2, keepdims=True)
    d = jnp.linalg.norm(pts - c, axis=-1).mean(axis=-1)
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)
    T = jnp.zeros(pts.shape[:-2] + (3, 3), pts.dtype)
    T = T.at[..., 0, 0].set(s).at[..., 1, 1].set(s).at[..., 2, 2].set(1.0)
    T = T.at[..., 0, 2].set(-s * c[..., 0, 0]).at[..., 1, 2].set(-s * c[..., 0, 1])
    pn = (pts - c) * s[..., None, None]
    return pn, T


def fit_homography(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Homography H with ``dst ~ H @ src`` for point sets ``(..., N, 2)``.

    Normalized DLT via SVD; supports arbitrary batch dims (vmapped SVD).
    """
    sn, Ts = _normalize(src)
    dn, Td = _normalize(dst)
    x, y = sn[..., 0], sn[..., 1]
    u, v = dn[..., 0], dn[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., -1, :].reshape(A.shape[:-2] + (3, 3))
    H = jnp.linalg.solve(Td, h @ Ts)
    return H / H[..., 2:3, 2:3]
