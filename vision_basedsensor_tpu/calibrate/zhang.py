"""Intrinsic calibration: Zhang's method, fully on device (reference C10).

Replaces ``cv2.calibrateCamera`` (``intrinsic_calibration.py:97-98``): batched
DLT homographies per view, closed-form K initialization from the absolute
conic constraints, per-view extrinsics, then joint Gauss-Newton refinement of
``[fx, fy, cx, cy, k1, k2, p1, p2, k3] + 6 per view`` against reprojection
residuals (skew fixed at 0, matching OpenCV's default). Fixed iteration
counts, dense linear algebra — everything jits.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vision_basedsensor_tpu.calibrate.homography import fit_homography
from vision_basedsensor_tpu.core import camera as cam_mod
from vision_basedsensor_tpu.core.camera import CameraModel
from vision_basedsensor_tpu.core.transforms import inverse_rodrigues, rodrigues
from vision_basedsensor_tpu.utils.precision import with_x64


class ZhangResult(NamedTuple):
    cam: CameraModel          # intrinsics (+ zero extrinsics)
    rvecs: jnp.ndarray        # (V, 3) per-view rotations
    tvecs: jnp.ndarray        # (V, 3) per-view translations
    mean_reproj_error: jnp.ndarray  # mean per-point pixel error (cv2-style RMS)


def _vij(H: jnp.ndarray, i: int, j: int) -> jnp.ndarray:
    h = H  # (V, 3, 3), columns h[:, :, i]
    return jnp.stack([
        h[:, 0, i] * h[:, 0, j],
        h[:, 0, i] * h[:, 1, j] + h[:, 1, i] * h[:, 0, j],
        h[:, 1, i] * h[:, 1, j],
        h[:, 2, i] * h[:, 0, j] + h[:, 0, i] * h[:, 2, j],
        h[:, 2, i] * h[:, 1, j] + h[:, 1, i] * h[:, 2, j],
        h[:, 2, i] * h[:, 2, j],
    ], axis=-1)


def _intrinsics_from_homographies(H: jnp.ndarray) -> tuple:
    V = jnp.concatenate([_vij(H, 0, 1), _vij(H, 0, 0) - _vij(H, 1, 1)], axis=0)
    _, _, vt = jnp.linalg.svd(V, full_matrices=False)
    b11, b12, b22, b13, b23, b33 = vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = jnp.sqrt(jnp.abs(lam / b11))
    fy = jnp.sqrt(jnp.abs(lam * b11 / (b11 * b22 - b12 * b12)))
    skew = -b12 * fx * fx * fy / lam
    # Zhang's PAPER carries a known typo here (gamma*v0/alpha); the correct
    # identity is u0 = gamma*v0/beta - B13*alpha^2/lambda (divide the skew
    # term by fy). With noisy homographies the /fx form biases the cx INIT
    # by skew*cy*(1/fx - 1/fy); the LM refinement usually washes it out,
    # but a worse start can stall the fixed 30 iterations (round-3 review,
    # confirmed numerically).
    cx = skew * cy / fy - b13 * fx * fx / lam
    return fx, fy, cx, cy


def _extrinsics_from_homography(K_inv: jnp.ndarray, H: jnp.ndarray):
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.linalg.norm(K_inv @ h1)
    # Board must be in front of the camera: fix the homography's sign via
    # t_z > 0 BEFORE forming r3 = r1 x r2 (negating both r1 and r2 leaves
    # their cross product unchanged, so flipping afterwards would break
    # det(R) = +1).
    lam = lam * jnp.sign((K_inv @ h3)[2])
    r1 = lam * (K_inv @ h1)
    r2 = lam * (K_inv @ h2)
    r3 = jnp.cross(r1, r2)
    t = lam * (K_inv @ h3)
    R = jnp.stack([r1, r2, r3], axis=-1)
    # Orthonormalize via SVD.
    u, _, vt = jnp.linalg.svd(R)
    return u @ vt, t


def _pack(fx, fy, cx, cy, dist, rvecs, tvecs):
    return jnp.concatenate([jnp.stack([fx, fy, cx, cy]), dist,
                            rvecs.reshape(-1), tvecs.reshape(-1)])


def _unpack(p, n_views):
    fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    dist = p[4:9]
    r = p[9:9 + 3 * n_views].reshape(n_views, 3)
    t = p[9 + 3 * n_views:].reshape(n_views, 3)
    return fx, fy, cx, cy, dist, r, t


@with_x64
def calibrate_intrinsics(object_points: jnp.ndarray, image_points: jnp.ndarray,
                         refine_iters: int = 30) -> ZhangResult:
    """Full Zhang calibration.

    Args:
      object_points: ``(V, N, 3)`` planar board points (Z = 0).
      image_points: ``(V, N, 2)`` detected corners.
    """
    object_points = jnp.asarray(object_points, jnp.float64)
    image_points = jnp.asarray(image_points, jnp.float64)
    n_views = object_points.shape[0]
    # The closed-form init needs >= 3 views for a determined B system
    # (2V rows vs 6 unknowns; the reference gates identically,
    # intrinsic_calibration.py:92). With fewer, svd(V)'s last row is NOT a
    # null vector and the solver returned confidently-wrong intrinsics
    # with near-zero RMS (round-3 review, confirmed by execution) —
    # enforce here so every caller is covered, not just the image-dir path.
    if n_views < 3:
        raise ValueError(f"Zhang calibration needs >= 3 views, got "
                         f"{n_views}")

    H = fit_homography(object_points[..., :2], image_points)
    fx, fy, cx, cy = _intrinsics_from_homographies(H)
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    K_inv = jnp.linalg.inv(K)
    Rs, ts = jax.vmap(lambda h: _extrinsics_from_homography(K_inv, h))(H)
    rvecs = inverse_rodrigues(Rs)
    dist0 = jnp.zeros(5, jnp.float64)

    def residuals(p):
        fx, fy, cx, cy, dist, r, t = _unpack(p, n_views)
        cam = CameraModel.create(fx, fy, cx, cy, 0.0, dist, dtype=jnp.float64)

        def view(rv, tv, op, ip):
            c = cam._replace(R_wc=rodrigues(rv), T_wc=tv)
            return (cam_mod.project_points(c, op) - ip).reshape(-1)

        return jax.vmap(view)(r, t, object_points, image_points).reshape(-1)

    p = _pack(fx, fy, cx, cy, dist0, rvecs, ts)

    def lm_step(carry, _):
        # Levenberg-Marquardt via the augmented least-squares system
        # [J; sqrt(lam) * diag(col_norms)] dp = [r; 0], solved on J directly
        # (SVD lstsq): the normal equations would square the conditioning
        # (fx <-> k1 <-> t_z valleys) and stall convergence. Undamped GN
        # diverges on nearly-coplanar view sets (rank-deficient conic
        # constraints leave fx/fy unobservable and the full step overshoots);
        # the rejected-step backtracking makes every iteration non-increasing.
        p, lam, cost = carry
        rsd = residuals(p)
        J = jax.jacfwd(residuals)(p)
        col = jnp.maximum(jnp.sqrt(jnp.sum(J * J, axis=0)), 1e-12)
        A = jnp.concatenate([J, jnp.sqrt(lam) * jnp.diag(col)], axis=0)
        b = jnp.concatenate([rsd, jnp.zeros(p.shape[0], p.dtype)])
        dp, *_ = jnp.linalg.lstsq(A, b, rcond=None)
        p_new = p - dp
        new_cost = jnp.sum(residuals(p_new) ** 2)
        accept = new_cost < cost
        return (jnp.where(accept, p_new, p),
                jnp.clip(jnp.where(accept, lam / 3.0, lam * 10.0), 1e-12, 1e10),
                jnp.where(accept, new_cost, cost)), None

    cost0 = jnp.sum(residuals(p) ** 2)
    (p, _, _), _ = jax.lax.scan(lm_step, (p, jnp.asarray(1e-3, p.dtype), cost0),
                                None, length=refine_iters)

    fx, fy, cx, cy, dist, rvecs, tvecs = _unpack(p, n_views)
    cam = CameraModel.create(fx, fy, cx, cy, 0.0, dist, dtype=jnp.float64)
    # cv2.calibrateCamera's returned error is the RMS over all residuals.
    rsd = residuals(p).reshape(-1, 2)
    rms = jnp.sqrt(jnp.mean(jnp.sum(rsd**2, axis=-1)))
    return ZhangResult(cam=cam, rvecs=rvecs, tvecs=tvecs, mean_reproj_error=rms)
