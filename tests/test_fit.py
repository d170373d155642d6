"""Masked fits: plane/tilt parity with numpy lstsq, moment ellipse accuracy."""
import numpy as np

import jax.numpy as jnp

from vision_basedsensor_tpu.core import fit


def test_fit_plane_matches_numpy_lstsq(rng):
    X = rng.uniform(-10, 10, 65)
    Y = rng.uniform(-10, 10, 65)
    Z = 0.13 * X - 0.22 * Y + 1.5 + rng.normal(0, 0.05, 65)
    xyz = jnp.asarray(np.stack([X, Y, Z], -1), jnp.float32)

    res = fit.fit_plane(xyz)
    A = np.vstack([X, Y, np.ones(65)]).T
    coeff, *_ = np.linalg.lstsq(A, Z, rcond=None)
    np.testing.assert_allclose([res.a, res.b, res.c], coeff, atol=1e-4)
    tilt_ref = np.degrees(np.arctan(np.sqrt(coeff[0] ** 2 + coeff[1] ** 2)))
    np.testing.assert_allclose(res.tilt_deg, tilt_ref, atol=1e-4)


def test_fit_plane_respects_mask(rng):
    X = rng.uniform(-10, 10, 40)
    Y = rng.uniform(-10, 10, 40)
    Z = 0.3 * X + 0.1 * Y + 2.0
    Z[30:] += 100.0  # gross outliers, masked away
    xyz = jnp.asarray(np.stack([X, Y, Z], -1), jnp.float32)
    mask = jnp.asarray(np.arange(40) < 30)
    res = fit.fit_plane(xyz, mask)
    np.testing.assert_allclose([res.a, res.b, res.c], [0.3, 0.1, 2.0], atol=1e-3)


def test_fit_plane_known_tilt():
    # A plane tilted by exactly 15 deg around the Y axis (reference pose, README.md:146).
    theta = np.deg2rad(15.0)
    X, Y = np.meshgrid(np.linspace(-10, 10, 8), np.linspace(-10, 10, 8))
    Z = np.tan(theta) * X
    xyz = jnp.asarray(np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1), jnp.float32)
    res = fit.fit_plane(xyz)
    np.testing.assert_allclose(float(res.tilt_deg), 15.0, atol=1e-3)


def _render_filled_ellipse(h, w, cx, cy, a, b, angle_deg):
    """Binary image of a filled ellipse with semi-axes (a, b)."""
    yy, xx = np.mgrid[:h, :w]
    t = np.deg2rad(angle_deg)
    xr = (xx - cx) * np.cos(t) + (yy - cy) * np.sin(t)
    yr = -(xx - cx) * np.sin(t) + (yy - cy) * np.cos(t)
    return ((xr / a) ** 2 + (yr / b) ** 2 <= 1.0).astype(np.float32)


def test_ellipse_from_moments_recovers_parameters():
    h = w = 96
    cx, cy, a, b, ang = 47.3, 50.6, 14.0, 9.0, 30.0
    img = _render_filled_ellipse(h, w, cx, cy, a, b, ang)
    yy, xx = np.mgrid[:h, :w]
    res = fit.ellipse_from_moments(
        jnp.asarray(img.ravel()), jnp.asarray(xx.ravel(), jnp.float32),
        jnp.asarray(yy.ravel(), jnp.float32))
    np.testing.assert_allclose(np.asarray(res.center), [cx, cy], atol=0.15)
    # Full axes = 2a, 2b; discretization allows a few percent.
    np.testing.assert_allclose(float(res.major), 2 * a, rtol=0.03)
    np.testing.assert_allclose(float(res.minor), 2 * b, rtol=0.03)
    assert abs(float(res.angle_deg) - ang) < 2.0


def test_ellipse_from_moments_matches_cv2_fitellipse():
    import pytest
    cv2 = pytest.importorskip("cv2")
    img = _render_filled_ellipse(96, 96, 48.0, 48.0, 12.0, 8.0, 55.0)
    contours, _ = cv2.findContours((img * 255).astype(np.uint8),
                                   cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    (ecx, ecy), (w_fit, h_fit), ang_fit = cv2.fitEllipse(contours[0])
    major_cv, minor_cv = max(w_fit, h_fit), min(w_fit, h_fit)

    yy, xx = np.mgrid[:96, :96]
    res = fit.ellipse_from_moments(
        jnp.asarray(img.ravel()), jnp.asarray(xx.ravel(), jnp.float32),
        jnp.asarray(yy.ravel(), jnp.float32))
    # Estimators differ (moments vs contour algebraic fit) and cv2 itself is
    # biased low on small discrete ellipses (here truth minor=16.0: ours 16.15,
    # cv2 15.34), so cross-agreement is asserted to ~6%; accuracy vs ground
    # truth is covered (tighter) by the test above.
    np.testing.assert_allclose(np.asarray(res.center), [ecx, ecy], atol=0.5)
    np.testing.assert_allclose(float(res.major), major_cv, rtol=0.06)
    np.testing.assert_allclose(float(res.minor), minor_cv, rtol=0.06)
