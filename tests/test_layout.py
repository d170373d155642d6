"""Layout generation must reproduce the reference's embedded marker table.

Oracle values are read from code/ForceDistribution/ForceDistribution.py:29-95
(data, not code). We spot-check every ring plus verify global agreement to the
table's 0.01 mm quantization.
"""
import numpy as np

from vision_basedsensor_tpu import layout

# Full 65-row oracle: (id, X, Y, Z) — the reference's embedded ground truth.
REFERENCE_TABLE = np.array([
    [1, 0.00, 0.00, 0.00],
    [2, -3.02, 1.74, 0.23], [3, 0.00, 3.49, 0.23], [4, 3.02, 1.74, 0.23],
    [5, 3.02, -1.74, 0.23], [6, 0.00, -3.49, 0.23], [7, -3.02, -1.74, 0.23],
    [8, -3.46, 5.99, 0.90], [9, 0.00, 6.92, 0.90], [10, 3.46, 5.99, 0.90],
    [11, 5.99, 3.46, 0.90], [12, 6.92, 0.00, 0.90], [13, 5.99, -3.46, 0.90],
    [14, 3.46, -5.99, 0.90], [15, 0.00, -6.92, 0.90], [16, -3.46, -5.99, 0.90],
    [17, -5.99, -3.46, 0.90], [18, -6.92, 0.00, 0.90], [19, -5.99, 3.46, 0.90],
    [20, -6.58, 7.84, 2.01], [21, -3.50, 9.61, 2.01], [22, 0.00, 10.23, 2.01],
    [23, 3.50, 9.61, 2.01], [24, 6.58, 7.84, 2.01], [25, 8.86, 5.11, 2.01],
    [26, 10.07, 1.78, 2.01], [27, 10.07, -1.78, 2.01], [28, 8.86, -5.11, 2.01],
    [29, 6.58, -7.84, 2.01], [30, 3.50, -9.61, 2.01], [31, 0.00, -10.23, 2.01],
    [32, -3.50, -9.61, 2.01], [33, -6.58, -7.84, 2.01], [34, -8.86, -5.11, 2.01],
    [35, -10.07, -1.78, 2.01], [36, -10.07, 1.78, 2.01], [37, -8.86, 5.11, 2.01],
    [38, -9.45, 9.45, 3.55], [39, -6.69, 11.58, 3.55], [40, -3.46, 12.92, 3.55],
    [41, 0.00, 13.37, 3.55], [42, 3.46, 12.92, 3.55], [43, 6.69, 11.58, 3.55],
    [44, 9.45, 9.45, 3.55], [45, 11.58, 6.69, 3.55], [46, 12.92, 3.46, 3.55],
    [47, 13.37, 0.00, 3.55], [48, 12.92, -3.46, 3.55], [49, 11.58, -6.69, 3.55],
    [50, 9.45, -9.45, 3.55], [51, 6.69, -11.58, 3.55], [52, 3.46, -12.92, 3.55],
    [53, 0.00, -13.37, 3.55], [54, -3.46, -12.92, 3.55], [55, -6.69, -11.58, 3.55],
    [56, -9.45, -9.45, 3.55], [57, -11.58, -6.69, 3.55], [58, -12.92, -3.46, 3.55],
    [59, -13.37, 0.00, 3.55], [60, -12.92, 3.46, 3.55], [61, -11.58, 6.69, 3.55],
    [62, 0.00, 16.29, 5.47], [63, 16.29, 0.00, 5.47], [64, 0.00, -16.29, 5.47],
    [65, -16.29, 0.00, 5.47],
])


def test_counts():
    assert layout.NUM_MARKERS == 65
    assert layout.RING_COUNTS == (1, 6, 12, 18, 24, 4)


def test_dome_layout_matches_reference_table():
    table = layout.dome_layout()
    assert table.shape == (65, 4)
    np.testing.assert_array_equal(table[:, 0], REFERENCE_TABLE[:, 0])
    # Reference coordinates are quantized to 0.01 mm and internally
    # inconsistent at the half-quantum level (e.g. ids 40/46 imply
    # r4*cos(15deg)=12.92 while ids 44/50 imply 13.37*cos(45deg)=9.45), so
    # agreement is asserted to 0.006 mm — well below detection noise.
    err = np.abs(table[:, 1:] - REFERENCE_TABLE[:, 1:])
    assert err.max() <= 0.006, f"max deviation {err.max()}"


def test_spherical_cap_consistency():
    # Ring heights are consistent with a ~27 mm spherical cap (renderer model).
    r = np.asarray(layout.RING_RADII_MM[1:])
    z = np.asarray(layout.RING_HEIGHTS_MM[1:])
    R = layout.DOME_RADIUS_MM
    z_pred = R - np.sqrt(R**2 - r**2)
    assert np.abs(z_pred - z).max() < 0.02


def test_ring_angle_bijection_roundtrip():
    ids = np.arange(1, 66)
    rings, angles = layout.id_to_ring_angle(ids)
    back = layout.ring_angle_to_id(rings, angles)
    np.testing.assert_array_equal(back, ids)


def test_ring_angle_bijection_tolerates_noise():
    ids = np.arange(2, 66)
    rings, angles = layout.id_to_ring_angle(ids)
    rng = np.random.default_rng(1)
    # Perturb angles by up to 40% of the ring step: must still resolve.
    steps = np.abs(np.asarray(layout.RING_STEP_DEG))[rings]
    noisy = angles + rng.uniform(-0.4, 0.4, size=angles.shape) * steps
    back = layout.ring_angle_to_id(rings, noisy)
    np.testing.assert_array_equal(back, ids)
