"""Plot modules render without error and produce non-trivial files."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end; core suite = -m 'not slow'

import jax.numpy as jnp

pytest.importorskip("matplotlib")

from vision_basedsensor_tpu.analysis import analyze_deviation
from vision_basedsensor_tpu.analysis.plots import (
    plot_deviation_field,
    plot_frame_positions,
    plot_marker_analysis,
    plot_marker_series,
    plot_ring_displacement,
)
from vision_basedsensor_tpu.calibrate.plots import (
    plot_board_poses,
    plot_extrinsic_result,
    plot_undistort_comparison,
)
from vision_basedsensor_tpu.config import AnalysisConfig, ReconstructConfig
from vision_basedsensor_tpu.core.camera import CameraModel
from vision_basedsensor_tpu.reconstruct import displacement_scan
from vision_basedsensor_tpu.synth import tilt_deviation_field


@pytest.fixture
def recon():
    rng = np.random.default_rng(0)
    world = rng.normal(0, 5, (6, 65, 3)).astype(np.float32)
    world[:, :, 2] += np.arange(6)[:, None]
    seen = np.ones((6, 65), bool)
    return displacement_scan(jnp.asarray(world), jnp.asarray(seen),
                             ReconstructConfig(warmup_frames=0))


def _check(path):
    assert os.path.exists(path) and os.path.getsize(path) > 5000


def test_deviation_plot(tmp_path):
    dev = tilt_deviation_field(15.0, compression_mm=0.0)
    res = analyze_deviation(dev, jnp.ones(65, bool), AnalysisConfig())
    p = str(tmp_path / "dev.png")
    plot_deviation_field(res, p)
    _check(p)


def test_ring_plot(tmp_path):
    d = np.zeros((65, 3)); d[:, 2] = -1.0
    p = str(tmp_path / "ring.png")
    plot_ring_displacement(jnp.asarray(d), jnp.ones(65, bool),
                           list(range(8, 20)), p)
    _check(p)


def test_frame_and_series_plots(recon, tmp_path):
    p1 = str(tmp_path / "frame0.png")
    plot_frame_positions(recon, 0, p1)
    _check(p1)
    p2 = str(tmp_path / "series_xyz.png")
    plot_marker_series(recon, 1, p2, mode="XYZ")
    _check(p2)
    p3 = str(tmp_path / "series_scalar.png")
    plot_marker_series(recon, 1, p3, mode="SCALAR")
    _check(p3)
    p4 = str(tmp_path / "analysis.png")
    plot_marker_analysis(recon, 1, p4)
    _check(p4)


def test_calibration_plots(tmp_path, rng):
    cam = CameraModel.create(300.0, 300.0, 160.0, 120.0,
                             dist=np.array([-0.2, 0.05, 0.0, 0.0, 0.0]))
    img = rng.random((240, 320)).astype(np.float32) * 255
    p1 = str(tmp_path / "undist.png")
    plot_undistort_comparison(img, cam, p1)
    _check(p1)

    rvecs = rng.normal(0, 0.2, (4, 3))
    tvecs = np.tile([0.0, 0.0, 60.0], (4, 1)) + rng.normal(0, 3, (4, 3))
    p2 = str(tmp_path / "poses.png")
    plot_board_poses(rvecs, tvecs, (6, 6), 3.0, p2)
    _check(p2)

    wp = rng.uniform(-15, 15, (30, 3))
    p3 = str(tmp_path / "extr.png")
    plot_extrinsic_result(wp, np.eye(3), np.array([0, 0, 60.0]), p3)
    _check(p3)
