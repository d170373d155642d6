"""I/O round-trips: tracking CSV, coords table, experiment TXT, video sources."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu.config import ReconstructConfig
from vision_basedsensor_tpu.io import table
from vision_basedsensor_tpu.io.video import ArrayVideoSource, device_feed
from vision_basedsensor_tpu.reconstruct import displacement_scan
from vision_basedsensor_tpu.track.associate import TrackedFrames


def _tracked(T=3):
    rng = np.random.default_rng(0)
    xy = rng.uniform(50, 400, (T, 65, 2)).astype(np.float32)
    valid = rng.random((T, 65)) > 0.2
    from vision_basedsensor_tpu import layout
    return TrackedFrames(
        xy=jnp.asarray(xy),
        ref_xy=jnp.asarray(xy[0]),
        axes=jnp.asarray(rng.uniform(10, 25, (T, 65, 2)).astype(np.float32)),
        angle=jnp.asarray(rng.uniform(0, 180, (T, 65)).astype(np.float32)),
        ring=jnp.asarray(layout.marker_rings().astype(np.int32)),
        valid=jnp.asarray(valid))


def test_tracking_csv_roundtrip(tmp_path):
    tracked = _tracked()
    p = str(tmp_path / "markers.csv")
    table.write_tracking_csv(p, tracked)
    back = table.read_tracking_csv(p)
    valid = np.asarray(tracked.valid)
    np.testing.assert_array_equal(back["valid"], valid)
    np.testing.assert_allclose(back["xy"][valid], np.asarray(tracked.xy)[valid],
                               atol=1e-3)
    np.testing.assert_allclose(back["axes"][valid], np.asarray(tracked.axes)[valid],
                               atol=1e-3)


def test_coords_table_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    world = rng.normal(0, 5, (4, 65, 3)).astype(np.float32)
    seen = rng.random((4, 65)) > 0.3
    recon = displacement_scan(jnp.asarray(world), jnp.asarray(seen),
                              ReconstructConfig(warmup_frames=0))
    for ext in ("csv", "xlsx"):
        p = str(tmp_path / f"coords.{ext}")
        table.write_coords_table(p, recon)
        back = table.read_coords_table(p)
        np.testing.assert_array_equal(back["seen"], seen)
        np.testing.assert_allclose(back["world"][seen], world[seen], atol=1e-5)


def test_experiment_txt_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    start = rng.normal(0, 5, (65, 3))
    end = start + rng.normal(0, 1, (65, 3))
    valid = rng.random(65) > 0.1
    p = str(tmp_path / "exp.txt")
    table.write_experiment_txt(p, start, end, valid)
    disp, ok = table.read_experiment_txt(p)
    np.testing.assert_array_equal(ok, valid)
    np.testing.assert_allclose(disp[valid], (end - start)[valid], atol=1e-5)


def test_experiment_txt_with_header_junk(tmp_path):
    p = str(tmp_path / "exp.txt")
    with open(p, "w") as f:
        f.write("Experiment log 2026-01-01\nsome preamble\n"
                "MarkerID X_start Y_start Z_start X_end Y_end Z_end\n"
                "1 0 0 0 0 0 -1.5\n"
                "9 1 2 0.9 1 2 0.4\n")
    disp, ok = table.read_experiment_txt(p)
    assert ok[0] and ok[8] and ok.sum() == 2
    np.testing.assert_allclose(disp[0], [0, 0, -1.5])
    np.testing.assert_allclose(disp[8], [0, 0, -0.5])


def test_array_video_source_batches():
    frames = np.zeros((10, 8, 8), np.uint8)
    src = ArrayVideoSource(frames)
    sizes = [b.shape[0] for b in src.batches(4)]
    assert sizes == [4, 4, 2]


def test_device_feed_yields_all_frames():
    frames = np.arange(12 * 4 * 4, dtype=np.uint8).reshape(12, 4, 4)
    src = ArrayVideoSource(frames)
    got = [np.asarray(b) for b in device_feed(src, 5)]
    np.testing.assert_array_equal(np.concatenate(got), frames)
