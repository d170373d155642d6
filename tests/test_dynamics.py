"""Dynamic contact signal + stage-protocol (file artifact) integration."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end; core suite = -m 'not slow'

import jax.numpy as jnp

from vision_basedsensor_tpu.analysis.dynamics import contact_signal, moving_average
from vision_basedsensor_tpu.config import PipelineConfig, ReconstructConfig
from vision_basedsensor_tpu.reconstruct import displacement_scan


def test_moving_average_zero_phase():
    t = np.arange(200)
    x = np.sin(t / 15.0) + 0.3 * np.sin(t * 2.0)
    y = np.asarray(moving_average(jnp.asarray(x), 11))
    # Smoother (noise gone) and phase-aligned (peak positions preserved).
    assert np.std(np.diff(y)) < 0.5 * np.std(np.diff(x))
    p_true = np.argmax(x[20:80]) + 20
    p_filt = np.argmax(y[20:80]) + 20
    assert abs(p_true - p_filt) <= 3


def test_contact_signal_tracks_plateau():
    """Simulated polishing: ramp to -9.8 mm Z plateau with dropout noise ->
    filtered signal plateaus near -9.8 mm and force near -3.8 N
    (README.md:153-161 ratio)."""
    rng = np.random.default_rng(0)
    B = 400
    z = np.concatenate([np.linspace(0, -9.8, 100), np.full(300, -9.8)])
    world = np.zeros((B, 65, 3), np.float32)
    world[:, :, 2] = z[:, None] + rng.normal(0, 0.05, (B, 65))
    seen = rng.random((B, 65)) > 0.15  # rotating-tool dropouts
    seen[0] = True
    recon = displacement_scan(jnp.asarray(world), jnp.asarray(seen),
                              ReconstructConfig(warmup_frames=0))
    sig = contact_signal(recon)
    plateau = np.asarray(sig.filtered)[150:]
    np.testing.assert_allclose(plateau.mean(), -9.8, atol=0.15)
    np.testing.assert_allclose(np.asarray(sig.force_n)[150:].mean(), -3.8,
                               atol=0.1)
    assert np.asarray(sig.num_tracked).min() > 40


def test_stage_protocol_file_roundtrip(tmp_path):
    """The reference's file-per-stage protocol end-to-end: track -> CSV ->
    reconstruct -> coords table -> ring analysis, all through disk artifacts
    (SURVEY.md §5.4)."""
    from vision_basedsensor_tpu.analysis import start_end_displacement
    from vision_basedsensor_tpu.io.table import (
        read_coords_table,
        read_tracking_csv,
        write_coords_table,
        write_tracking_csv,
    )
    from vision_basedsensor_tpu.pipeline import run_video
    from vision_basedsensor_tpu.reconstruct import reconstruct_sequence
    from vision_basedsensor_tpu.synth import default_scene, render_frames
    from vision_basedsensor_tpu.track.associate import TrackedFrames

    cfg = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))
    scene = default_scene(240, 320)
    d = jnp.zeros((4, 65, 3), jnp.float32)
    d = d.at[2:, :, 2].add(-0.8)
    frames = render_frames(scene, d)
    out = run_video(frames, scene.cam, cfg, apply_warmup=False)

    # Stage 1 -> 2 via CSV.
    csv_path = str(tmp_path / "markers.csv")
    write_tracking_csv(csv_path, out.tracked)
    data = read_tracking_csv(csv_path)
    tracked2 = TrackedFrames(
        xy=jnp.asarray(data["xy"], jnp.float32),
        ref_xy=jnp.asarray(data["ref_xy"], jnp.float32),
        axes=jnp.asarray(data["axes"], jnp.float32),
        angle=jnp.asarray(data["angle"], jnp.float32),
        ring=out.tracked.ring,
        valid=jnp.asarray(data["valid"]))
    recon2 = reconstruct_sequence(scene.cam, tracked2, cfg.reconstruct,
                                  apply_warmup=False)

    # Stage 2 -> 3 via coords table.
    coords_path = str(tmp_path / "coords.xlsx")
    write_coords_table(coords_path, recon2)
    back = read_coords_table(coords_path)

    # Stage 3 -> 4: ring displacement from the file-loaded field.
    from vision_basedsensor_tpu.reconstruct.displacement import displacement_scan
    recon3 = displacement_scan(jnp.asarray(back["world"], jnp.float32),
                               jnp.asarray(back["seen"]),
                               cfg.reconstruct)
    disp, ok = start_end_displacement(recon3, (0, 1), (2, 3))
    mags = np.linalg.norm(np.asarray(disp)[np.asarray(ok)], axis=1)
    np.testing.assert_allclose(mags.mean(), 0.8, atol=0.1)
