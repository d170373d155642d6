"""Streaming pipeline: chunked == monolithic; session checkpoint/resume;
live MJPEG loop against the in-process capture server."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu.config import (
    PipelineConfig,
    ReconstructConfig,
    TrackConfig,
)
from vision_basedsensor_tpu.pipeline import StreamingPipeline, run_video
from vision_basedsensor_tpu.synth import default_scene, render_frames


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))
    scene = default_scene(height=240, width=320)
    d = jnp.zeros((12, 65, 3), jnp.float32)
    d = d.at[:, :, 2].add(-0.05 * jnp.arange(12)[:, None])
    frames = render_frames(scene, d)
    return cfg, scene, frames


def test_chunked_equals_monolithic(setup):
    cfg, scene, frames = setup
    mono = run_video(frames, scene.cam, cfg, apply_warmup=False)

    sp = StreamingPipeline(scene.cam, cfg)
    outs = [sp.process(frames[i:i + 4]) for i in range(0, 12, 4)]
    cum = np.concatenate([np.asarray(o.recon.cum_path) for o in outs])
    ffn = np.concatenate([np.asarray(o.recon.from_first_norm) for o in outs])

    # The photometric axis calibration is a per-batch scalar (ops/moments.py
    # finalize), so chunking shifts absolute depths by up to the clamp width
    # (~1% -> ~0.2 mm at this scene's 20 mm depth); the displacement
    # *structure* must match.
    np.testing.assert_allclose(cum, np.asarray(mono.recon.cum_path), atol=0.2)
    np.testing.assert_allclose(ffn, np.asarray(mono.recon.from_first_norm), atol=0.2)
    np.testing.assert_allclose(np.diff(ffn, axis=0),
                               np.diff(np.asarray(mono.recon.from_first_norm), axis=0),
                               atol=0.12)


def test_session_checkpoint_resume(setup, tmp_path):
    cfg, scene, frames = setup
    from vision_basedsensor_tpu.io.session import load_session, save_session

    sp = StreamingPipeline(scene.cam, cfg)
    sp.process(frames[:6])
    save_session(str(tmp_path / "sess"), sp.ref, cfg, scan_carry=sp.carry)

    ref2, cfg2, calib2, carry2 = load_session(str(tmp_path / "sess"))
    assert calib2 is None
    sp2 = StreamingPipeline(scene.cam, cfg2, ref=ref2, carry=carry2)
    out_resumed = sp2.process(frames[6:])

    sp_full = StreamingPipeline(scene.cam, cfg)
    sp_full.process(frames[:6])
    out_full = sp_full.process(frames[6:])
    np.testing.assert_allclose(np.asarray(out_resumed.recon.cum_path),
                               np.asarray(out_full.recon.cum_path), atol=1e-5)


def test_live_mjpeg_loop():
    """End-to-end: in-process MJPEG server w/ synthetic dome camera ->
    MJPEG client -> streaming pipeline."""
    import dataclasses

    from vision_basedsensor_tpu.capture import CameraHandler, StreamingServer
    from vision_basedsensor_tpu.capture.server import SyntheticCamera
    from vision_basedsensor_tpu.config import CaptureConfig
    from vision_basedsensor_tpu.io.mjpeg import MjpegVideoSource

    cap_cfg = dataclasses.replace(CaptureConfig(), port=0, width=320,
                                  height=240, fps=30)
    scene = default_scene(240, 320)
    camera = CameraHandler(cap_cfg, None, synthetic=SyntheticCamera(cap_cfg, scene))
    server = StreamingServer(cap_cfg, camera)
    server.start()
    try:
        cfg = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))
        sp = StreamingPipeline(scene.cam, cfg)
        src = MjpegVideoSource(f"http://127.0.0.1:{server.port}/stream",
                               max_frames=4)
        outs = list(sp.run(src, batch_size=2))
        assert sp.frames_seen == 4
        seen = np.concatenate([np.asarray(o.recon.seen) for o in outs])
        # The synthetic camera shows the dome: most markers tracked live.
        assert seen.sum(axis=1).min() >= 60
    finally:
        server.stop()
