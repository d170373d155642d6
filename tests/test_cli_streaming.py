"""Round-3 CLI additions: streaming track/tilt, indent, record, and the
streaming-pipeline shape/warmup semantics they rely on."""
import dataclasses
import os
import threading
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end; core suite = -m 'not slow'

import jax.numpy as jnp

from vision_basedsensor_tpu.cli.main import main
from vision_basedsensor_tpu.synth import (
    default_scene,
    indentation_staircase,
    render_frames,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def long_video_npy(tmp_path_factory):
    """9 frames so --chunk 4 exercises full + ragged chunks."""
    p = tmp_path_factory.mktemp("cli_stream")
    scene = default_scene(240, 320)
    d = jnp.zeros((9, 65, 3), jnp.float32)
    d = d.at[:, :, 2].add(-0.05 * jnp.arange(9)[:, None])
    frames = np.asarray(render_frames(scene, d)).astype(np.uint8)
    path = str(p / "video.npy")
    np.save(path, frames)
    return path


def test_track_streaming_csv_identical_to_batch(long_video_npy, tmp_path,
                                                capsys):
    """cmd_track now streams in bounded memory (VERDICT round 2, #5): the
    CSV must be byte-identical to the all-in-RAM batch path."""
    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.io.table import write_tracking_csv
    from vision_basedsensor_tpu.pipeline import run_video

    outdir = str(tmp_path / "stream")
    main(["track", long_video_npy, "--output-dir", outdir, "--chunk", "4"])
    streamed = open(os.path.join(outdir, "markers.csv"), "rb").read()

    frames = np.load(long_video_npy)
    scene = default_scene(*frames.shape[1:3])
    out = run_video(jnp.asarray(frames), scene.cam, PipelineConfig(),
                    apply_warmup=False)
    batch_csv = str(tmp_path / "batch.csv")
    write_tracking_csv(batch_csv, out.tracked)
    assert streamed == open(batch_csv, "rb").read()


def test_streaming_warmup_matches_batch(long_video_npy):
    """StreamingPipeline's global-index warmup must equal the batch path's
    even when the warmup boundary falls inside a chunk."""
    from vision_basedsensor_tpu.config import PipelineConfig, ReconstructConfig
    from vision_basedsensor_tpu.pipeline import StreamingPipeline, run_video

    frames = np.load(long_video_npy)
    scene = default_scene(*frames.shape[1:3])
    cfg = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=4))
    batch = run_video(jnp.asarray(frames), scene.cam, cfg, apply_warmup=True)

    sp = StreamingPipeline(scene.cam, cfg, apply_warmup=True)
    chunks = [sp.process(frames[i:i + 3]) for i in range(0, 9, 3)]
    ffn = np.concatenate([np.asarray(c.recon.from_first_norm)
                          for c in chunks])
    seen = np.concatenate([np.asarray(c.recon.seen) for c in chunks])
    np.testing.assert_array_equal(seen, np.asarray(batch.recon.seen))
    np.testing.assert_allclose(ffn, np.asarray(batch.recon.from_first_norm),
                               atol=1e-5)
    assert not seen[:4].any()  # warmup frames masked


def test_streaming_shape_change_raises():
    """A mid-session resolution switch must fail loud, not remap with a
    stale rectify map / wrong-geometry reference (VERDICT round 2, weak 4)."""
    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.pipeline import StreamingPipeline

    scene = default_scene(240, 320)
    frames = np.asarray(render_frames(
        scene, jnp.zeros((2, 65, 3), jnp.float32))).astype(np.uint8)
    sp = StreamingPipeline(scene.cam, PipelineConfig())
    sp.process(frames)
    with pytest.raises(ValueError, match="shape changed"):
        sp.process(frames.transpose(0, 2, 1))


def test_indent_cli(tmp_path, capsys):
    """cmd_indent reproduces the probe-indentation evaluation from the CLI
    (VERDICT round 2, missing 1): single-step error must beat the
    reference's published 0.04-0.18 mm band."""
    scene = default_scene(480, 640)
    disp = indentation_staircase(num_steps=6, step_mm=0.7)
    frames = np.asarray(render_frames(scene, disp)).astype(np.uint8)
    vid = str(tmp_path / "stair.npy")
    np.save(vid, frames)
    out_csv = str(tmp_path / "indent.csv")
    main(["indent", vid, "--steps", "6", "--step-mm", "0.7",
          "--output", out_csv])
    cap = capsys.readouterr()
    rows = [l for l in cap.out.splitlines() if l and not l.startswith("#")]
    assert rows[0].startswith("step,")
    assert len(rows) == 7
    # step errors from the CSV
    data = [l.split(",") for l in open(out_csv).read().splitlines()[1:]]
    step_err = np.abs(np.array([float(r[4]) for r in data]))
    assert step_err.max() < 0.1, step_err
    assert "worst single-step error" in cap.err


def test_indent_cli_too_few_frames_fails_cleanly(tmp_path, capsys):
    """Review finding (round 3): a video shorter than one full step crashed
    with an empty-array reduction instead of a clean message."""
    scene = default_scene(240, 320)
    frames = np.asarray(render_frames(
        scene, np.zeros((1, 65, 3), np.float32))).astype(np.uint8)
    vid = str(tmp_path / "short.npy")
    np.save(vid, frames)
    with pytest.raises(SystemExit) as ex:
        main(["indent", vid, "--steps", "3"])
    assert ex.value.code == 2
    assert "fewer than one full step" in capsys.readouterr().err


def test_record_cli(tmp_path):
    """cmd_record: live MJPEG stream -> .avi with the received JPEG bytes
    muxed verbatim; the recording must read back through both our RIFF
    walk and cv2 (VERDICT round 2, missing 2)."""
    from vision_basedsensor_tpu.capture import (CameraHandler, LedRing,
                                                StreamingServer)
    from vision_basedsensor_tpu.capture.server import SyntheticCamera
    from vision_basedsensor_tpu.config import CaptureConfig
    from vision_basedsensor_tpu.io.video import MjpegAviSource

    cfg = dataclasses.replace(CaptureConfig(), port=0, width=160, height=120,
                              fps=30)
    leds = LedRing(cfg)
    camera = CameraHandler(cfg, leds, synthetic=SyntheticCamera(cfg))
    server = StreamingServer(cfg, camera)
    server.start()
    out = str(tmp_path / "rec.avi")
    try:
        rc = main(["record", f"http://127.0.0.1:{server.port}/stream", out,
                   "--max-frames", "5", "--fps", "30"])
    finally:
        server.stop()
    assert rc == 0
    src = MjpegAviSource(out, gray=True)
    frames = np.concatenate(list(src.batches(8)))
    assert frames.shape == (5, 120, 160)

    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    ok, f = cap.read()
    assert ok and f.shape == (120, 160, 3)
    cap.release()


def test_mjpeg_avi_writer_bit_identical_payloads(tmp_path):
    """The muxer must store the JPEG payloads verbatim (zero transcode) in
    a container cv2 can play."""
    from vision_basedsensor_tpu.io.video import (MjpegAviWriter,
                                                 _iter_avi_video_chunks)

    rng = np.random.default_rng(0)
    jpegs = []
    for i in range(5):
        img = np.clip(rng.normal(120 + 10 * i, 30, (120, 160)),
                      0, 255).astype(np.uint8)
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 70])
        jpegs.append(enc.tobytes())
    path = str(tmp_path / "mux.avi")
    w = MjpegAviWriter(path, 12.0, (160, 120))
    for j in jpegs:
        w.write_jpeg(j)
    w.close()

    assert list(_iter_avi_video_chunks(open(path, "rb").read())) == jpegs

    cap = cv2.VideoCapture(path)
    n = 0
    while True:
        ok, f = cap.read()
        if not ok:
            break
        ref = cv2.imdecode(np.frombuffer(jpegs[n], np.uint8), 1)
        assert np.abs(f.astype(int) - ref.astype(int)).max() <= 1
        n += 1
    assert n == 5
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 12.0) < 0.1
    cap.release()
