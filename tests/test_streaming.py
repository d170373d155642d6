"""Streaming pipeline: chunked == monolithic; session checkpoint/resume;
live MJPEG loop against the in-process capture server."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end; core suite = -m 'not slow'

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
    """With the axis calibration pinned on frame 0 (ReferenceMarkers.
    axis_scale) chunking is equivalent to one batch — diameters, depths, and
    displacement fields match to f32 reassociation noise (~1e-5 mm; XLA
    compiles each batch shape separately). VERDICT round 1, weak 2:
    previously only the displacement *structure* matched, with ~1% (~0.2 mm)
    absolute-depth steps at chunk boundaries."""
    cfg, scene, frames = setup
    mono = run_video(frames, scene.cam, cfg, apply_warmup=False)

    for sizes in [(4, 4, 4), (7, 5), (1, 11), (12,)]:
        sp = StreamingPipeline(scene.cam, cfg)
        outs, i = [], 0
        for s in sizes:
            outs.append(sp.process(frames[i:i + s]))
            i += s
        axes = np.concatenate([np.asarray(o.tracked.axes) for o in outs])
        cum = np.concatenate([np.asarray(o.recon.cum_path) for o in outs])
        ffn = np.concatenate([np.asarray(o.recon.from_first_norm) for o in outs])
        np.testing.assert_allclose(axes, np.asarray(mono.tracked.axes), atol=1e-4)
        np.testing.assert_allclose(cum, np.asarray(mono.recon.cum_path), atol=1e-4)
        np.testing.assert_allclose(ffn, np.asarray(mono.recon.from_first_norm),
                                   atol=1e-4)


def test_sequential_mode_carries_last_sighting_across_chunks(setup):
    """Sequential association must gate against the last sighting across
    chunk boundaries, not restart from the frame-0 table each chunk
    (ADVICE.md round 1): a marker drifted beyond the gate would silently
    drop at every chunk start otherwise. Chunked == monolithic, on a motion
    that exceeds the 20 px gate cumulatively."""
    cfg0, scene, _ = setup
    import dataclasses
    cfg = dataclasses.replace(
        cfg0, track=TrackConfig(association_mode="sequential"))
    # Lateral drift: ~3.4 px/frame at this scene's scale, 40+ px total.
    d = jnp.zeros((16, 65, 3), jnp.float32)
    d = d.at[:, :, 0].add(0.3 * jnp.arange(16)[:, None])
    frames = render_frames(scene, d)

    mono = run_video(frames, scene.cam, cfg, apply_warmup=False)
    assert np.asarray(mono.tracked.valid)[-1].sum() >= 60  # still tracking

    sp = StreamingPipeline(scene.cam, cfg)
    outs = [sp.process(frames[i:i + 4]) for i in range(0, 16, 4)]
    valid = np.concatenate([np.asarray(o.tracked.valid) for o in outs])
    xy = np.concatenate([np.asarray(o.tracked.xy) for o in outs])
    np.testing.assert_array_equal(valid, np.asarray(mono.tracked.valid))
    np.testing.assert_allclose(xy, np.asarray(mono.tracked.xy), atol=1e-6)


def test_session_checkpoint_resume(setup, tmp_path):
    cfg, scene, frames = setup
    from vision_basedsensor_tpu.io.session import load_session, save_session

    sp = StreamingPipeline(scene.cam, cfg)
    sp.process(frames[:6])
    save_session(str(tmp_path / "sess"), sp.ref, cfg, scan_carry=sp.carry,
                 assoc_xy=sp.assoc_xy)

    sess = load_session(str(tmp_path / "sess"))
    assert sess.calibration is None
    assert float(np.asarray(sess.ref.axis_scale)) == pytest.approx(
        float(np.asarray(sp.ref.axis_scale)))
    sp2 = StreamingPipeline(scene.cam, sess.config, ref=sess.ref,
                            carry=sess.scan_carry or None,
                            assoc_xy=sess.assoc_xy)
    out_resumed = sp2.process(frames[6:])

    sp_full = StreamingPipeline(scene.cam, cfg)
    sp_full.process(frames[:6])
    out_full = sp_full.process(frames[6:])
    np.testing.assert_allclose(np.asarray(out_resumed.recon.cum_path),
                               np.asarray(out_full.recon.cum_path), atol=1e-5)


def test_resume_preserves_warmup_offset(setup, tmp_path):
    """Review finding (round 3): frames_seen was never persisted, so a
    warmup-enabled session resumed from a checkpoint re-masked the first
    warmup_frames of the post-resume stream. Chunked+resumed must equal a
    single batch."""
    import dataclasses

    from vision_basedsensor_tpu.io.session import load_session, save_session
    from vision_basedsensor_tpu.pipeline import run_video

    cfg0, scene, frames = setup
    cfg = dataclasses.replace(cfg0,
                              reconstruct=ReconstructConfig(warmup_frames=3))

    sp = StreamingPipeline(scene.cam, cfg, apply_warmup=True)
    out1 = sp.process(frames[:5])
    save_session(str(tmp_path / "sess"), sp.ref, cfg, scan_carry=sp.carry,
                 assoc_xy=sp.assoc_xy, frames_seen=sp.frames_seen)

    sess = load_session(str(tmp_path / "sess"))
    assert sess.frames_seen == 5
    sp2 = StreamingPipeline(scene.cam, sess.config, ref=sess.ref,
                            carry=sess.scan_carry or None,
                            assoc_xy=sess.assoc_xy, apply_warmup=True,
                            frames_seen=sess.frames_seen)
    out2 = sp2.process(frames[5:])

    seen = np.concatenate([np.asarray(out1.recon.seen),
                           np.asarray(out2.recon.seen)])
    base = run_video(frames, scene.cam, cfg, apply_warmup=True)
    np.testing.assert_array_equal(seen, np.asarray(base.recon.seen))
    assert not seen[:3].any()                  # warmup masked once, globally
    assert (seen[3:].sum(axis=1) >= 55).all()  # and never re-applied


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


def test_stream_reader_drops_oldest_and_propagates_errors(monkeypatch):
    """Live sources drain the socket in a background thread with a bounded
    drop-oldest buffer (round-3 fix): on the real chip the pipeline's
    first-batch compile takes minutes, during which a consumer-driven
    socket goes unread — the server's writer stalls and the client read
    times out. A slow consumer must instead see the LATEST frames, with
    drops counted, and a reader-side exception must surface in the
    consumer, not vanish in the thread."""
    import time as _time

    import vision_basedsensor_tpu.io.mjpeg as mjpeg_mod

    frames = [bytes([i]) * 4 for i in range(30)]

    def fake_iter(url, boundary=None, timeout=10.0, max_frames=None):
        for i, fb in enumerate(frames):
            if url == "err" and i == 5:
                raise ConnectionError("stream died")
            yield fb

    monkeypatch.setattr(mjpeg_mod, "iter_mjpeg_bytes", fake_iter)

    # Slow consumer: the producer finishes (all 30 frames read, i.e. the
    # socket never blocked on us) while we sleep before consuming; the
    # deque keeps only the newest maxlen frames.
    reader = mjpeg_mod._StreamReader("ok", None, maxlen=8)
    reader._thread.join(5.0)    # producer drains everything unconsumed
    assert not reader._thread.is_alive()
    got = list(reader.frames())
    assert got == frames[-8:]           # latest 8, oldest dropped
    assert reader.dropped == 30 - 8

    # A mid-stream gap reconnects (with backoff) up to the retry budget;
    # the error surfaces to the consumer only once that's exhausted.
    reader = mjpeg_mod._StreamReader("err", None, maxlen=64, reconnects=2)
    with pytest.raises(ConnectionError):
        list(reader.frames())
    assert reader.reconnects == 2

    # A URL that never produces fails fast — no reconnect loop.
    def dead_iter(url, boundary=None, timeout=10.0, max_frames=None):
        raise ConnectionError("refused")
        yield  # pragma: no cover

    monkeypatch.setattr(mjpeg_mod, "iter_mjpeg_bytes", dead_iter)
    reader = mjpeg_mod._StreamReader("x", None, maxlen=8)
    with pytest.raises(ConnectionError):
        list(reader.frames())
    assert reader.reconnects == 0


def test_state_publisher_poll_and_events():
    """The contact-state publisher (io/publish.py): /state long-poll, /events
    SSE, /healthz — the production serving endpoint the robot controller
    consumes (README.md:124's pose compensation needs a machine-readable
    transport the reference never provides)."""
    import json
    import threading
    import urllib.request

    from vision_basedsensor_tpu.io.publish import StatePublisher

    pub = StatePublisher(port=0, poll_timeout_s=2.0)
    base = f"http://127.0.0.1:{pub.port}"
    try:
        assert urllib.request.urlopen(f"{base}/healthz",
                                      timeout=5).read() == b"ok"
        # No state yet -> 404.
        try:
            urllib.request.urlopen(f"{base}/state", timeout=5)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        pub.update({"tilt_deg": 14.9, "valid": True})
        s1 = json.loads(urllib.request.urlopen(f"{base}/state",
                                               timeout=5).read())
        assert s1["tilt_deg"] == 14.9 and s1["seq"] == 1

        # Long-poll for seq > 1 races an update from another thread.
        t = threading.Timer(0.2, pub.update, ({"tilt_deg": 15.2,
                                               "valid": True},))
        t.start()
        s2 = json.loads(urllib.request.urlopen(f"{base}/state?seq=1",
                                               timeout=5).read())
        assert s2["seq"] == 2 and s2["tilt_deg"] == 15.2
        t.join()

        # SSE: first event delivers the latest state immediately.
        with urllib.request.urlopen(f"{base}/events", timeout=5) as r:
            line = r.readline()
            assert line.startswith(b"data: ")
            ev = json.loads(line[len(b"data: "):])
            assert ev["seq"] == 2
    finally:
        pub.close()


def test_contact_state_payload_schema():
    """contact_state_payload flattens one ContactState frame to floats."""
    from vision_basedsensor_tpu.analysis.force import contact_state_sequence
    from vision_basedsensor_tpu.config import AnalysisConfig
    from vision_basedsensor_tpu.io.publish import contact_state_payload
    from vision_basedsensor_tpu.reconstruct import displacement_scan
    from vision_basedsensor_tpu.synth import tilt_deviation_field

    world = np.tile(np.zeros((1, 65, 3), np.float32), (2, 1, 1))
    world[1] = np.asarray(tilt_deviation_field(15.0, compression_mm=0.0))
    seen = np.ones((2, 65), bool)
    recon = displacement_scan(jnp.asarray(world), jnp.asarray(seen),
                              ReconstructConfig(warmup_frames=0))
    state = contact_state_sequence(recon, AnalysisConfig())
    p = contact_state_payload(state, -1, frames_seen=2)
    assert abs(p["tilt_deg"] - 15.0) < 1e-2
    assert p["valid"] is True and p["frames_seen"] == 2
    assert len(p["plane"]) == 3 and len(p["mean_vector_mm"]) == 3
    json_ok = __import__("json").dumps(p)
    assert "tilt_deg" in json_ok


def test_state_publisher_close_ends_sse_and_longpoll_timeout_returns_current():
    """Review findings (round 2): (a) close() while an SSE client is
    connected must END the stream, not busy-spin keepalives; (b) a
    /state?seq=N long-poll that times out with no NEWER state returns the
    CURRENT state (same seq), not 404 — 404 means "no state at all"."""
    import json
    import socket
    import time
    import urllib.request

    from vision_basedsensor_tpu.io.publish import StatePublisher

    pub = StatePublisher(port=0, poll_timeout_s=0.3)
    base = f"http://127.0.0.1:{pub.port}"
    try:
        pub.update({"tilt_deg": 1.0})
        # (b) long-poll for newer-than-current times out -> current state.
        t0 = time.monotonic()
        s = json.loads(urllib.request.urlopen(f"{base}/state?seq=1",
                                              timeout=5).read())
        assert s["seq"] == 1 and time.monotonic() - t0 >= 0.25
        # Malformed seq -> 400, connection intact.
        try:
            urllib.request.urlopen(f"{base}/state?seq=abc", timeout=5)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # (a) open an SSE stream, then close the publisher.
        sk = socket.create_connection(("127.0.0.1", pub.port), timeout=5)
        sk.sendall(b"GET /events HTTP/1.1\r\nHost: x\r\n\r\n")
        sk.settimeout(2.0)
        first = b""
        while b"data: " not in first:   # headers, then the first data event
            chunk = sk.recv(65536)
            assert chunk, "SSE stream closed before first event"
            first += chunk
    finally:
        pub.close()
    # After close the stream must END (EOF), not flood keepalives.
    got = b""
    deadline = time.monotonic() + 3.0
    while time.monotonic() < deadline:
        try:
            chunk = sk.recv(65536)
        except TimeoutError:
            break
        if not chunk:
            break               # clean EOF
        got += chunk
        assert len(got) < 64 * 1024, "publisher floods after close()"
    sk.close()
