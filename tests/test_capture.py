"""Acquisition server: synthetic camera, MJPEG stream, LED simulation."""
import dataclasses
import time
import urllib.request

import numpy as np
import pytest

from vision_basedsensor_tpu.capture import CameraHandler, LedRing, StreamingServer
from vision_basedsensor_tpu.capture.server import SyntheticCamera, _encode_jpeg
from vision_basedsensor_tpu.config import CaptureConfig


@pytest.fixture
def cfg():
    # Port 0: bind an ephemeral port so tests never collide.
    return dataclasses.replace(CaptureConfig(), port=0, width=160, height=120,
                               fps=30)


def test_led_ring_simulated(cfg):
    leds = LedRing(cfg)
    assert leds.simulated
    leds.all_white()
    assert leds._pixels == [(255, 255, 255)] * cfg.led_count
    leds.off()
    assert leds._pixels == [(0, 0, 0)] * cfg.led_count


def test_synthetic_camera_frames(cfg):
    cam = SyntheticCamera(cfg)
    f = cam.read()
    assert f.shape == (cfg.height, cfg.width, 3)
    jpeg = _encode_jpeg(f, 70)
    assert jpeg[:2] == b"\xff\xd8"  # JPEG SOI marker


def test_streaming_server_serves_mjpeg(cfg):
    leds = LedRing(cfg)
    camera = CameraHandler(cfg, leds, synthetic=SyntheticCamera(cfg))
    server = StreamingServer(cfg, camera)
    server.start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        html = urllib.request.urlopen(f"{base}/", timeout=5).read()
        assert b"/stream" in html

        snap = urllib.request.urlopen(f"{base}/snapshot", timeout=5).read()
        assert snap[:2] == b"\xff\xd8"

        with urllib.request.urlopen(f"{base}/stream", timeout=5) as r:
            data = b""
            t0 = time.time()
            while data.count(b"--frame") < 3 and time.time() - t0 < 10:
                data += r.read(4096)
        assert data.count(b"--frame") >= 3
        assert b"Content-Type: image/jpeg" in data
    finally:
        server.stop()


def test_camera_latest_frame_mailbox(cfg):
    camera = CameraHandler(cfg, None, synthetic=SyntheticCamera(cfg))
    import threading
    t = threading.Thread(target=camera.capture_loop, daemon=True)
    t.start()
    t0 = time.time()
    while camera.frame is None and time.time() - t0 < 5:
        time.sleep(0.02)
    assert camera.frame is not None
    f1 = camera.get_frame()
    assert f1[:2] == b"\xff\xd8"
    camera.close()
