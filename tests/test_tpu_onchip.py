"""Real-chip regression suite (``VBS_TEST_TPU=1 pytest -m tpu_only``).

Interpret mode (the CPU suite) proves kernel MATH, not LOWERABILITY: round
4's 1080p capture found `_pick_rows` emitting Mosaic-illegal row blocks
that every CPU test had happily interpreted (benchmarks/README.md, round-4
section). These tests institutionalize that lesson (VERDICT round 4,
next 3): every Pallas shape path COMPILES on the real chip across the
resolution profiles the reference defines (``marker_detection.py:117-124``:
<=480 rows vs >480 rows constants), plus one end-to-end serving smoke of
the live-stream `run-live --tpu-decode` path whose background-thread
dispatch hazard was round 3's top advisor finding.

Auto-skipped without the real TPU (they check the backend at runtime).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu_only


def _tpu_or_skip():
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU (run with VBS_TEST_TPU=1)")


# The sweep: the two reference profiles at their nominal sizes, the real
# 1080p geometry that exposed the round-4 Mosaic bug, and two row counts
# that are multiples of 8 but NOT of 64 (the _pick_rows alignment rule
# regression surface). Widths stay 128-aligned — the detect backend
# resolver routes other widths to the XLA fallback by design.
_SWEEP = [
    (480, 640, "low-res profile (reference nominal)"),
    # 472, not 488: rows must stay <= low_res_max_rows=480, or the detector
    # faithfully switches to the HIGH-RES profile (marker_detection.py:117)
    # whose constants expect ~960p-scale markers and genuinely detect only
    # ~20/65 on a 480p-scale scene — on EVERY backend, not a Mosaic issue
    # (the first on-chip run of this sweep caught exactly that).
    (472, 640, "low-res, rows % 64 != 0"),
    (960, 1280, "high-res profile (reference >480p constants)"),
    (968, 1280, "high-res, rows % 64 != 0"),
    (1080, 1920, "true 1080p (round-4 Mosaic lowering bug shape)"),
]


@pytest.mark.parametrize("height,width,why", _SWEEP,
                         ids=[f"{h}x{w}" for h, w, _ in _SWEEP])
def test_detect_pallas_lowers_and_runs_on_chip(height, width, why):
    """COMPILE (not interpret) the full detect stage at each shape on the
    real chip — Mosaic layout rules only exist there — then execute one
    small batch and sanity-check the marker count."""
    _tpu_or_skip()
    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.detect.detector import detect_markers
    from vision_basedsensor_tpu.synth import default_scene, render_frames

    cfg = PipelineConfig()
    scene = default_scene(height=height, width=width)
    frames = render_frames(scene, jnp.zeros((2, 65, 3), jnp.float32))

    fn = jax.jit(lambda f: detect_markers(f, cfg.detect))
    compiled = fn.lower(frames).compile()  # Mosaic lowering happens HERE
    hlo = compiled.as_text()
    assert "custom-call" in hlo, (
        f"detect at {height}x{width} ({why}) lost its Pallas kernels — "
        "the backend resolver fell back to XLA silently")
    det = jax.block_until_ready(compiled(frames))
    n = int(np.asarray(det.valid).sum(-1).min())
    assert n == 65, f"{why}: detected {n}/65 markers on chip"


def test_run_live_tpu_decode_serving_smoke(capsys):
    """End-to-end on-chip serving smoke: synthetic MJPEG server -> SPLIT
    sparse transport over the link -> on-device expand+IDCT -> pipeline ->
    contact-state publisher. This is the path whose thread-dispatch
    contract (host entropy decode on the reader thread, jit dispatch on
    the main thread only) was a real round-3 advisor finding — it must be
    exercised on the chip, where a background-thread dispatch hangs."""
    _tpu_or_skip()
    pytest.importorskip("cv2")
    import dataclasses

    from vision_basedsensor_tpu.capture import CameraHandler, StreamingServer
    from vision_basedsensor_tpu.capture.server import SyntheticCamera
    from vision_basedsensor_tpu.cli.main import main
    from vision_basedsensor_tpu.config import CaptureConfig
    from vision_basedsensor_tpu.native import load_jpeg_lib
    from vision_basedsensor_tpu.synth import default_scene

    if load_jpeg_lib() is None:
        pytest.skip("no C++ compiler for the native entropy decoder")

    cap_cfg = dataclasses.replace(CaptureConfig(), port=0, width=320,
                                  height=240, fps=30)
    scene = default_scene(240, 320)
    camera = CameraHandler(cap_cfg, None,
                           synthetic=SyntheticCamera(cap_cfg, scene))
    server = StreamingServer(cap_cfg, camera)
    server.start()
    try:
        main(["run-live", f"http://127.0.0.1:{server.port}/stream",
              "--batch", "2", "--max-frames", "4", "--tpu-decode"])
    finally:
        server.stop()
    out = capsys.readouterr().out
    assert "tracked" in out and "/65 markers" in out
    # The transport accounting proves the split path (not a silent host
    # fallback) carried the frames.
    assert "tpu-decode transport:" in out


def test_split_transport_roundtrip_on_chip():
    """The VLC split transport's scatter/segmented-scan decode runs on the
    REAL chip (drop semantics, cummax, row-takes all lower) and matches
    libjpeg within IDCT rounding."""
    _tpu_or_skip()
    cv2 = pytest.importorskip("cv2")
    from vision_basedsensor_tpu.ops.jpeg import MjpegBatchDecoder
    from vision_basedsensor_tpu.native import load_jpeg_lib

    if load_jpeg_lib() is None:
        pytest.skip("no C++ compiler for the native entropy decoder")
    rng = np.random.default_rng(0)
    imgs = [np.clip(rng.normal(120, 45, (240, 320)), 0,
                    255).astype(np.uint8) for _ in range(4)]
    imgs = [cv2.GaussianBlur(i, (5, 5), 1.2) for i in imgs]
    jpegs = [cv2.imencode(".jpg", i, [cv2.IMWRITE_JPEG_QUALITY, 70])[1]
             .tobytes() for i in imgs]
    out = np.asarray(MjpegBatchDecoder().decode_split(jpegs))
    for got, jp in zip(out, jpegs):
        ref = cv2.imdecode(np.frombuffer(jp, np.uint8),
                           cv2.IMREAD_GRAYSCALE).astype(np.float32)
        assert np.abs(got - ref).max() <= 2.0
