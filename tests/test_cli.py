"""CLI smoke tests on synthetic data (every subcommand's happy path)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end; core suite = -m 'not slow'

import jax.numpy as jnp

from vision_basedsensor_tpu.cli.main import main
from vision_basedsensor_tpu.synth import default_scene, render_frames


@pytest.fixture(scope="module")
def video_npy(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli")
    scene = default_scene(240, 320)
    d = jnp.zeros((4, 65, 3), jnp.float32)
    d = d.at[:, :, 2].add(-0.1 * jnp.arange(4)[:, None])
    frames = np.asarray(render_frames(scene, d)).astype(np.uint8)
    path = str(p / "video.npy")
    np.save(path, frames)
    return path


def test_cli_detect(video_npy, tmp_path, capsys):
    frames = np.load(video_npy)
    img = str(tmp_path / "frame.npy")
    np.save(img, frames[0])
    main(["detect", img])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l and not l.startswith("#")]
    assert lines[0].startswith("marker_id")
    assert len(lines) >= 60


def test_cli_track_and_reconstruct(video_npy, tmp_path, capsys):
    outdir = str(tmp_path / "res")
    main(["track", video_npy, "--output-dir", outdir])
    csv_path = os.path.join(outdir, "markers.csv")
    assert os.path.exists(csv_path)

    out_coords = str(tmp_path / "coords.csv")
    main(["reconstruct", csv_path, "--output", out_coords, "--no-warmup"])
    assert os.path.exists(out_coords)
    text = open(out_coords).read()
    assert "Xw" in text and text.count("\n") > 60

    # Ring-local analysis (LocalAnalysis.py, C17) from the CLI: the video
    # presses straight down 0.3 mm between the two 1-frame windows.
    plots = str(tmp_path / "plots")
    main(["reconstruct", csv_path, "--output", out_coords, "--no-warmup",
          "--ring", "2", "--start-range", "0", "0",
          "--end-range", "3", "3", "--plots-dir", plots])
    cap = capsys.readouterr().out
    ring_line = [l for l in cap.splitlines() if l.startswith("ring 2")][0]
    assert "markers 8-19" in ring_line
    # Magnitude sanity only: at this tiny 240x320 fixture the per-marker
    # depth noise inflates the norm well past the prescribed 0.3 mm Z
    # (accuracy is pinned by the 480p staircase tests); the CLI plumbing —
    # ring selection, window averaging, plot output — is what's under test.
    mag = float(ring_line.split("displacement ")[1].split(" mm")[0])
    assert 0.05 < mag < 2.0, ring_line
    assert os.path.exists(os.path.join(plots, "ring_2_displacement.png"))


def test_cli_analyze(tmp_path, capsys):
    from vision_basedsensor_tpu.io.table import write_experiment_txt
    from vision_basedsensor_tpu import layout
    import numpy as _np
    table = layout.dome_layout()[:, 1:]
    valid = _np.ones(65, bool)
    vert_end = table + [0, 0, -1.0]
    tilt_end = table.copy()
    tilt_end[:, 2] += -1.0 - _np.tan(_np.deg2rad(15.0)) * table[:, 0]
    pv = str(tmp_path / "vert.txt")
    pt = str(tmp_path / "tilt.txt")
    write_experiment_txt(pv, table, vert_end, valid)
    write_experiment_txt(pt, table, tilt_end, valid)
    plot = str(tmp_path / "dev.png")
    main(["analyze", pv, pt, "--plot", plot])
    out = capsys.readouterr().out
    assert "Tilt Angle = 15.0" in out
    assert os.path.exists(plot)


def test_cli_synth(tmp_path, capsys):
    out = str(tmp_path / "s.npy")
    main(["synth", "--output", out, "--motion", "wave", "--frames", "3",
          "--height", "120", "--width", "160"])
    assert np.load(out).shape == (3, 120, 160)


def test_cli_calibrate(tmp_path, capsys, rng):
    # Synthetic correspondences via the camera model.
    from vision_basedsensor_tpu.core import camera as cam_mod
    from vision_basedsensor_tpu.core.camera import CameraModel
    from vision_basedsensor_tpu.core.transforms import rodrigues
    cam = CameraModel.create(620.0, 600.0, 310.0, 245.0, dtype=jnp.float64)
    objs, imgs = [], []
    xs, ys = np.meshgrid(np.arange(6), np.arange(6))
    board = np.stack([xs.ravel(), ys.ravel(), np.zeros(36)], -1) * 3.0
    for k in range(6):
        rv = rng.uniform(-0.3, 0.3, 3)
        tv = np.array([rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(50, 70)])
        c = cam._replace(R_wc=rodrigues(jnp.asarray(rv)), T_wc=jnp.asarray(tv))
        objs.append(board)
        imgs.append(np.array(cam_mod.project_points(c, jnp.asarray(board))))
    npz = str(tmp_path / "corners.npz")
    np.savez(npz, objs=np.stack(objs), imgs=np.stack(imgs))
    out_x = str(tmp_path / "Intrinsic.xlsx")
    main(["calibrate-intrinsics", npz, "--output", out_x])
    assert os.path.exists(out_x)

    # Extrinsics from marker correspondences.
    world_csv = str(tmp_path / "world.csv")
    pix_csv = str(tmp_path / "pixel.csv")
    obj = rng.uniform(-15, 15, (30, 3))
    obj[:, 2] = rng.uniform(0, 5, 30)
    c = cam._replace(R_wc=rodrigues(jnp.asarray([0.1, -0.05, 0.2])),
                     T_wc=jnp.asarray([1.0, 2.0, 60.0]))
    uv = np.array(cam_mod.project_points(c, jnp.asarray(obj)))
    with open(world_csv, "w") as f:
        f.write("marker_id,Xw,Yw,Zw\n")
        for i, p in enumerate(obj):
            f.write(f"{i+1},{p[0]},{p[1]},{p[2]}\n")
    with open(pix_csv, "w") as f:
        f.write("marker_id,u,v\n")
        for i, p in enumerate(uv):
            f.write(f"{i+1},{p[0]},{p[1]}\n")
    out_e = str(tmp_path / "Extrinsic.xlsx")
    main(["calibrate-extrinsics", out_x, world_csv, pix_csv, "--output", out_e])
    assert os.path.exists(out_e)
    txt = capsys.readouterr().out
    assert "inliers" in txt


def test_cli_diameter(tmp_path, capsys):
    import sys as _sys, pathlib as _pl
    _sys.path.insert(0, str(_pl.Path(__file__).parent))
    from test_chessboard import _disk_image
    img = _disk_image()
    p = str(tmp_path / "dia.npy")
    np.save(p, img)
    plot = str(tmp_path / "dia.png")
    main(["diameter", p, "--scale", "5.0", "--plot", plot])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l and not l.startswith(("#", "wrote", "["))]
    assert lines[0].startswith("x,y,diameter_mm")
    assert len(lines) == 4  # header + 3 disks
    assert os.path.exists(plot)


def test_cli_calibrate_from_images(tmp_path, capsys, rng):
    import sys as _sys, pathlib as _pl
    _sys.path.insert(0, str(_pl.Path(__file__).parent))
    from test_undistort import _render_board_through_camera
    K = np.array([[420.0, 0.0, 200.0], [0.0, 410.0, 150.0], [0.0, 0.0, 1.0]])
    d = tmp_path / "imgs"
    d.mkdir()
    for k in range(5):
        rvec = np.array([0.25 * np.sin(k * 1.3), 0.25 * np.cos(k * 0.9),
                         0.3 * np.sin(k * 2.1)])
        tvec = np.array([-22.0 + 2 * k, -18.0 + 1.5 * k, 95.0 + 6 * k])
        img = _render_board_through_camera(K, rvec, tvec, 6.0, 8, 300, 400)
        np.save(str(d / f"board_{k}.npy"), img)
    out_x = str(tmp_path / "Intrinsic.xlsx")
    plots = str(tmp_path / "plots")
    import json, dataclasses
    from vision_basedsensor_tpu.config import CalibrateConfig, PipelineConfig, to_json
    cfgp = str(tmp_path / "cfg.json")
    to_json(PipelineConfig(calibrate=CalibrateConfig(pattern_size=(7, 7),
                                                     square_size_mm=6.0)), cfgp)
    main(["--config", cfgp, "calibrate-intrinsics", str(d),
          "--output", out_x, "--plots-dir", plots])
    assert os.path.exists(out_x)
    assert os.path.exists(os.path.join(plots, "board_poses.png"))
    from vision_basedsensor_tpu.calibrate import CalibrationArtifact
    art = CalibrationArtifact.load_intrinsics_xlsx(out_x)
    assert abs(art.fx - 420.0) < 8.0
    assert abs(art.cy - 150.0) < 8.0


def test_cli_tilt_end_to_end(tmp_path, capsys):
    """Config 5 from videos: 15 deg tilt recovered via the tilt subcommand."""
    from vision_basedsensor_tpu.config import (
        AnalysisConfig, PipelineConfig, ReconstructConfig, to_json)
    from vision_basedsensor_tpu.synth import (
        default_scene, render_frames, tilt_deviation_field)
    scene = default_scene(480, 640)
    zero = jnp.zeros((65, 3), jnp.float32)
    vert = np.asarray(render_frames(
        scene, jnp.stack([zero, zero + jnp.asarray([0.0, 0.0, -1.0])])))
    tilt = np.asarray(render_frames(
        scene, jnp.stack([zero, tilt_deviation_field(15.0, compression_mm=1.0)])))
    pv = str(tmp_path / "vert.npy")
    pt = str(tmp_path / "tilt.npy")
    np.save(pv, vert.astype(np.uint8))
    np.save(pt, tilt.astype(np.uint8))

    cfgp = str(tmp_path / "cfg.json")
    to_json(PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0)), cfgp)
    outdir = str(tmp_path / "exp")
    main(["--config", cfgp, "tilt", pv, pt, "--no-warmup",
          "--start-range", "0", "0", "--end-range", "1", "1",
          "--output-dir", outdir])
    out = capsys.readouterr().out
    assert "Tilt Angle = " in out
    angle = float(out.split("Tilt Angle = ")[1].split(" ")[0])
    assert abs(angle - 15.0) < 0.5
    assert os.path.exists(os.path.join(outdir, "vertical.txt"))
    assert os.path.exists(os.path.join(outdir, "tilted.txt"))


def test_cli_run_live_with_publisher(capsys):
    """run-live --publish: live MJPEG loop + contact-state JSON endpoint."""
    import dataclasses
    import json
    import threading
    import urllib.request

    from vision_basedsensor_tpu.capture import CameraHandler, StreamingServer
    from vision_basedsensor_tpu.capture.server import SyntheticCamera
    from vision_basedsensor_tpu.config import CaptureConfig
    from vision_basedsensor_tpu.synth import default_scene

    cap_cfg = dataclasses.replace(CaptureConfig(), port=0, width=320,
                                  height=240, fps=30)
    scene = default_scene(240, 320)
    camera = CameraHandler(cap_cfg, None,
                           synthetic=SyntheticCamera(cap_cfg, scene))
    server = StreamingServer(cap_cfg, camera)
    server.start()

    captured = {}
    # Race-free-enough free port (the capture server uses port=0 + .port;
    # the CLI only prints its bound port, so reserve one up front instead
    # of hardcoding — collisions failed the test under parallel CI).
    import socket
    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        pub_port = sk.getsockname()[1]

    def snoop():
        # Poll until the CLI's publisher comes up, then read one state.
        import time
        for _ in range(1000):
            time.sleep(0.01)
            try:
                s = urllib.request.urlopen(
                    f"http://127.0.0.1:{pub_port}/state", timeout=1).read()
                captured["state"] = json.loads(s)
                return
            except Exception:
                continue

    # The publisher closes with main(), so the state must be read
    # CONCURRENTLY — a liveness race on the 1-core CI host (under full-
    # suite load main() can finish all frames before the snoop thread gets
    # scheduled into a successful poll). One retry with a longer run keeps
    # the assertion meaningful without making the suite flaky.
    out = ""
    try:
        for attempt, frames in enumerate((8, 24)):
            t = threading.Thread(target=snoop)
            t.start()
            main(["run-live", f"http://127.0.0.1:{server.port}/stream",
                  "--batch", "2", "--max-frames", str(frames), "--publish",
                  str(pub_port)])
            t.join(timeout=15)
            out += capsys.readouterr().out
            if captured.get("state") is not None:
                break
    finally:
        server.stop()
    assert "contact state served" in out
    assert "tracked" in out
    st = captured.get("state")
    assert st is not None, "publisher never served a state"
    assert "tilt_deg" in st and st["frames_seen"] >= 2


def test_cli_run_live_tpu_decode(capsys):
    """run-live --tpu-decode: the live stream's JPEGs feed the pipeline
    through the delta-scatter transport (host entropy decode only) —
    tracked output must appear exactly as with host decode."""
    import dataclasses

    import pytest as _pytest

    from vision_basedsensor_tpu.capture import CameraHandler, StreamingServer
    from vision_basedsensor_tpu.capture.server import SyntheticCamera
    from vision_basedsensor_tpu.config import CaptureConfig
    from vision_basedsensor_tpu.native import load_jpeg_lib
    from vision_basedsensor_tpu.synth import default_scene

    if load_jpeg_lib() is None:
        _pytest.skip("no C++ compiler for the native entropy decoder")

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


def test_cli_track_annotate_crop_draws_in_cropped_space(video_npy, tmp_path):
    """Review finding (round 2): --annotate drew tracked (post-crop)
    coordinates onto the RAW frames, offsetting every overlay by the crop
    origin. The annotated video must have the cropped geometry."""
    pytest.importorskip("cv2")
    import cv2

    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.core.imaging import crop_frames

    outdir = str(tmp_path / "res")
    main(["track", video_npy, "--output-dir", outdir, "--crop", "--annotate"])
    avi = os.path.join(outdir, "tracked.avi")
    assert os.path.exists(avi)
    cap = cv2.VideoCapture(avi)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    raw = np.load(video_npy)
    cropped = crop_frames(jnp.asarray(raw),
                          crop_ratios=PipelineConfig().crop_ratios)
    ch, cw = cropped.shape[1:3]
    # Codec may round odd dims down by one; the raw (uncropped) size would
    # be ~30 px larger, so +-1 still proves the cropped geometry was drawn.
    assert abs(h - ch) <= 1 and abs(w - cw) <= 1, (h, w, cropped.shape)


def test_cli_tilt_video_vs_analyze_txt_pinned(tmp_path, capsys):
    """Cross-modality pin (VERDICT round 2, #10): the tilt computed from
    VIDEOS (cmd_tilt) and the tilt computed from the TXT tables cmd_tilt
    exported for that same reconstruction (cmd_analyze, the reference's
    ForceDistribution.py:110-136 modality) must agree to 1e-3 deg — the
    C14/C15 chain is one algorithm regardless of input modality."""
    from vision_basedsensor_tpu.config import (
        PipelineConfig, ReconstructConfig, to_json)
    from vision_basedsensor_tpu.synth import (
        default_scene, render_frames, tilt_deviation_field)
    scene = default_scene(480, 640)
    zero = jnp.zeros((65, 3), jnp.float32)
    vert = np.asarray(render_frames(
        scene, jnp.stack([zero, zero + jnp.asarray([0.0, 0.0, -1.0])])))
    tilt = np.asarray(render_frames(
        scene, jnp.stack([zero, tilt_deviation_field(12.0, compression_mm=1.0)])))
    pv = str(tmp_path / "vert.npy")
    pt = str(tmp_path / "tilt.npy")
    np.save(pv, vert.astype(np.uint8))
    np.save(pt, tilt.astype(np.uint8))

    cfgp = str(tmp_path / "cfg.json")
    to_json(PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0)), cfgp)
    outdir = str(tmp_path / "exp")
    main(["--config", cfgp, "tilt", pv, pt, "--no-warmup",
          "--start-range", "0", "0", "--end-range", "1", "1",
          "--output-dir", outdir])
    out_video = capsys.readouterr().out
    a_video = float(out_video.split("Tilt Angle = ")[1].split(" ")[0])

    main(["analyze", os.path.join(outdir, "vertical.txt"),
          os.path.join(outdir, "tilted.txt")])
    out_txt = capsys.readouterr().out
    a_txt = float(out_txt.split("Tilt Angle = ")[1].split(" ")[0])
    assert abs(a_video - a_txt) < 1e-3, (a_video, a_txt)


def test_cli_track_tpu_decode_matches_host(video_npy, tmp_path):
    """track --tpu-decode on an MJPG AVI: the split-transport on-device
    decode path through the overlapped feed must track the same markers as
    the host-decode path (IDCT-rounding-level pixel differences only), and
    gracefully fall back for non-AVI inputs."""
    cv2 = pytest.importorskip("cv2")
    from vision_basedsensor_tpu.native import load_jpeg_lib
    if load_jpeg_lib() is None:
        pytest.skip("no C++ compiler for the native JPEG decoder")
    from vision_basedsensor_tpu.io.video import VideoWriter

    frames = np.load(video_npy)
    avi = str(tmp_path / "clip.avi")
    vw = VideoWriter(avi, 12.0, (frames.shape[2], frames.shape[1]),
                     fourcc="MJPG")
    for f in frames:
        vw.write(f)
    vw.close()

    host_dir = str(tmp_path / "host")
    tpu_dir = str(tmp_path / "tpu")
    main(["track", avi, "--output-dir", host_dir])
    main(["track", avi, "--output-dir", tpu_dir, "--tpu-decode"])
    h = open(os.path.join(host_dir, "markers.csv")).read().splitlines()
    t = open(os.path.join(tpu_dir, "markers.csv")).read().splitlines()
    assert h[0] == t[0] and len(h) == len(t)
    for lh, lt in zip(h[1:], t[1:]):
        fh = np.array(lh.split(",")[2:], float)
        ft = np.array(lt.split(",")[2:], float)
        assert lh.split(",")[:2] == lt.split(",")[:2]
        # row/col/centers tight; axes looser (the ±1 gray IDCT rounding
        # shifts the photometric axis estimate a few tenths of a px on
        # this tiny fixture); the ellipse ANGLE of near-circular markers
        # is ill-conditioned (axes differ by <1%), so degrees of swing are
        # legitimate.
        np.testing.assert_allclose(ft[:6], fh[:6], atol=0.35)
        np.testing.assert_allclose(ft[6:8], fh[6:8], atol=0.6)
        assert abs((ft[8] - fh[8] + 90.0) % 180.0 - 90.0) < 6.0

    # Non-AVI input: --tpu-decode must fall back to host decode, not die.
    fb_dir = str(tmp_path / "fb")
    main(["track", video_npy, "--output-dir", fb_dir, "--tpu-decode"])
    assert os.path.exists(os.path.join(fb_dir, "markers.csv"))
