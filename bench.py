"""End-to-end throughput benchmarks on real hardware.

Two measurements (each printed as one JSON line; the flagship compute metric
is the LAST line, which the driver records):

1. ``sustained_fps_decode_fed`` — the full production ingest path: an MJPG
   ``.avi`` on disk (the reference's actual input format,
   ``marker_detection.py:52``; MJPEG is what the capture server streams,
   ``collecting.py:130``) -> parallel host JPEG decode (io/video.py
   MjpegAviSource) -> double-buffered device feed -> the complete pipeline.
   Host decode and TPU compute overlap; this is the number a deployment
   actually sustains end to end.

2. ``marker_to_pose_pipeline_fps_single_chip`` — the TPU step alone with
   frames staged in HBM: batched frames -> detection -> association -> 3D
   displacement field -> per-frame contact-plane tilt (the full
   marker->force+pose perception step, C4..C15 including the analysis
   stage). North star: 1000 fps (BASELINE.json; the reference publishes no
   throughput and captures at 12 fps on a Raspberry Pi).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _setup_jax():
    import jax

    # Persistent compilation cache: first-ever run pays the (remote) TPU
    # compile; subsequent bench invocations start hot.
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _render_sequence(batch):
    """Realistic moving sequence (not timed)."""
    import jax
    import jax.numpy as jnp

    from vision_basedsensor_tpu.synth import default_scene, render_frames

    scene = default_scene(height=480, width=640)
    d = jnp.zeros((batch, 65, 3), jnp.float32)
    d = d.at[:, :, 2].add(-0.002 * jnp.arange(batch)[:, None])
    frames = jax.block_until_ready(render_frames(scene, d))
    return scene, frames


def bench_compute(batch: int, iters: int) -> float:
    import jax

    from vision_basedsensor_tpu.config import PipelineConfig, ReconstructConfig
    from vision_basedsensor_tpu.pipeline import initialize, process_frames

    cfg = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))
    scene, frames = _render_sequence(batch)
    ref = initialize(frames[0], cfg)

    fwd = jax.jit(lambda f, r: process_frames(f, r, scene.cam, cfg))
    out = jax.block_until_ready(fwd(frames, ref))  # compile
    for _ in range(2):  # warm
        out = jax.block_until_ready(fwd(frames, ref))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(frames, ref)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_decode_fed(n_frames: int, batch: int) -> dict | None:
    """Returns {sustained_fps, decode_only_fps, backend} or None (no cv2)."""
    try:
        import cv2  # noqa: F401
    except Exception:
        return None
    import numpy as np

    import jax

    from vision_basedsensor_tpu.config import PipelineConfig, ReconstructConfig
    from vision_basedsensor_tpu.io.video import (
        MjpegAviSource, MjpegAviTpuSource, VideoWriter, device_feed)
    from vision_basedsensor_tpu.pipeline import initialize, process_frames

    cfg = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))

    # Write the bench video (setup, not timed).
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.avi")
        vw = VideoWriter(path, 12.0, (640, 480), fourcc="MJPG")
        scene = None
        for start in range(0, n_frames, 256):
            scene, chunk = _render_sequence(min(256, n_frames - start))
            for f in np.asarray(chunk).astype(np.uint8):
                vw.write(f)
        vw.close()

        # Two ingest backends; report the better sustained number.
        # - host_libjpeg: parallel cv2.imdecode -> raw gray frames to device
        #   (wins on multi-core hosts; frame bytes ride the host->TPU link).
        # - tpu_idct: native C++ entropy decode -> DCT coefficients to
        #   device -> MXU dequant+IDCT (host does only the serial Huffman
        #   work; wins when host cores, not the link, are the wall).
        def sources():
            yield "host_libjpeg", lambda: MjpegAviSource(path, gray=True)
            try:
                MjpegAviTpuSource(path)
                yield "tpu_idct", lambda: MjpegAviTpuSource(path)
            except Exception:
                pass

        results = {}
        for backend, make in sources():
            src = make()
            # Decode-only throughput (the ingest ceiling); keep the first
            # batch for compile/ref.
            first = None
            t0 = time.perf_counter()
            n_dec = 0
            for b in src.batches(batch):
                if first is None:
                    first = b
                n_dec += b.shape[0]
            jax.block_until_ready(b) if backend == "tpu_idct" else None
            decode_fps = n_dec / (time.perf_counter() - t0)

            ref = initialize(jax.numpy.asarray(first[0]), cfg)
            fwd = jax.jit(lambda f, r: process_frames(f, r, scene.cam, cfg))
            jax.block_until_ready(fwd(jax.numpy.asarray(first), ref))

            t0 = time.perf_counter()
            n = 0
            for dev_batch in device_feed(src, batch):
                out = fwd(dev_batch, ref)
                n += dev_batch.shape[0]
            jax.block_until_ready(out)
            results[backend] = (n / (time.perf_counter() - t0), decode_fps)

    best = max(results, key=lambda k: results[k][0])
    return {"sustained_fps": results[best][0],
            "decode_only_fps": results[best][1], "backend": best,
            "all": {k: [round(v[0], 1), round(v[1], 1)]
                    for k, v in results.items()}}


def main() -> None:
    _setup_jax()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    decode = bench_decode_fed(n_frames=2048, batch=256)
    if decode is not None:
        print(json.dumps({
            "metric": "sustained_fps_decode_fed",
            "value": round(decode["sustained_fps"], 1),
            "unit": "frames/sec (640x480, MJPG avi -> decode -> TPU)",
            "vs_baseline": round(decode["sustained_fps"] / 1000.0, 3),
            "decode_only_fps": round(decode["decode_only_fps"], 1),
            "decode_backend": decode["backend"],
            "backends": decode["all"],
        }))

    fps = bench_compute(batch, iters)
    print(json.dumps({
        "metric": "marker_to_pose_pipeline_fps_single_chip",
        "value": round(fps, 1),
        "unit": "frames/sec (640x480)",
        "vs_baseline": round(fps / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
