"""MJPEG-over-HTTP client: consume the acquisition server's stream directly.

In the reference the Pi streams MJPEG and an operator records an .avi by hand
for offline processing (SURVEY.md §1 stage 0->1). Here the stream is a
first-class live source: this client parses ``multipart/x-mixed-replace``
frames and feeds them straight into the batched TPU pipeline (see
``cli run-live``), closing the sensor -> host -> TPU loop in real time.
"""
from __future__ import annotations

import urllib.request
from typing import Iterator

import numpy as np

try:
    import cv2 as _cv2
except Exception:  # pragma: no cover
    _cv2 = None


def _decode_jpeg(buf: bytes) -> np.ndarray:
    if _cv2 is not None:
        img = _cv2.imdecode(np.frombuffer(buf, np.uint8), _cv2.IMREAD_COLOR)
        if img is not None:
            return img
    from io import BytesIO

    from PIL import Image
    return np.asarray(Image.open(BytesIO(buf)))[..., ::-1].copy()  # RGB->BGR


def iter_mjpeg(url: str, boundary: bytes = b"--frame",
               timeout: float = 10.0, max_frames: int | None = None
               ) -> Iterator[np.ndarray]:
    """Yield decoded BGR frames from an MJPEG stream URL."""
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        buf = b""
        count = 0
        while max_frames is None or count < max_frames:
            chunk = resp.read(4096)
            if not chunk:
                break
            buf += chunk
            while True:
                start = buf.find(b"\xff\xd8")  # JPEG SOI
                end = buf.find(b"\xff\xd9", start + 2)  # JPEG EOI
                if start == -1 or end == -1:
                    break
                frame = _decode_jpeg(buf[start:end + 2])
                buf = buf[end + 2:]
                count += 1
                yield frame
                if max_frames is not None and count >= max_frames:
                    return


class MjpegVideoSource:
    """VideoSource adapter over a live MJPEG stream."""

    def __init__(self, url: str, fps: float = 12.0,
                 max_frames: int | None = None):
        self.url = url
        self._fps = fps
        self._max = max_frames

    @property
    def fps(self) -> float:
        return self._fps

    def batches(self, batch_size: int):
        buf = []
        for frame in iter_mjpeg(self.url, max_frames=self._max):
            buf.append(frame)
            if len(buf) == batch_size:
                yield np.stack(buf)
                buf = []
        if buf:
            yield np.stack(buf)
