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


def iter_mjpeg_bytes(url: str, boundary: bytes | None = None,
                     timeout: float = 10.0, max_frames: int | None = None
                     ) -> Iterator[bytes]:
    """Yield raw JPEG payloads from an MJPEG stream URL (no decode).

    The undecoded form feeds zero-transcode recording (``cli record`` writes
    the received JPEG bytes verbatim into an AVI container — the reference
    operator's record-to-avi step, ``collecting.py:177-191``, without
    spending the weak host's CPU on a decode+re-encode round trip).

    Parses the ``multipart/x-mixed-replace`` structure properly: the
    boundary comes from the Content-Type header (overridable), each part's
    headers are read, and the payload length comes from Content-Length when
    the server sends one (ours does) — scanning raw bytes for JPEG
    SOI/EOI magic would truncate frames whose EXIF/JFIF thumbnail embeds an
    inner EOI (real cameras do this; cv2.imencode doesn't).
    Without Content-Length the payload runs to the next boundary.
    """
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        if boundary is None:
            ctype = resp.headers.get("Content-Type", "")
            b = "frame"
            for piece in ctype.split(";"):
                piece = piece.strip()
                if piece.startswith("boundary="):
                    b = piece[len("boundary="):].strip('"')
            # RFC 2046: the delimiter is "--" + boundary param. Some IP
            # cameras nonconformingly include the leading dashes IN the
            # param; normalizing prevents searching for "----x" while the
            # stream delimits with "--x" (which would never match and grow
            # buf without bound).
            boundary = b"--" + b.lstrip("-").encode()

        buf = b""
        count = 0
        while max_frames is None or count < max_frames:
            chunk = resp.read(65536)
            if not chunk:
                break
            buf += chunk
            while True:
                start = buf.find(boundary)
                if start == -1:
                    break
                hdr_end = buf.find(b"\r\n\r\n", start)
                if hdr_end == -1:
                    break
                headers = buf[start + len(boundary):hdr_end]
                length = None
                for line in headers.split(b"\r\n"):
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-length":
                        try:
                            length = int(v.strip())
                        except ValueError:
                            length = None
                payload_start = hdr_end + 4
                if length is not None:
                    if len(buf) < payload_start + length:
                        break  # need more bytes
                    frame_bytes = buf[payload_start:payload_start + length]
                    buf = buf[payload_start + length:]
                else:
                    nxt = buf.find(boundary, payload_start)
                    if nxt == -1:
                        break
                    frame_bytes = buf[payload_start:nxt].rstrip(b"\r\n")
                    buf = buf[nxt:]
                if not frame_bytes:
                    continue
                count += 1
                yield frame_bytes
                if max_frames is not None and count >= max_frames:
                    return


def iter_mjpeg(url: str, boundary: bytes | None = None,
               timeout: float = 10.0, max_frames: int | None = None
               ) -> Iterator[np.ndarray]:
    """Yield decoded BGR frames from an MJPEG stream URL (see
    :func:`iter_mjpeg_bytes` for the parsing contract)."""
    for frame_bytes in iter_mjpeg_bytes(url, boundary, timeout, max_frames):
        yield _decode_jpeg(frame_bytes)


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
