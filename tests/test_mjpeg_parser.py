"""MJPEG client parser: proper multipart handling (ADVICE round 1).

A JPEG with an embedded EXIF thumbnail contains an inner SOI/EOI pair;
scanning raw bytes for JPEG magic (the old parser) truncates such frames at
the thumbnail's EOI. The parser must use the multipart boundary +
Content-Length structure instead.
"""
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from vision_basedsensor_tpu.io.mjpeg import iter_mjpeg

cv2 = pytest.importorskip("cv2")


def _jpeg_with_thumbnail(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (48, 64, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    real = enc.tobytes()
    thumb = cv2.imencode(".jpg", img[::4, ::4])[1].tobytes()
    payload = b"Exif\x00\x00" + thumb          # inner SOI+EOI inside APP1
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    jpeg = real[:2] + app1 + real[2:]
    # Sanity: still decodable, and the naive magic-scan WOULD truncate it.
    assert cv2.imdecode(np.frombuffer(jpeg, np.uint8), 1) is not None
    first_eoi = jpeg.find(b"\xff\xd9")
    assert first_eoi != -1 and first_eoi < len(jpeg) - 2
    return jpeg, img


def _serve(parts: bytes):
    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type",
                             "multipart/x-mixed-replace; boundary=frame")
            self.end_headers()
            self.wfile.write(parts)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


@pytest.mark.parametrize("with_length", [True, False])
def test_thumbnail_jpeg_survives_parsing(with_length):
    jpeg, img = _jpeg_with_thumbnail()
    part_hdr = b"--frame\r\nContent-Type: image/jpeg\r\n"
    if with_length:
        part_hdr += b"Content-Length: " + str(len(jpeg)).encode() + b"\r\n"
    stream = (part_hdr + b"\r\n" + jpeg + b"\r\n") * 3 + b"--frame--\r\n"

    srv = _serve(stream)
    try:
        url = f"http://127.0.0.1:{srv.server_port}/stream"
        frames = list(iter_mjpeg(url, max_frames=3))
    finally:
        srv.shutdown()
    assert len(frames) == 3
    ref = cv2.imdecode(np.frombuffer(jpeg, np.uint8), 1)
    for f in frames:
        # Full frame decoded (not the truncated-at-thumbnail garbage).
        assert f.shape == ref.shape
        np.testing.assert_array_equal(f, ref)


def test_boundary_param_with_leading_dashes_normalized():
    """Review finding (round 2): IP cameras that (nonconformingly) include
    the leading dashes in the Content-Type boundary param made the parser
    search for '----x' while the stream delimits with '--x' — never
    matching, growing the buffer without bound. The param is normalized."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    jpeg, img = _jpeg_with_thumbnail()
    part = (b"--frameboundary\r\n"
            b"Content-Type: image/jpeg\r\n"
            + f"Content-Length: {len(jpeg)}\r\n\r\n".encode()
            + jpeg + b"\r\n")

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header(
                "Content-Type",
                "multipart/x-mixed-replace; boundary=--frameboundary")
            self.end_headers()
            self.wfile.write(part * 2)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        frames = list(iter_mjpeg(
            f"http://127.0.0.1:{srv.server_address[1]}/", max_frames=2))
    finally:
        srv.shutdown()
        srv.server_close()
    assert len(frames) == 2
    assert frames[0].shape == img.shape
