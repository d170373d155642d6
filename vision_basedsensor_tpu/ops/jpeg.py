"""TPU JPEG decode: entropy-decoded DCT coefficients -> gray frames.

Splits JPEG decoding at its natural hardware boundary. The Huffman entropy
decode is serial and branchy -> native C++ on host (native/jpeg_coeffs.cpp);
everything after — dequantization, the 8x8 inverse DCT, level shift, block
reassembly — is dense linear algebra -> batched XLA ops here (the IDCT is two
8x8 matmuls per block, which XLA maps onto the MXU).

This is the framework's answer to the host-decode ingest wall
(benchmarks/README.md): on a 1-core driver host, full libjpeg decode
(cv2.imdecode) tops out near ~275 fps at 640x480; entropy decode alone is
several times cheaper, and the FLOP-heavy rest rides the TPU.

Luma only: the perception pipeline is grayscale (marker_detection.py:114),
and libjpeg's IMREAD_GRAYSCALE output is exactly the Y channel.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _idct8_basis() -> np.ndarray:
    """A[i, k] = alpha(k) cos((2i+1) k pi / 16): pixels = A @ C @ A^T."""
    k = np.arange(8)
    i = np.arange(8)[:, None]
    A = np.cos((2 * i + 1) * k * np.pi / 16.0)
    A *= np.where(k == 0, np.sqrt(1.0 / 8.0), np.sqrt(2.0 / 8.0))
    return A.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def idct_frames(coeffs: jnp.ndarray, qtable: jnp.ndarray, *,
                height: int, width: int) -> jnp.ndarray:
    """Quantized luma coefficients -> gray frames, all on device.

    Args:
      coeffs: ``(B, bh, bw, 64)`` int16, natural (de-zigzagged) order.
      qtable: ``(B, 64)`` or ``(64,)`` quantization table(s), natural order
        (PER FRAME: MJPEG writers adapt quality frame to frame).
      height/width: true image dims (block grid may overhang).

    Returns float32 frames ``(B, height, width)`` in 0..255, matching
    libjpeg within IDCT rounding (~±1 gray level).
    """
    A = jnp.asarray(_idct8_basis())
    b, bh, bw, _ = coeffs.shape
    q = qtable.astype(jnp.float32)
    if q.ndim == 2:
        q = q[:, None, None, :]
    c = coeffs.astype(jnp.float32) * q
    c = c.reshape(b, bh, bw, 8, 8)
    # pixels = A @ C @ A^T over every block: two batched 8x8 matmuls.
    px = jnp.einsum("ik,...kl,jl->...ij", A, c, A) + 128.0
    # (B, bh, bw, 8, 8) -> (B, bh*8, bw*8)
    img = px.transpose(0, 1, 3, 2, 4).reshape(b, bh * 8, bw * 8)
    img = jnp.clip(jnp.floor(img + 0.5), 0.0, 255.0)
    return img[:, :height, :width]


class MjpegBatchDecoder:
    """Batch JPEG -> device gray frames via the native entropy decoder.

    Stateless w.r.t. the stream apart from the geometry learned from the
    first frame (an MJPEG stream's frames share it). Falls back to ``None``
    construction when the native library can't be built — callers should
    then use host decode (io/video.MjpegAviSource).
    """

    def __init__(self):
        from vision_basedsensor_tpu.native import load_jpeg_lib
        self._lib = load_jpeg_lib()
        if self._lib is None:
            raise RuntimeError("native JPEG decoder unavailable (no C++ "
                               "compiler); use host decode")
        self._meta: tuple | None = None  # (w, h, bw, bh)
        self._qtable: np.ndarray | None = None

    def _probe(self, jpeg: bytes) -> None:
        import ctypes
        meta = (ctypes.c_int32 * 4)()
        q = (ctypes.c_uint16 * 64)()
        # Start with 1080p block capacity and grow on demand — the old
        # fixed 8Kx8K probe buffer was a 134 MB host allocation per decoder
        # (significant on the weak single-core hosts this path targets).
        cap = (1920 // 8) * (1088 // 8)
        while True:
            buf = np.empty((cap, 64), np.int16)
            rc = self._lib.vbs_jpeg_y_coeffs(
                jpeg, len(jpeg),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), cap,
                meta, q)
            if rc == 0:
                break
            if cap >= (8192 // 8) ** 2:
                raise ValueError(f"JPEG parse failed (rc={rc})")
            cap *= 4
        self._meta = (meta[0], meta[1], meta[2], meta[3])
        self._qtable = np.array(q[:], np.uint16)

    def decode(self, jpegs: list[bytes]) -> jnp.ndarray:
        """Decode a batch of same-geometry JPEGs to ``(B, H, W)`` float32."""
        import ctypes
        if self._meta is None:
            self._probe(jpegs[0])
        w, h, bw, bh = self._meta
        n = len(jpegs)
        blocks = bw * bh
        data = b"".join(jpegs)
        offsets = np.zeros(n, np.int64)
        sizes = np.zeros(n, np.int32)
        pos = 0
        for i, j in enumerate(jpegs):
            offsets[i] = pos
            sizes[i] = len(j)
            pos += len(j)
        coeffs = np.empty((n, bh, bw, 64), np.int16)
        meta = (ctypes.c_int32 * 4)()
        qtables = np.empty((n, 64), np.uint16)
        got = self._lib.vbs_mjpeg_batch_y_coeffs(
            data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), blocks,
            meta, qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        if got != n:
            raise ValueError(f"JPEG batch decode failed at frame {got}")
        return idct_frames(jnp.asarray(coeffs), jnp.asarray(qtables),
                           height=h, width=w)
