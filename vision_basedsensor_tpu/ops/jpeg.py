"""TPU JPEG decode: entropy-decoded DCT coefficients -> gray frames.

Splits JPEG decoding at its natural hardware boundary. The Huffman entropy
decode is serial and branchy -> native C++ on host (native/jpeg_coeffs.cpp);
everything after — dequantization, the 8x8 inverse DCT, level shift, block
reassembly — is dense linear algebra -> batched XLA ops here (the IDCT is two
8x8 matmuls per block, which XLA maps onto the MXU).

Two transports feed the device:

* DENSE: the full ``(B, bh, bw, 64)`` int16 coefficient tensor. Simple, but
  614 KB/frame at 640x480 — 2x the raw gray bytes, so a bandwidth-limited
  host->TPU link caps it well below the host decode ceiling.
* PACKED (sparse): quantized luma blocks are overwhelmingly zeros, so the
  host ships only structure + nonzeros — per block one meta-mask byte (bit k
  = "mask byte k nonzero"), the nonzero mask bytes, and the nonzero int16
  coefficients (~25-70 KB/frame on real streams). The device expands this
  with two rounds of the same dense primitive — bit-unpack -> exclusive
  prefix sum -> gather — and never scatters (TPU scatters serialize; the
  gathers here are contiguous-ascending and vectorize).

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

# Growable-capacity return codes from native/jpeg_coeffs.cpp. Any OTHER
# nonzero code is a hard parse failure — retrying with bigger buffers would
# just re-parse a malformed JPEG with progressively larger allocations.
_RC_BLOCK_CAP = -11
_RC_VAL_CAP = -100
_RC_MASK_CAP = -101


def _idct8_basis() -> np.ndarray:
    """A[i, k] = alpha(k) cos((2i+1) k pi / 16): pixels = A @ C @ A^T."""
    k = np.arange(8)
    i = np.arange(8)[:, None]
    A = np.cos((2 * i + 1) * k * np.pi / 16.0)
    A *= np.where(k == 0, np.sqrt(1.0 / 8.0), np.sqrt(2.0 / 8.0))
    return A.astype(np.float32)


def _dequant_idct(coeffs: jnp.ndarray, qtable: jnp.ndarray,
                  height: int, width: int) -> jnp.ndarray:
    """``(B, bh, bw, 64)`` float coefficients -> ``(B, height, width)`` gray."""
    A = jnp.asarray(_idct8_basis())
    b, bh, bw, _ = coeffs.shape
    q = qtable.astype(jnp.float32)
    if q.ndim == 2:
        q = q[:, None, None, :]
    c = (coeffs * q).reshape(b, bh, bw, 8, 8)
    # pixels = A @ C @ A^T over every block: two batched 8x8 matmuls.
    px = jnp.einsum("ik,...kl,jl->...ij", A, c, A) + 128.0
    # (B, bh, bw, 8, 8) -> (B, bh*8, bw*8)
    img = px.transpose(0, 1, 3, 2, 4).reshape(b, bh * 8, bw * 8)
    img = jnp.clip(jnp.floor(img + 0.5), 0.0, 255.0)
    return img[:, :height, :width]


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
    return _dequant_idct(coeffs.astype(jnp.float32), qtable, height, width)


def _prefix_gather(stream: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """Expand a packed stream through a 0/1 presence tensor.

    ``bits`` flattened in C order selects consecutive elements of ``stream``:
    output[i] = stream[#set bits before i] where bits[i] else 0. Implemented
    as a hierarchical exclusive prefix (cumsum within the trailing axis +
    cumsum of per-row totals) feeding one gather — dense XLA ops only; the
    gather indices are non-decreasing so memory access stays streaming.
    """
    shape = bits.shape
    b2 = bits.reshape(-1, shape[-1])
    within = jnp.cumsum(b2, axis=1) - b2          # exclusive, per row
    totals = within[:, -1] + b2[:, -1]
    base = jnp.cumsum(totals) - totals            # exclusive, across rows
    idx = base[:, None] + within
    out = jnp.take(stream, idx.reshape(-1), mode="clip").reshape(shape)
    return out.astype(jnp.int32) * bits


def _unpack_bits(bytes_: jnp.ndarray) -> jnp.ndarray:
    """uint8 ``(...,)`` -> 0/1 int32 ``(..., 8)``, LSB first."""
    return (bytes_.astype(jnp.int32)[..., None]
            >> jnp.arange(8, dtype=jnp.int32)) & 1


@functools.partial(jax.jit, static_argnames=("height", "width", "grid"))
def unpack_idct_frames(block_meta: jnp.ndarray, maskbytes: jnp.ndarray,
                       values: jnp.ndarray, qtable: jnp.ndarray, *,
                       height: int, width: int,
                       grid: tuple[int, int]) -> jnp.ndarray:
    """Packed sparse coefficients -> gray frames, all on device.

    Args:
      block_meta: ``(B, bh*bw)`` uint8 meta-mask (bit k = mask byte k
        present), C-order over (frame, block).
      maskbytes: ``(mb_cap,)`` uint8 packed nonzero mask bytes (tail padding
        past the true count is ignored).
      values: ``(val_cap,)`` int16 packed nonzero coefficients.
      qtable: ``(B, 64)`` per-frame quantization tables, natural order.
      height/width: true image dims; grid: ``(bh, bw)`` block grid.

    Returns float32 frames ``(B, height, width)`` in 0..255 — identical to
    :func:`idct_frames` on the equivalent dense tensor (same math, bitwise).
    """
    bh, bw = grid
    b, nb = block_meta.shape
    # Round 1: meta-mask -> the 8 mask bytes of every block.
    bits1 = _unpack_bits(block_meta)                       # (B, nb, 8)
    mask = _prefix_gather(maskbytes, bits1)                # (B, nb, 8)
    # Round 2: mask bits -> the 64 coefficients of every block.
    bits2 = _unpack_bits(mask.astype(jnp.uint8)).reshape(b, nb, 64)
    coeffs = _prefix_gather(values, bits2)                 # (B, nb, 64)
    return _dequant_idct(coeffs.reshape(b, bh, bw, 64).astype(jnp.float32),
                         qtable, height, width)


def _bucket(n: int, minimum: int = 1 << 12) -> int:
    """Smallest 9/8-ratio geometric bucket >= n: pads device-bound streams
    so jit shapes change rarely (a steady scene lands in 1-2 buckets, each a
    one-time compile behind the persistent cache) while capping the padding
    overhead at 12.5% — a power-of-two bucket would average ~30% extra
    link bytes, which at ~70 KB/frame is the difference between clearing
    the 1000 fps ingest bar and missing it."""
    b = minimum
    while b < n:
        b += max(minimum, b >> 3)
    return b


class MjpegBatchDecoder:
    """Batch JPEG -> device gray frames via the native entropy decoder.

    Stateless w.r.t. the stream apart from the geometry learned from the
    first frame (an MJPEG stream's frames share it). ``decode`` ships the
    dense coefficient tensor; ``decode_packed`` ships the sparse transport
    (see module docstring) and records its byte accounting in
    ``last_stats``. Construction raises when the native library can't be
    built — callers should then use host decode (io/video.MjpegAviSource).
    """

    def __init__(self):
        from vision_basedsensor_tpu.native import load_jpeg_lib
        self._lib = load_jpeg_lib()
        if self._lib is None:
            raise RuntimeError("native JPEG decoder unavailable (no C++ "
                               "compiler); use host decode")
        self._meta: tuple | None = None  # (w, h, bw, bh)
        self._qtable: np.ndarray | None = None
        self._mb_cap = 0
        self._val_cap = 0
        # Persistent packed-output buffers: reallocating ~12 MB per batch
        # would cost the 1-core host real page-fault time at 1000 fps.
        self._maskbytes: np.ndarray | None = None
        self._values: np.ndarray | None = None
        self.last_stats: dict | None = None

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
            # Only grow for the capacity code — any other rc is a parse
            # failure, and re-parsing a malformed JPEG with progressively
            # larger allocations is wasted work on a weak host.
            if rc != _RC_BLOCK_CAP or cap >= (8192 // 8) ** 2:
                raise ValueError(f"JPEG parse failed (rc={rc})")
            cap *= 4
        self._meta = (meta[0], meta[1], meta[2], meta[3])
        self._qtable = np.array(q[:], np.uint16)

    def _batch_args(self, jpegs: list[bytes]):
        import ctypes
        if self._meta is None:
            self._probe(jpegs[0])
        data = b"".join(jpegs)
        n = len(jpegs)
        offsets = np.zeros(n, np.int64)
        sizes = np.zeros(n, np.int32)
        pos = 0
        for i, j in enumerate(jpegs):
            offsets[i] = pos
            sizes[i] = len(j)
            pos += len(j)
        return (data,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n)

    def decode(self, jpegs: list[bytes]) -> jnp.ndarray:
        """Decode a batch of same-geometry JPEGs to ``(B, H, W)`` float32
        via the DENSE coefficient transport."""
        import ctypes
        args = self._batch_args(jpegs)
        w, h, bw, bh = self._meta
        n = args[-1]
        blocks = bw * bh
        coeffs = np.empty((n, bh, bw, 64), np.int16)
        meta = (ctypes.c_int32 * 4)()
        qtables = np.empty((n, 64), np.uint16)
        got = self._lib.vbs_mjpeg_batch_y_coeffs(
            *args,
            coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), blocks,
            meta, qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        if got != n:
            raise ValueError(f"JPEG batch decode failed at frame {got}")
        self.last_stats = {"transport": "dense", "frames": n,
                           "bytes_shipped": coeffs.nbytes + qtables.nbytes}
        return idct_frames(jnp.asarray(coeffs), jnp.asarray(qtables),
                           height=h, width=w)

    def decode_packed(self, jpegs: list[bytes]) -> jnp.ndarray:
        """Decode a batch to ``(B, H, W)`` float32 via the PACKED (sparse)
        transport — identical output to :meth:`decode`, a fraction of the
        host->device bytes."""
        import ctypes
        args = self._batch_args(jpegs)
        w, h, bw, bh = self._meta
        n = args[-1]
        blocks = bw * bh
        if self._mb_cap == 0:
            # First call: size the streams for typical sparsity (~2 mask
            # bytes and ~4 values per block) and grow on the specific
            # capacity rc codes. Hard ceiling = the dense equivalent.
            self._mb_cap = 2 * blocks * n
            self._val_cap = 4 * blocks * n
        block_meta = np.empty((n, blocks), np.uint8)
        meta = (ctypes.c_int32 * 4)()
        qtables = np.empty((n, 64), np.uint16)
        counts = np.zeros(2, np.int64)
        while True:
            if self._maskbytes is None or self._maskbytes.size < self._mb_cap:
                self._maskbytes = np.empty(self._mb_cap, np.uint8)
            if self._values is None or self._values.size < self._val_cap:
                self._values = np.empty(self._val_cap, np.int16)
            maskbytes, values = self._maskbytes, self._values
            got = self._lib.vbs_mjpeg_batch_y_coeffs_packed(
                *args,
                block_meta.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                maskbytes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self._mb_cap,
                values.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                self._val_cap,
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                blocks, meta,
                qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
            if got == n:
                break
            if got == _RC_MASK_CAP:
                self._mb_cap = min(2 * self._mb_cap, 8 * blocks * n)
            elif got == _RC_VAL_CAP:
                self._val_cap = min(2 * self._val_cap, 64 * blocks * n)
            else:
                raise ValueError(f"JPEG batch decode failed at frame {got}")
        mb_n, val_n = int(counts[0]), int(counts[1])
        mb_b = min(_bucket(mb_n), maskbytes.size)
        val_b = min(_bucket(val_n), values.size)
        self.last_stats = {
            "transport": "packed", "frames": n, "nnz": val_n,
            "bytes_shipped": block_meta.nbytes + mb_b + 2 * val_b
                             + qtables.nbytes,
            "bytes_dense": n * blocks * 128 + qtables.nbytes,
        }
        # Ship COPIES: the device transfer of these arrays is asynchronous,
        # and the persistent native-output buffers above are overwritten by
        # the next batch's decode (often on a prefetch thread) while this
        # batch may still be in flight.
        return unpack_idct_frames(
            jnp.asarray(block_meta), jnp.asarray(maskbytes[:mb_b].copy()),
            jnp.asarray(values[:val_b].copy()), jnp.asarray(qtables),
            height=h, width=w, grid=(bh, bw))
