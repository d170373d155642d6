"""Fused per-peak window-sums Pallas kernel.

The XLA backend (ops/moments.py:window_sums_xla) materializes three
``(K, P, P)`` patch tensors in HBM (a gather + full round-trip per field).
This kernel instead walks the K peaks inside one program per frame,
double-buffering window DMAs HBM->VMEM and accumulating all 24 moment
sums in VMEM — each window's pixels cross the memory system exactly once.

Layout: for peak k the kernel copies a ``(P+8, 256)`` aligned window
(8-aligned rows per Mosaic's f32 sublane tiling, 128-aligned columns per the
lane tiling) for each of the three fields into a two-slot VMEM scratch, then
reduces with the radial-cutoff + halfplane gates selecting the active pixels
(unaligned slices are not lowerable; the gates bound the region anyway, and
the aligned 256-column window always contains the full cutoff disk). Peak
coordinates, halfplane parameters, and the output sums live in SMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_basedsensor_tpu.config import DetectProfile
from vision_basedsensor_tpu.ops.moments import (NUM_SUMS, CutGeometry,
                                                soft_weight_remap)
from vision_basedsensor_tpu.ops.peaks import Peaks


def _accumulate(band, area, gray, start_ref, peak_ref, geom_ref, out_ref, k,
                rows_block: int, cols_block: int, cutoff: float,
                soft_floor: float):
    """Reduce one peak's (rows_block, cols_block) window of the three fields
    into the 24 moment sums (ops/moments.py layout) at ``out_ref[0, k]``."""
    x0 = start_ref[0, k, 0]
    y0 = start_ref[0, k, 1]
    px = peak_ref[0, k, 0]
    py = peak_ref[0, k, 1]

    # Mosaic iota must be integer-typed; cast after.
    col = jax.lax.broadcasted_iota(jnp.int32, (rows_block, cols_block), 1).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows_block, cols_block), 0).astype(jnp.float32)
    dx = col + (x0.astype(jnp.float32) - px)
    dy = row + (y0.astype(jnp.float32) - py)

    keep = (dx * dx + dy * dy) <= cutoff * cutoff
    for j in range(3):
        ex = geom_ref[0, k, 3 * j + 0]
        ey = geom_ref[0, k, 3 * j + 1]
        rhs = geom_ref[0, k, 3 * j + 2]
        keep = keep & ((dx * ex + dy * ey) <= rhs + 1e-3)
    cut = keep.astype(jnp.float32)

    b = band * cut
    a = area * cut
    g_in = jnp.where(keep, gray, jnp.inf)
    lo = jnp.min(g_in)
    hi = jnp.max(jnp.where(keep, gray, -jnp.inf))
    w = jnp.clip((hi - gray) / jnp.maximum(hi - lo, 1e-3), 0.0, 1.0)
    w = soft_weight_remap(w, soft_floor) * cut

    wh = (w >= 0.5).astype(jnp.float32)
    vals = jnp.stack([
        jnp.sum(b), jnp.sum(b * dx), jnp.sum(b * dy),
        jnp.sum(a), jnp.sum(a * dx), jnp.sum(a * dy),
        jnp.sum(a * dx * dx), jnp.sum(a * dy * dy), jnp.sum(a * dx * dy),
        jnp.sum(w), jnp.sum(w * dx), jnp.sum(w * dy),
        jnp.sum(w * dx * dx), jnp.sum(w * dy * dy), jnp.sum(w * dx * dy),
        jnp.sum(wh), jnp.sum(wh * dx), jnp.sum(wh * dy),
        jnp.sum(wh * dx * dx), jnp.sum(wh * dy * dy), jnp.sum(wh * dx * dy),
        lo, hi, jnp.sum(cut),
        jnp.sum(w * dx * dx * dx), jnp.sum(w * dx * dx * dy),
        jnp.sum(w * dx * dy * dy), jnp.sum(w * dy * dy * dy),
    ])
    for i in range(vals.shape[0]):
        out_ref[0, k, i] = vals[i]


def _kernel(start_ref, peak_ref, geom_ref, band_hbm, area_hbm, gray_hbm,
            out_ref, rows, sems, *, rows_block: int, cols_block: int,
            cutoff: float, soft_floor: float):
    frame = pl.program_id(0)
    k_total = out_ref.shape[1]

    def _dma(slot, k, f, src):
        # Aligned by construction; the hints let Mosaic prove it.
        y0 = pl.multiple_of(start_ref[0, k, 1], 8)
        x0 = pl.multiple_of(start_ref[0, k, 0], 128)
        return pltpu.make_async_copy(
            src.at[frame, pl.ds(y0, rows_block), pl.ds(x0, cols_block)],
            rows.at[slot, f],
            sems.at[slot, f],
        )

    def start_dma(slot, k):
        for f, src in enumerate((band_hbm, area_hbm, gray_hbm)):
            _dma(slot, k, f, src).start()

    def wait_dma(slot, k):
        for f, src in enumerate((band_hbm, area_hbm, gray_hbm)):
            _dma(slot, k, f, src).wait()

    start_dma(0, 0)

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < k_total)
        def _():
            start_dma(jax.lax.rem(k + 1, 2), k + 1)

        wait_dma(slot, k)
        _accumulate(rows[slot, 0], rows[slot, 1], rows[slot, 2],
                    start_ref, peak_ref, geom_ref, out_ref, k,
                    rows_block, cols_block, cutoff, soft_floor)
        return ()

    jax.lax.fori_loop(0, k_total, body, ())


def _packed_kernel(start_ref, peak_ref, geom_ref, packed_hbm, out_ref, rows,
                   sems, *, rows_block: int, cols_block: int, cutoff: float,
                   soft_floor: float, n_slots: int):
    """Single-DMA variant: the three fields arrive packed as
    ``gray + 256*band + 512*area`` (ops/pallas/fields.py) — one window copy
    per peak instead of three, and an ``n_slots``-deep prefetch ring to hide
    the per-DMA issue latency the 3-field kernel pays 3x per peak."""
    frame = pl.program_id(0)
    k_total = out_ref.shape[1]

    def _dma(slot, k):
        y0 = pl.multiple_of(start_ref[0, k, 1], 8)
        x0 = pl.multiple_of(start_ref[0, k, 0], 128)
        return pltpu.make_async_copy(
            packed_hbm.at[frame, pl.ds(y0, rows_block), pl.ds(x0, cols_block)],
            rows.at[slot],
            sems.at[slot],
        )

    for p in range(n_slots - 1):
        @pl.when(p < k_total)
        def _(p=p):
            _dma(p, p).start()

    def body(k, _):
        slot = jax.lax.rem(k, n_slots)

        @pl.when(k + n_slots - 1 < k_total)
        def _():
            _dma(jax.lax.rem(k + n_slots - 1, n_slots), k + n_slots - 1).start()

        _dma(slot, k).wait()

        v = rows[slot]
        # Exact unpack: area/band are 0/1, gray in [0, 256) (integer-quantized
        # or fractional after undistortion; v < 1024 keeps gray's low bits
        # well inside f32's 24-bit mantissa).
        area = jnp.floor(v * (1.0 / 512.0))
        r = v - 512.0 * area
        band = jnp.floor(r * (1.0 / 256.0))
        gray = r - 256.0 * band
        _accumulate(band, area, gray, start_ref, peak_ref, geom_ref, out_ref,
                    k, rows_block, cols_block, cutoff, soft_floor)
        return ()

    jax.lax.fori_loop(0, k_total, body, ())


def _prep(h: int, w: int, peaks: Peaks, geom: CutGeometry,
          profile: DetectProfile):
    """Shared window/geometry staging for both window-sums kernels: aligned
    DMA start offsets + packed halfplane parameters."""
    p = profile.patch_size
    # Equivalence with window_sums_xla requires the radial cutoff disk to
    # fit STRICTLY inside the clipped p x p patch: the round-to-int patch
    # start puts the peak within +-0.5 px of the patch centre, so a pixel
    # at exactly distance p/2 (just outside the p-wide XLA patch) can still
    # satisfy d2 <= cutoff^2 in the kernels' aligned windows — measured,
    # cutoff == p/2 diverges by 1-2 gated pixels per peak. cutoff <=
    # p/2 - 1 guarantees the disk's integer pixels all land in the patch.
    # Enforced here; tests/test_pallas_moments.py checks border peaks.
    if profile.radial_cutoff_px > p / 2 - 1:
        raise ValueError(
            f"radial_cutoff_px ({profile.radial_cutoff_px}) must be <= "
            f"patch_size/2 - 1 ({p / 2 - 1}) for backend equivalence")
    half = p // 2
    rows_block = p + 8  # slack so the 8-aligned start still covers the window
    if h < rows_block:
        raise ValueError(f"frame height {h} < patch_size + 8 ({rows_block}); "
                         "the row DMA would read out of bounds — use the XLA "
                         "backend (detect/detector.py falls back automatically)")
    # Rows: the DMA start is clipped to h - rows_block, which must itself be
    # 8-aligned or the pl.multiple_of(y0, 8) promise below is FALSE for
    # bottom-edge peaks and Mosaic may silently corrupt the copies on real
    # TPU (ADVICE round 2). No block size fixes this: with an 8-aligned
    # start cap and any block size, the reachable window end tops out at the
    # largest 8-multiple <= h, leaving the last h % 8 rows uncoverable. All
    # real profiles (480/960/1080 rows) are 8-aligned; anything else takes
    # the XLA backend.
    if h % 8 != 0:
        raise ValueError(f"window-sums kernels need H % 8 == 0, got {h}; "
                         "use the XLA backend (the detector falls back "
                         "automatically)")
    # Columns: a 128-aligned 256-wide window always contains the cutoff disk
    # (disk x-span <= 2*cutoff + 128-alignment slack < 256 for cutoff <= 63).
    # The DMA offset hints (pl.multiple_of(x0, 128)) are only true when the
    # image width is lane-aligned; an unaligned width would make Mosaic
    # assume alignment that doesn't hold and silently corrupt the copies.
    if w % 128 != 0:
        raise ValueError(f"window-sums kernels need W % 128 == 0, got {w}; "
                         "use the XLA backend (the detector falls back "
                         "automatically)")
    cols_block = 256 if w >= 256 else w
    cx = jnp.clip(jnp.round(peaks.xy[..., 0]).astype(jnp.int32) - half, 0, w - p)
    cy = jnp.clip(jnp.round(peaks.xy[..., 1]).astype(jnp.int32) - half, 0, h - p)
    cy_exact = cy
    # Mosaic DMA offsets must be multiples of the (8, 128) f32 tiling.
    cy = jnp.clip((cy // 8) * 8, 0, max(h - rows_block, 0))
    cxa = jnp.clip((cx // 128) * 128, 0, max(w - cols_block, 0))
    start = jnp.stack([cxa, cy], axis=-1)                      # (B, K, 2)
    rhs = jnp.minimum(geom.rhs, 3e38)
    geom_packed = jnp.stack(
        [geom.ex[..., 0], geom.ey[..., 0], rhs[..., 0],
         geom.ex[..., 1], geom.ey[..., 1], rhs[..., 1],
         geom.ex[..., 2], geom.ey[..., 2], rhs[..., 2]],
        axis=-1).astype(jnp.float32)                           # (B, K, 9)
    return start, geom_packed, rows_block, cols_block, cx, cy_exact


def window_sums_packed(packed: jnp.ndarray, peaks: Peaks, geom: CutGeometry,
                       profile: DetectProfile,
                       interpret: bool | None = None,
                       n_slots: int = 4) -> jnp.ndarray:
    """Like :func:`window_sums_pallas` but reading the single packed field
    ``gray + 256*band + 512*area_open`` produced by the fused field kernel
    (ops/pallas/fields.py) — one DMA per peak instead of three, with an
    ``n_slots``-deep prefetch ring."""
    squeeze = packed.ndim == 2
    if squeeze:
        packed = packed[None]
        peaks = jax.tree.map(lambda v: v[None], peaks)
        geom = jax.tree.map(lambda v: v[None], geom)
    b_frames, h, w = packed.shape
    k = peaks.xy.shape[-2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    start, geom_packed, rows_block, cols_block, _, _ = _prep(h, w, peaks,
                                                             geom, profile)

    kern = functools.partial(_packed_kernel, rows_block=rows_block,
                             cols_block=cols_block,
                             cutoff=float(profile.radial_cutoff_px),
                             soft_floor=float(profile.soft_floor),
                             n_slots=n_slots)
    out = pl.pallas_call(
        kern,
        grid=(b_frames,),
        out_shape=jax.ShapeDtypeStruct((b_frames, k, NUM_SUMS), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, k, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),   # start
            pl.BlockSpec((1, k, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),   # peak xy
            pl.BlockSpec((1, k, 9), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),   # geom
            pl.BlockSpec(memory_space=pl.ANY),       # packed (B, H, W)
        ],
        out_specs=pl.BlockSpec((1, k, NUM_SUMS), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, rows_block, cols_block), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
        interpret=interpret,
    )(start, peaks.xy.astype(jnp.float32), geom_packed, packed)
    return out[0] if squeeze else out


def _gather_kernel(start_ref, packed_hbm, out_ref, rows, sems, *,
                   rows_block: int, cols_block: int, out_rows: int,
                   out_cols: int, n_slots: int, pack: int):
    """Copy every peak's window into the output block, re-aligned to the
    patch start; with ``pack == 2``, TWO peaks' windows share each
    128-lane output row (window ``pack*i + j`` in lanes
    ``[64*j, 64*j + 64)``).

    The moment math happens in batched XLA afterwards
    (ops/moments.py:moments_from_patches[_paired]): measured on TPU, the
    in-kernel per-peak accumulate loop is vector-issue-bound at
    ~68 us/frame (the (rows, 256) window is 7x the cutoff disk's bounding
    box and every peak pays ~30 vector ops over it serially), while
    gather + fused XLA reductions over all B*K windows at once wins —
    and packing two windows per row halves that reduction's element
    count, the remaining cost driver.

    Each aligned ``(rows_block, cols_block)`` DMA lands in a scratch ring
    slot and is rolled (tpu.dynamic_rotate on both axes) so the unaligned
    patch start sits at row 0 / lane ``64*j``. The cutoff disk lies
    strictly inside the clipped patch's rows ``[cy, cy+p)`` and columns
    ``[cx, cx+p]`` (cutoff <= p/2 - 1.5 after the round-to-int patch
    start's +-0.5: 18 vs 20 low-res, 30 vs 32 high-res), so the stored
    window loses no gated pixel; for pack=2 every pixel that can pass the
    downstream gates (cutoff disk ∩ in-image ∩ halfplanes) additionally
    lies within the 64-lane slot (half + cutoff + 0.5 <= 62.5 for both
    built-in profiles; right-clipped patches are bounded by the in-image
    gate at col < patch_size <= 64).
    """
    frame = pl.program_id(0)
    k_out = out_ref.shape[1]
    k_total = pack * k_out

    def _dma(slot, k):
        y0 = pl.multiple_of(start_ref[0, k, 1], 8)
        x0 = pl.multiple_of(start_ref[0, k, 2], 128)
        return pltpu.make_async_copy(
            packed_hbm.at[frame, pl.ds(y0, rows_block), pl.ds(x0, cols_block)],
            rows.at[slot],
            sems.at[slot],
        )

    for p in range(min(n_slots, k_total)):
        _dma(p, p).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (out_rows, out_cols), 1)

    def body(i, _):
        merged = None
        for j in range(pack):
            k = pack * i + j
            slot = jax.lax.rem(k, n_slots)
            _dma(slot, k).wait()
            # Dynamic rolls: the exact patch start (x in start[0], y in
            # start[3]; aligned DMA origins in start[2]/start[1]) moves to
            # lane 64*j / row 0 (index i -> i + shift, non-negative).
            sx = start_ref[0, k, 0] - start_ref[0, k, 2]
            sy = start_ref[0, k, 3] - start_ref[0, k, 1]
            cshift = jax.lax.rem(
                jnp.int32(cols_block) - sx + jnp.int32(64 * j),
                jnp.int32(cols_block))
            rshift = jax.lax.rem(jnp.int32(rows_block) - sy,
                                 jnp.int32(rows_block))
            v = pltpu.roll(pltpu.roll(rows[slot], cshift, 1), rshift, 0)
            v = v[:out_rows, :out_cols]
            # The consumed slot immediately prefetches its next occupant.
            @pl.when(k + n_slots < k_total)
            def _():
                _dma(slot, k + n_slots).start()
            merged = v if merged is None else jnp.where(lane < 64 * j,
                                                        merged, v)
        out_ref[0, i] = merged
        return ()

    jax.lax.fori_loop(0, k_out, body, ())


def gather_windows(packed: jnp.ndarray, peaks: Peaks, geom: CutGeometry,
                   profile: DetectProfile, interpret: bool | None = None,
                   n_slots: int = 4, pack: int = 1):
    """Gather each peak's packed-field window into a dense
    ``(B, K // pack, patch_size, out_cols)`` tensor (one DMA per peak,
    rolled so the patch's clipped (x, y) start is element ``(0, 64*j)``
    for window ``pack*i + j``). Returns ``(patches, start)`` with
    ``start`` ``(B, K, 2)`` the exact clipped patch origins for
    absolute-coordinate reconstruction. ``pack=2`` requires an even peak
    count and ``patch_size <= 64`` (see the kernel's slot-containment
    proof); both built-in profiles qualify.
    """
    squeeze = packed.ndim == 2
    if squeeze:
        packed = packed[None]
        peaks = jax.tree.map(lambda v: v[None], peaks)
        geom = jax.tree.map(lambda v: v[None], geom)
    b_frames, h, w = packed.shape
    k = peaks.xy.shape[-2]
    if k % pack != 0:
        raise ValueError(f"pack={pack} gather needs an even peak count, "
                         f"got {k}")
    if pack > 1 and profile.patch_size > 64:
        raise ValueError(f"paired gather needs patch_size <= 64, got "
                         f"{profile.patch_size} (64-lane slot per window)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    start_a, _, rows_block, cols_block, cx, cy = _prep(h, w, peaks, geom,
                                                       profile)
    out_cols = min(128, cols_block)
    out_rows = profile.patch_size        # multiple of 8 in both profiles
    # SMEM quad per peak: exact x, aligned y, aligned x, exact y.
    start4 = jnp.concatenate([cx[..., None], start_a[..., 1:],
                              start_a[..., :1], cy[..., None]], axis=-1)

    kern = functools.partial(_gather_kernel, rows_block=rows_block,
                             cols_block=cols_block, out_rows=out_rows,
                             out_cols=out_cols, n_slots=n_slots, pack=pack)
    k_out = k // pack
    out = pl.pallas_call(
        kern,
        grid=(b_frames,),
        out_shape=jax.ShapeDtypeStruct((b_frames, k_out, out_rows, out_cols),
                                       jnp.float32),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),   # start quad
            pl.BlockSpec(memory_space=pl.ANY),       # packed (B, H, W)
        ],
        out_specs=pl.BlockSpec((1, k_out, out_rows, out_cols),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, rows_block, cols_block), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
        # The whole (K//pack, rows, out_cols) output block lives in VMEM,
        # double buffered by the grid pipeline; the default 16 MB scoped
        # budget is too small for K=96 windows.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * k_out * out_rows * out_cols * 4
            + n_slots * rows_block * cols_block * 4
            + 8 * 1024 * 1024),
        interpret=interpret,
    )(start4, packed)
    start = jnp.stack([cx, cy], axis=-1)
    if squeeze:
        return out[0], start[0]
    return out, start


def gather_windows_paired(packed: jnp.ndarray, peaks: Peaks,
                          geom: CutGeometry, profile: DetectProfile,
                          interpret: bool | None = None,
                          n_slots: int = 4):
    """:func:`gather_windows` with ``pack=2``: two windows per 128-lane
    row, consumed by ``ops.moments.moments_from_patches_paired``."""
    return gather_windows(packed, peaks, geom, profile, interpret=interpret,
                          n_slots=n_slots, pack=2)


def window_sums_pallas(band: jnp.ndarray, area: jnp.ndarray,
                       gray: jnp.ndarray, peaks: Peaks, geom: CutGeometry,
                       profile: DetectProfile,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in replacement for a batch of ``window_sums_xla`` calls.

    Inputs carry a leading frame axis (``(B, H, W)`` images, ``(B, K, ...)``
    peak data); the frame axis is the kernel grid (TPU Pallas requires
    ANY-space operands un-blocked, so batching must be a grid dim, not vmap).
    Single-frame inputs are auto-expanded.
    """
    squeeze = gray.ndim == 2
    if squeeze:
        band, area, gray = band[None], area[None], gray[None]
        peaks = jax.tree.map(lambda v: v[None], peaks)
        geom = jax.tree.map(lambda v: v[None], geom)
    b_frames, h, w = gray.shape
    k = peaks.xy.shape[-2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    start, geom_packed, rows_block, cols_block, _, _ = _prep(h, w, peaks,
                                                             geom, profile)

    kern = functools.partial(_kernel, rows_block=rows_block,
                             cols_block=cols_block,
                             cutoff=float(profile.radial_cutoff_px),
                             soft_floor=float(profile.soft_floor))
    out = pl.pallas_call(
        kern,
        grid=(b_frames,),
        out_shape=jax.ShapeDtypeStruct((b_frames, k, NUM_SUMS), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, k, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),   # start
            pl.BlockSpec((1, k, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),   # peak xy
            pl.BlockSpec((1, k, 9), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),   # geom
            pl.BlockSpec(memory_space=pl.ANY),       # band (B, H, W)
            pl.BlockSpec(memory_space=pl.ANY),       # area
            pl.BlockSpec(memory_space=pl.ANY),       # gray
        ],
        out_specs=pl.BlockSpec((1, k, NUM_SUMS), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, rows_block, cols_block), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(start, peaks.xy.astype(jnp.float32), geom_packed, band, area, gray)
    return out[0] if squeeze else out
