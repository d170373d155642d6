"""Pallas window-sums kernel vs the XLA gather backend (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_basedsensor_tpu.config import DetectConfig, PipelineConfig
from vision_basedsensor_tpu.core.imaging import min_filter, morph_open, to_grayscale
from vision_basedsensor_tpu.detect import detect_markers
from vision_basedsensor_tpu.ops.dog import dog_area_mask
from vision_basedsensor_tpu.ops.moments import cut_geometry, window_sums_xla
from vision_basedsensor_tpu.ops.ncc import normxcorr_gaussian
from vision_basedsensor_tpu.ops.pallas.moments import window_sums_pallas
from vision_basedsensor_tpu.ops.peaks import find_peaks
from vision_basedsensor_tpu.synth import default_scene, render_frames


@pytest.fixture(scope="module")
def fields():
    # W must be lane-aligned (the kernels now REJECT unaligned widths —
    # the DMA alignment hints would be false on real hardware; the old
    # 320-wide fixture only worked because interpret mode has no Mosaic).
    cfg = DetectConfig()
    prof = cfg.low_res
    scene = default_scene(240, 384)
    frame = render_frames(scene, jnp.zeros((1, 65, 3), jnp.float32))[0]
    gray = to_grayscale(frame)
    area = dog_area_mask(gray, prof, cfg.dog_offset)
    ncc = normxcorr_gaussian(area.astype(jnp.float32), prof.template_size,
                             prof.template_sigma)
    m = (ncc > cfg.ncc_threshold).astype(jnp.float32)
    band = m * (min_filter(m, prof.band_window) < 0.5)
    area_open = morph_open(area.astype(jnp.float32), cfg.open_ksize)
    peaks = find_peaks(ncc, cfg.ncc_threshold, prof.peak_window,
                       cfg.max_candidates, float(prof.peak_window))
    return cfg, prof, gray, band, area_open, peaks


def test_pallas_sums_match_xla(fields):
    cfg, prof, gray, band, area_open, peaks = fields
    geom = cut_geometry(peaks)
    sx = np.asarray(window_sums_xla(band, area_open, gray, peaks, geom, prof))
    sp = np.asarray(window_sums_pallas(band, area_open, gray, peaks, geom,
                                       prof, interpret=True))
    valid = np.asarray(peaks.valid)
    # Compare finite entries on valid peaks (lo/hi are +-inf on empty cuts).
    a, b = sx[valid], sp[valid]
    fin = np.isfinite(a)
    np.testing.assert_array_equal(fin, np.isfinite(b))
    # atol: the third-moment sums (24..27) reach ~1e5, so f32 accumulation
    # order alone produces ~eps * |sum| ~ 1e-2 absolute differences.
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5, atol=2e-2)


def test_pallas_border_peaks_match_xla(fields):
    """Peaks pushed against every image border (ADVICE round 1): the XLA
    patch clamps into the image while the kernel's aligned window covers a
    superset — with radial_cutoff <= patch/2 (enforced) both gate the
    identical in-image pixel set, so the sums must still agree."""
    cfg, prof, gray, band, area_open, peaks = fields
    h, w = gray.shape[-2:]
    k = peaks.xy.shape[0]
    # Synthetic peaks hugging the corners/edges (sub-pixel offsets included).
    edge_xy = jnp.asarray([
        [1.2, 1.7], [w - 2.1, 1.3], [1.4, h - 1.8], [w - 1.6, h - 2.2],
        [w / 2, 0.6], [0.4, h / 2], [w - 1.0, h / 2], [w / 2, h - 1.0],
    ], jnp.float32)
    xy = jnp.concatenate([edge_xy,
                          jnp.zeros((k - edge_xy.shape[0], 2), jnp.float32)])
    valid = jnp.arange(k) < edge_xy.shape[0]
    from vision_basedsensor_tpu.ops.peaks import Peaks
    pk = Peaks(xy=xy, score=jnp.ones(k), valid=valid)
    geom = cut_geometry(pk)
    sx = np.asarray(window_sums_xla(band, area_open, gray, pk, geom, prof))
    sp = np.asarray(window_sums_pallas(band, area_open, gray, pk, geom,
                                       prof, interpret=True))
    a, b = sx[np.asarray(valid)], sp[np.asarray(valid)]
    fin = np.isfinite(a)
    np.testing.assert_array_equal(fin, np.isfinite(b))
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5, atol=2e-2)


def test_pallas_rejects_short_frames(fields):
    """H < patch_size + 8 would make the row DMA read out of bounds; the
    kernel must refuse (the detector falls back to XLA automatically)."""
    cfg, prof, gray, band, area_open, peaks = fields
    geom = cut_geometry(peaks)
    short = gray[:40]  # < patch_size + 8 = 48
    with pytest.raises(ValueError, match="patch_size"):
        window_sums_pallas(band[:40], area_open[:40], short, peaks, geom,
                           prof, interpret=True)


def test_detect_short_frame_falls_back_to_xla():
    """End-to-end: a frame shorter than patch+8 must not crash with the
    pallas backend requested — the detector silently uses XLA."""
    scene = default_scene(44, 256)
    frame = render_frames(scene, jnp.zeros((1, 65, 3), jnp.float32))
    det = detect_markers(frame, DetectConfig(backend="pallas"))
    assert np.asarray(det.valid).shape[-1] == DetectConfig().max_candidates


def test_detect_pallas_backend_end_to_end(fields):
    scene = default_scene(240, 320)
    frame = render_frames(scene, jnp.zeros((1, 65, 3), jnp.float32))
    det_x = detect_markers(frame, DetectConfig(backend="xla"))
    det_p = detect_markers(frame, DetectConfig(backend="pallas"))
    np.testing.assert_array_equal(np.asarray(det_x.valid), np.asarray(det_p.valid))
    v = np.asarray(det_x.valid)
    np.testing.assert_allclose(np.asarray(det_x.xy)[v], np.asarray(det_p.xy)[v],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(det_x.axes)[v],
                               np.asarray(det_p.axes)[v], atol=1e-2)


def test_packed_sums_match_xla(fields):
    """Single-DMA packed-field kernel (gray + 256*band + 512*area) vs the
    XLA gather backend — same tolerance as the 3-field kernel."""
    from vision_basedsensor_tpu.ops.pallas.moments import window_sums_packed

    cfg, prof, gray, band, area_open, peaks = fields
    geom = cut_geometry(peaks)
    packed = gray + 256.0 * band + 512.0 * area_open
    sx = np.asarray(window_sums_xla(band, area_open, gray, peaks, geom, prof))
    sp = np.asarray(window_sums_packed(packed, peaks, geom, prof,
                                       interpret=True))
    valid = np.asarray(peaks.valid)
    a, b = sx[valid], sp[valid]
    fin = np.isfinite(a)
    np.testing.assert_array_equal(fin, np.isfinite(b))
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5, atol=2e-2)


def test_gather_path_right_border_peak_matches_xla():
    """Regression (code review, round 2): a peak within radial_cutoff_px of
    the RIGHT image border. The lane-rolled 128-column gather windows wrap
    columns past the image edge to pixels from ~256 columns away, and those
    wrapped columns carry in-disk coordinates — without the in-image column
    gate the moment sums silently absorbed garbage (measured: cut count 663
    vs 1009, area m00 0 vs 211 against window_sums_xla)."""
    import jax

    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.ops.moments import moments_from_patches
    from vision_basedsensor_tpu.ops.pallas.fields import fused_fields
    from vision_basedsensor_tpu.ops.pallas.moments import gather_windows
    from vision_basedsensor_tpu.ops.peaks import Peaks

    cfg = PipelineConfig().detect
    prof = cfg.low_res
    rng = np.random.default_rng(3)
    h, w = 240, 384
    gray = jnp.asarray(rng.integers(0, 256, (1, h, w)), jnp.float32)
    band = jnp.asarray(rng.random((1, h, w)) > 0.7, jnp.float32)
    area_open = jnp.asarray(rng.random((1, h, w)) > 0.6, jnp.float32)
    packed = gray + 256.0 * band + 512.0 * area_open

    k = cfg.max_candidates
    edge_xy = np.zeros((k, 2), np.float32)
    # Peaks hugging the right border (and corners), plus one interior.
    edge_xy[:6] = [[w - 5, h / 2], [w - 1.3, h / 2], [w - 17.5, 40.0],
                   [w - 5, 1.5], [w - 5, h - 2.0], [w / 2, h / 2]]
    valid = jnp.arange(k) < 6
    peaks = Peaks(xy=jnp.asarray(edge_xy), score=jnp.ones(k),
                  valid=valid)
    geom = cut_geometry(peaks)

    s_xla = np.asarray(window_sums_xla(band[0], area_open[0], gray[0],
                                       peaks, geom, prof))
    bp = jax.tree.map(lambda v: v[None], peaks)
    bg = jax.tree.map(lambda v: v[None], geom)
    patches, pstart = gather_windows(packed, bp, bg, prof)
    s_split = np.asarray(moments_from_patches(patches, pstart, bp, bg,
                                              prof, w))[0]

    v = np.asarray(valid)
    a = s_xla[v]
    fin = np.isfinite(a)
    b = s_split[v]
    np.testing.assert_array_equal(fin, np.isfinite(b))
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-4, atol=5e-3)


def test_paired_gather_sums_match_xla(fields):
    """Paired windows (two peaks per 128-lane row, round 3): identical sums
    to window_sums_xla on the rendered scene's real peak set."""
    from vision_basedsensor_tpu.ops.moments import moments_from_patches_paired
    from vision_basedsensor_tpu.ops.pallas.moments import gather_windows_paired

    cfg, prof, gray, band, area_open, peaks = fields
    geom = cut_geometry(peaks)
    packed = gray + 256.0 * band + 512.0 * area_open
    s_xla = np.asarray(window_sums_xla(band, area_open, gray, peaks, geom,
                                       prof))
    import jax
    bp = jax.tree.map(lambda v: v[None], peaks)
    bg = jax.tree.map(lambda v: v[None], geom)
    patches, pstart = gather_windows_paired(packed[None], bp, bg, prof)
    assert patches.shape[1] == cfg.max_candidates // 2
    s_pair = np.asarray(moments_from_patches_paired(
        patches, pstart, bp, bg, prof, gray.shape[-1]))[0]
    valid = np.asarray(peaks.valid)
    a, b = s_xla[valid], s_pair[valid]
    fin = np.isfinite(a)
    np.testing.assert_array_equal(fin, np.isfinite(b))
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5, atol=2e-2)


def test_paired_gather_border_peaks_match_xla():
    """Paired windows at every border/corner + right-edge wrap (the garbage
    columns of BOTH slots must stay excluded), mirroring
    test_gather_path_right_border_peak_matches_xla, plus bottom-edge peaks
    whose 8-aligned row start clips."""
    import jax

    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.ops.moments import moments_from_patches_paired
    from vision_basedsensor_tpu.ops.pallas.moments import gather_windows_paired
    from vision_basedsensor_tpu.ops.peaks import Peaks

    cfg = PipelineConfig().detect
    prof = cfg.low_res
    rng = np.random.default_rng(7)
    h, w = 240, 384
    gray = jnp.asarray(rng.integers(0, 256, (1, h, w)), jnp.float32)
    band = jnp.asarray(rng.random((1, h, w)) > 0.7, jnp.float32)
    area_open = jnp.asarray(rng.random((1, h, w)) > 0.6, jnp.float32)
    packed = gray + 256.0 * band + 512.0 * area_open

    k = cfg.max_candidates
    edge_xy = np.full((k, 2), 60.0, np.float32)
    # Both slots of a pair near the right border; corners; bottom edge.
    edge_xy[:10] = [[w - 5, h / 2], [w - 1.3, h / 2], [w - 17.5, 40.0],
                    [w - 5, 1.5], [w - 5, h - 2.0], [1.5, 1.5],
                    [1.5, h - 1.5], [w / 2, h - 1.2], [w / 2, h / 2],
                    [w - 2.0, h - 2.0]]
    valid = jnp.arange(k) < 10
    peaks = Peaks(xy=jnp.asarray(edge_xy), score=jnp.ones(k), valid=valid)
    geom = cut_geometry(peaks)

    s_xla = np.asarray(window_sums_xla(band[0], area_open[0], gray[0],
                                       peaks, geom, prof))
    bp = jax.tree.map(lambda v: v[None], peaks)
    bg = jax.tree.map(lambda v: v[None], geom)
    patches, pstart = gather_windows_paired(packed, bp, bg, prof)
    s_pair = np.asarray(moments_from_patches_paired(patches, pstart, bp, bg,
                                                    prof, w))[0]
    v = np.asarray(valid)
    a, b = s_xla[v], s_pair[v]
    fin = np.isfinite(a)
    np.testing.assert_array_equal(fin, np.isfinite(b))
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-4, atol=5e-3)


def test_paired_gather_high_res_profile_matches_xla():
    """High-res profile is the TIGHT case for the 64-lane slot: patch 64
    fills the slot exactly and the lane-63 radial exclusion margin is
    0.5 px (dx >= 30.5 vs cutoff 30). Random fields + border/interior
    peaks must still match window_sums_xla exactly."""
    import jax

    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.ops.moments import moments_from_patches_paired
    from vision_basedsensor_tpu.ops.pallas.moments import gather_windows_paired
    from vision_basedsensor_tpu.ops.peaks import Peaks

    cfg = PipelineConfig().detect
    prof = cfg.high_res
    assert prof.patch_size == 64
    rng = np.random.default_rng(11)
    h, w = 240, 384
    gray = jnp.asarray(rng.integers(0, 256, (1, h, w)), jnp.float32)
    band = jnp.asarray(rng.random((1, h, w)) > 0.7, jnp.float32)
    area_open = jnp.asarray(rng.random((1, h, w)) > 0.6, jnp.float32)
    packed = gray + 256.0 * band + 512.0 * area_open

    k = cfg.max_candidates
    xy = rng.uniform([2, 2], [w - 2, h - 2], (k, 2)).astype(np.float32)
    xy[:8] = [[w - 1.5, h / 2], [1.5, h / 2], [w / 2, 1.5], [w / 2, h - 1.5],
              [w - 2, h - 2], [2, 2], [w - 33, h / 2], [33, h / 2]]
    peaks = Peaks(xy=jnp.asarray(xy), score=jnp.ones(k),
                  valid=jnp.ones(k, bool))
    geom = cut_geometry(peaks)

    s_xla = np.asarray(window_sums_xla(band[0], area_open[0], gray[0],
                                       peaks, geom, prof))
    bp = jax.tree.map(lambda v: v[None], peaks)
    bg = jax.tree.map(lambda v: v[None], geom)
    patches, pstart = gather_windows_paired(packed, bp, bg, prof)
    s_pair = np.asarray(moments_from_patches_paired(patches, pstart, bp, bg,
                                                    prof, w))[0]
    fin = np.isfinite(s_xla)
    np.testing.assert_array_equal(fin, np.isfinite(s_pair))
    # Gated pixel sets must be IDENTICAL (count column is exact) ...
    np.testing.assert_array_equal(s_xla[:, 23], s_pair[:, 23])
    # ... while the high-res 64x64 windows' third-moment terms reach ~4e6
    # in summed magnitude, so f32 accumulation order alone produces ~1.0
    # absolute differences (verified: the only mismatches at tighter tol
    # have exactly-equal counts and lo/hi).
    np.testing.assert_allclose(s_xla[fin], s_pair[fin], rtol=1e-3, atol=1.0)


def test_paired_gather_rejects_odd_k_and_wide_patches(fields):
    import dataclasses

    from vision_basedsensor_tpu.ops.pallas.moments import gather_windows_paired

    cfg, prof, gray, band, area_open, peaks = fields
    import jax
    geom = cut_geometry(peaks)
    packed = gray + 256.0 * band + 512.0 * area_open
    bp = jax.tree.map(lambda v: v[None, :95], peaks)
    bg = jax.tree.map(lambda v: v[None, :95], geom)
    with pytest.raises(ValueError, match="even"):
        gather_windows_paired(packed[None], bp, bg, prof)
    wide = dataclasses.replace(prof, patch_size=72, radial_cutoff_px=30.0)
    bp = jax.tree.map(lambda v: v[None], peaks)
    bg = jax.tree.map(lambda v: v[None], geom)
    with pytest.raises(ValueError, match="patch_size <= 64"):
        gather_windows_paired(packed[None], bp, bg, wide)


def test_pallas_rejects_unaligned_heights(fields):
    """H % 8 != 0 would break the 8-aligned DMA-start promise for
    bottom-edge peaks (clip lands on h - rows_block, not a multiple of 8)
    and silently corrupt copies on real TPU (ADVICE round 2) — the kernels
    must refuse and the detector must fall back."""
    cfg, prof, gray, band, area_open, peaks = fields
    geom = cut_geometry(peaks)
    with pytest.raises(ValueError, match="H % 8"):
        window_sums_pallas(band[:236], area_open[:236], gray[:236], peaks,
                           geom, prof, interpret=True)
    scene = default_scene(236, 384)
    frame = render_frames(scene, jnp.zeros((1, 65, 3), jnp.float32))
    det = detect_markers(frame, DetectConfig(backend="pallas"))  # no raise
    assert np.asarray(det.valid).shape[-1] == DetectConfig().max_candidates


def test_paired_mxu_sums_match_fused(fields):
    """MXU raw-moment basis backend (two fixed-basis matmuls + binomial
    shift, ops/moments.py:moments_from_patches_paired_mxu) vs the fused
    VPU-reduction paired backend on the rendered scene's real peak set.
    Third-moment sums reach ~1e5 with basis terms ~3e4, so the
    accumulation-order difference budget is larger than backend pairs
    that share the reduction structure."""
    from vision_basedsensor_tpu.ops.moments import (
        moments_from_patches_paired, moments_from_patches_paired_mxu)
    from vision_basedsensor_tpu.ops.pallas.moments import gather_windows_paired

    cfg, prof, gray, band, area_open, peaks = fields
    geom = cut_geometry(peaks)
    packed = gray + 256.0 * band + 512.0 * area_open
    bp = jax.tree.map(lambda v: v[None], peaks)
    bg = jax.tree.map(lambda v: v[None], geom)
    patches, pstart = gather_windows_paired(packed[None], bp, bg, prof)
    s_ref = np.asarray(moments_from_patches_paired(
        patches, pstart, bp, bg, prof, gray.shape[-1]))[0]
    s_mxu = np.asarray(moments_from_patches_paired_mxu(
        patches, pstart, bp, bg, prof, gray.shape[-1]))[0]
    valid = np.asarray(peaks.valid)
    a, b = s_ref[valid], s_mxu[valid]
    fin = np.isfinite(a)
    np.testing.assert_array_equal(fin, np.isfinite(b))
    # Exact-integrand columns (counts) must agree to f32 exactness.
    np.testing.assert_allclose(a[:, 23], b[:, 23], rtol=0, atol=1e-3)
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-4, atol=0.5)


def test_paired_mxu_border_peaks_match_fused():
    """Border/corner peaks: the patch-start clip makes the shift offsets
    large (|ox| up to ~patch/2), the worst case for the binomial shift's
    f32 cancellation — sums must still agree within the moment budget."""
    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.ops.moments import (
        moments_from_patches_paired, moments_from_patches_paired_mxu)
    from vision_basedsensor_tpu.ops.pallas.moments import gather_windows_paired
    from vision_basedsensor_tpu.ops.peaks import Peaks

    cfg = PipelineConfig().detect
    prof = cfg.low_res
    rng = np.random.default_rng(23)
    h, w = 240, 384
    gray = jnp.asarray(rng.integers(0, 256, (1, h, w)), jnp.float32)
    band = jnp.asarray(rng.random((1, h, w)) > 0.7, jnp.float32)
    area_open = jnp.asarray(rng.random((1, h, w)) > 0.6, jnp.float32)
    packed = gray + 256.0 * band + 512.0 * area_open

    k = cfg.max_candidates
    edge_xy = np.full((k, 2), 60.0, np.float32)
    edge_xy[:10] = [[w - 5, h / 2], [w - 1.3, h / 2], [w - 17.5, 40.0],
                    [w - 5, 1.5], [w - 5, h - 2.0], [1.5, 1.5],
                    [1.5, h - 1.5], [w / 2, h - 1.2], [w / 2, h / 2],
                    [w - 2.0, h - 2.0]]
    valid = jnp.arange(k) < 10
    peaks = Peaks(xy=jnp.asarray(edge_xy), score=jnp.ones(k), valid=valid)
    geom = cut_geometry(peaks)
    bp = jax.tree.map(lambda v: v[None], peaks)
    bg = jax.tree.map(lambda v: v[None], geom)
    patches, pstart = gather_windows_paired(packed, bp, bg, prof)
    s_ref = np.asarray(moments_from_patches_paired(patches, pstart, bp, bg,
                                                   prof, w))[0]
    s_mxu = np.asarray(moments_from_patches_paired_mxu(patches, pstart, bp,
                                                       bg, prof, w))[0]
    v = np.asarray(valid)
    a, b = s_ref[v], s_mxu[v]
    fin = np.isfinite(a)
    np.testing.assert_array_equal(fin, np.isfinite(b))
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-4, atol=0.5)


def test_detect_mxu_basis_end_to_end(fields):
    """Flag plumbing: detect with moment_mxu_basis=True must agree with the
    default backend on every detection-level output (positions to 1e-2 px,
    same valid set) on a rendered scene."""
    import dataclasses

    scene = default_scene(240, 384)
    frame = render_frames(scene, jnp.zeros((1, 65, 3), jnp.float32))
    cfg = DetectConfig(backend="pallas")
    det_f = detect_markers(frame, cfg)
    det_m = detect_markers(frame,
                           dataclasses.replace(cfg, moment_mxu_basis=True))
    np.testing.assert_array_equal(np.asarray(det_f.valid),
                                  np.asarray(det_m.valid))
    v = np.asarray(det_f.valid)
    np.testing.assert_allclose(np.asarray(det_f.xy)[v],
                               np.asarray(det_m.xy)[v], atol=1e-2)
    np.testing.assert_allclose(np.asarray(det_f.axes)[v],
                               np.asarray(det_m.axes)[v], atol=5e-2)
