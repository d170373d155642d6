"""Cumulative-ablation profile of the detect hot path on real TPU.

Per-stage timers are untrustworthy through the axon relay (see
.claude/skills/verify/SKILL.md): block_until_ready can acknowledge without
executing (measured 0.1 us/frame for the full detect stage, a physical
impossibility), and identical executions can be deduped. This harness makes
every iteration's execution unavoidable by CHAINING: iteration i's scalar
output feeds iteration i+1's input frames, and one device->host transfer at
the end forces the whole chain. The chain adds one elementwise pass + the
final RTT, identical for every stage, so stage DELTAS are clean.

Sanity anchor: the "full detect" row must land near the independently
verified full-pipeline number (bench.py; round 3: ~107 us/frame at B=256,
~90 at B=1024 — the chained harness carries a ~13 us/frame dispatch
constant at B=256, less at B=1024). CAUTION: rows isolate stages with a
trivial scalar consumer, which hides consumer-driven fusion splits —
judge levers by e2e A/B, not by rows (benchmarks/README.md, round 3).

Usage: python benchmarks/ablate_detect.py [batch] [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(batch: int = 256, iters: int = 6):
    from vision_basedsensor_tpu.config import PipelineConfig
    from vision_basedsensor_tpu.detect.detector import detect_markers_and_scale
    from vision_basedsensor_tpu.ops.dog import dog_area_mask
    from vision_basedsensor_tpu.ops.moments import (cut_geometry,
                                                    moments_from_patches)
    from vision_basedsensor_tpu.ops.ncc import normxcorr_gaussian
    from vision_basedsensor_tpu.ops.pallas.fields import fused_fields
    from vision_basedsensor_tpu.ops.pallas.moments import gather_windows
    from vision_basedsensor_tpu.ops.peaks import select_peaks_from_cells
    from vision_basedsensor_tpu.synth import default_scene, render_frames

    cfg = PipelineConfig().detect
    prof = cfg.low_res
    scene = default_scene(height=480, width=640)
    d = jnp.zeros((batch, 65, 3), jnp.float32)
    d = d.at[:, :, 2].add(-0.002 * jnp.arange(batch)[:, None])
    frames = jax.block_until_ready(render_frames(scene, d))
    w = 640

    def filters(gray):
        area = dog_area_mask(gray, prof, cfg.dog_offset)
        ncc = normxcorr_gaussian(area.astype(jnp.float32), prof.template_size,
                                 prof.template_sigma, binary_input=True)
        return area, ncc

    def s1(gray):
        area, ncc = filters(gray)
        return ncc.sum() + area.sum()

    def s2(gray):
        area, ncc = filters(gray)
        packed, cval, cidx = fused_fields(ncc, area.astype(jnp.float32), gray,
                                          cfg.ncc_threshold, cfg.open_ksize,
                                          prof)
        return packed[:, 0, :].sum() + cval.sum() + cidx.sum()

    def _to_peaks(gray):
        area, ncc = filters(gray)
        packed, cval, cidx = fused_fields(ncc, area.astype(jnp.float32), gray,
                                          cfg.ncc_threshold, cfg.open_ksize,
                                          prof)
        peaks = select_peaks_from_cells(cval, cidx, w, cfg.max_candidates,
                                        float(prof.peak_window))
        return packed, peaks

    def s3(gray):
        packed, peaks = _to_peaks(gray)
        return packed[:, 0, :].sum() + peaks.xy.sum() + peaks.score.sum()

    def s4(gray):
        packed, peaks = _to_peaks(gray)
        geom = jax.vmap(cut_geometry)(peaks)
        patches, pstart = gather_windows(packed, peaks, geom, prof)
        return patches[..., 0, :].sum() + pstart.sum()

    def s5(gray):
        packed, peaks = _to_peaks(gray)
        geom = jax.vmap(cut_geometry)(peaks)
        patches, pstart = gather_windows(packed, peaks, geom, prof)
        sums = moments_from_patches(patches, pstart, peaks, geom, prof, w)
        return sums.sum()

    def s4p(gray):
        from vision_basedsensor_tpu.ops.pallas.moments import \
            gather_windows_paired
        packed, peaks = _to_peaks(gray)
        geom = jax.vmap(cut_geometry)(peaks)
        patches, pstart = gather_windows_paired(packed, peaks, geom, prof)
        return patches[..., 0, :].sum() + pstart.sum()

    def s5p(gray):
        from vision_basedsensor_tpu.ops.moments import \
            moments_from_patches_paired
        from vision_basedsensor_tpu.ops.pallas.moments import \
            gather_windows_paired
        packed, peaks = _to_peaks(gray)
        geom = jax.vmap(cut_geometry)(peaks)
        patches, pstart = gather_windows_paired(packed, peaks, geom, prof)
        sums = moments_from_patches_paired(patches, pstart, peaks, geom,
                                           prof, w)
        return sums.sum()

    def s5m(gray):
        from vision_basedsensor_tpu.ops.moments import \
            moments_from_patches_paired_mxu
        from vision_basedsensor_tpu.ops.pallas.moments import \
            gather_windows_paired
        packed, peaks = _to_peaks(gray)
        geom = jax.vmap(cut_geometry)(peaks)
        patches, pstart = gather_windows_paired(packed, peaks, geom, prof)
        sums = moments_from_patches_paired_mxu(patches, pstart, peaks, geom,
                                               prof, w)
        return sums.sum()

    def s6(gray):
        det, scale = detect_markers_and_scale(gray, cfg)
        return det.xy.sum() + det.score.sum() + scale

    import dataclasses

    def s6m(gray):
        det, scale = detect_markers_and_scale(
            gray, dataclasses.replace(cfg, moment_mxu_basis=True))
        return det.xy.sum() + det.score.sum() + scale

    # The alt rows are ALTERNATIVES to the rows above them — compare their
    # absolute values against +cut_geom+gather / +moments_from_patches; the
    # printed "+delta" column only means "vs previous row" for the
    # cumulative rows. The e2e A/B that decides the MXU-basis lever is the
    # "full detect" vs "full detect (mxu)" pair (stage rows hide
    # consumer-driven fusion splits).
    stages = [("filters(DoG+NCC)", s1), ("+fused_fields", s2),
              ("+select_peaks(top_k)", s3), ("+cut_geom+gather", s4),
              ("+moments_from_patches", s5),
              ("alt: gather paired", s4p), ("alt: moments paired", s5p),
              ("alt: moments paired MXU", s5m),
              ("full detect", s6), ("full detect (mxu)", s6m)]

    prev = 0.0
    for name, fn in stages:
        # Chain: each iteration's input depends on the previous iteration's
        # scalar (x + tiny*s is bit-identical to x for |tiny*s| below f32
        # ulp of the 0..255 frames, so every iteration computes the same
        # work on the same values but CANNOT be elided or reordered).
        chained = jax.jit(lambda g, s: (fn(g + 1e-30 * s)))
        s = jax.block_until_ready(chained(frames, jnp.float32(0.0)))  # compile
        float(s)
        t0 = time.perf_counter()
        s = jnp.float32(0.0)
        for _ in range(iters):
            s = chained(frames, s)
        float(np.asarray(s))    # device->host transfer forces the chain
        dt = (time.perf_counter() - t0) / iters / batch * 1e6
        print(f"{name:28s} {dt:8.1f} us/frame  (+{dt - prev:6.1f})", flush=True)
        prev = dt


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
