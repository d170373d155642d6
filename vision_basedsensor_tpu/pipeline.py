"""End-to-end sensor pipeline: frames -> markers -> 3D field -> contact state.

This is the framework's flagship compute path. Where the reference chains
five scripts through CSV/Excel files on disk (SURVEY.md §1), here the whole
chain is one jitted array program over a batch of frames:

    crop -> detect (C4/C5) -> associate (C7) -> reconstruct (C12)
         -> displacement scans -> [optional] deviation/tilt analysis (C14/C15)

with a one-frame identity-assignment prologue (C6). Batching is over frames;
under a device mesh the batch axis is the data-parallel axis
(parallel/mesh.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vision_basedsensor_tpu.config import PipelineConfig
from vision_basedsensor_tpu.core.camera import CameraModel
from vision_basedsensor_tpu.core.imaging import crop_frames
from vision_basedsensor_tpu.detect import detect_markers
from vision_basedsensor_tpu.detect.detector import Detections
from vision_basedsensor_tpu.reconstruct import Reconstruction, reconstruct_sequence
from vision_basedsensor_tpu.track import (
    ReferenceMarkers,
    TrackedFrames,
    assign_identities,
    associate,
)
from vision_basedsensor_tpu.track.associate import associate_sequential


class PipelineOutputs(NamedTuple):
    detections: Detections
    tracked: TrackedFrames
    recon: Reconstruction


@functools.partial(jax.jit, static_argnums=(1, 2))
def initialize(first_frame: jnp.ndarray, cfg: PipelineConfig,
               crop: bool = False) -> ReferenceMarkers:
    """Frame-0 prologue: detect markers and assign canonical identities."""
    if crop:
        first_frame = crop_frames(first_frame, first_frame.shape[-2:], cfg.crop_ratios)
    det = detect_markers(first_frame, cfg.detect)
    return assign_identities(det, cfg.track)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def process_frames(frames: jnp.ndarray, ref: ReferenceMarkers,
                   cam: CameraModel, cfg: PipelineConfig,
                   crop: bool = False,
                   apply_warmup: bool = False) -> PipelineOutputs:
    """Steady-state pipeline over a frame batch ``(B, H, W[, 3])``."""
    if crop:
        frames = crop_frames(frames, frames.shape[-2:], cfg.crop_ratios)
    det = detect_markers(frames, cfg.detect)
    if cfg.track.association_mode == "sequential":
        tracked = associate_sequential(ref, det, cfg.track.min_marker_distance_px)
    else:
        tracked = associate(ref, det, cfg.track.min_marker_distance_px)
    recon = reconstruct_sequence(cam, tracked, cfg.reconstruct,
                                 apply_warmup=apply_warmup)
    return PipelineOutputs(detections=det, tracked=tracked, recon=recon)


def run_video(frames: jnp.ndarray, cam: CameraModel, cfg: PipelineConfig,
              crop: bool = False, apply_warmup: bool = True) -> PipelineOutputs:
    """Convenience wrapper: initialize on frame 0, then process the batch."""
    ref = initialize(frames[0], cfg, crop)
    return process_frames(frames, ref, cam, cfg, crop, apply_warmup)
