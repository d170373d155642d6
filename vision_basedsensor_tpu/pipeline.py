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
        first_frame = crop_frames(first_frame, crop_ratios=cfg.crop_ratios)
    det = detect_markers(first_frame, cfg.detect)
    return assign_identities(det, cfg.track)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def process_frames(frames: jnp.ndarray, ref: ReferenceMarkers,
                   cam: CameraModel, cfg: PipelineConfig,
                   crop: bool = False,
                   apply_warmup: bool = False) -> PipelineOutputs:
    """Steady-state pipeline over a frame batch ``(B, H, W[, 3])``."""
    if crop:
        frames = crop_frames(frames, crop_ratios=cfg.crop_ratios)
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


class StreamingPipeline:
    """Stateful chunked pipeline for live / arbitrarily long sources.

    Carries the frame-0 reference table and the displacement-scan state
    across fixed-size chunks, so memory stays bounded and a session can be
    checkpointed/resumed mid-stream (io/session.py). Detection within each
    chunk is fully batched; only the tiny scan carry crosses chunks.
    """

    def __init__(self, cam: CameraModel, cfg: PipelineConfig,
                 ref: ReferenceMarkers | None = None,
                 carry: dict | None = None):
        from vision_basedsensor_tpu.detect import detect_markers as _detect
        from vision_basedsensor_tpu.reconstruct.depth import reconstruct_positions
        from vision_basedsensor_tpu.reconstruct.displacement import (
            displacement_scan, initial_carry)

        self.cam = cam
        self.cfg = cfg
        self.ref = ref
        self.carry = carry
        self.frames_seen = 0

        @functools.partial(jax.jit)
        def _chunk(frames, ref_in, carry_in):
            det = _detect(frames, cfg.detect)
            if cfg.track.association_mode == "sequential":
                tracked = associate_sequential(ref_in, det,
                                               cfg.track.min_marker_distance_px)
            else:
                tracked = associate(ref_in, det, cfg.track.min_marker_distance_px)
            world, ok = reconstruct_positions(
                cam, tracked.xy, tracked.axes[..., 0], tracked.valid,
                cfg.reconstruct)
            recon, carry_out = displacement_scan(world, ok, cfg.reconstruct,
                                                 carry=carry_in,
                                                 return_carry=True)
            return PipelineOutputs(det, tracked, recon), carry_out

        self._chunk = _chunk
        self._initial_carry = initial_carry

    def process(self, frames: jnp.ndarray) -> PipelineOutputs:
        """Process one chunk ``(B, H, W[, 3])``; state advances."""
        frames = jnp.asarray(frames)
        if self.ref is None:
            self.ref = initialize(frames[0], self.cfg)
        if self.carry is None:
            self.carry = self._initial_carry(self.ref.xy.shape[0])
        out, self.carry = self._chunk(frames, self.ref, self.carry)
        self.frames_seen += frames.shape[0]
        return out

    def run(self, source, batch_size: int = 64):
        """Iterate PipelineOutputs chunks over a VideoSource."""
        from vision_basedsensor_tpu.io.video import device_feed
        for batch in device_feed(source, batch_size):
            yield self.process(batch)
