"""Multi-chip scaling via jax.sharding over a device mesh.

The reference has no distributed execution at all (SURVEY.md §2, §5.8); the
sensor pipeline's natural multi-chip axes are:

* ``data``: the frame batch — embarrassingly parallel through detection,
  association and back-projection (there is no model state to shard);
* ``spatial``: the image height — XLA's SPMD partitioner handles the
  convolution halos, useful when single-frame latency matters.

The one sequential coupling is the last-sighting displacement scan
(reconstruct/displacement.py). Its state is tiny — 65 markers x 3 floats per
frame — so the design replicates it: a sharding constraint before the scan
makes XLA all-gather the per-frame marker tensors (a few KB over ICI) and
every device runs the identical scan, keeping the heavy pixel work fully
sharded with no cross-device serialization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vision_basedsensor_tpu.config import PipelineConfig
from vision_basedsensor_tpu.core.camera import CameraModel
from vision_basedsensor_tpu.core.imaging import crop_frames
from vision_basedsensor_tpu.detect import detect_markers
from vision_basedsensor_tpu.pipeline import PipelineOutputs
from vision_basedsensor_tpu.reconstruct import displacement_scan
from vision_basedsensor_tpu.reconstruct.depth import reconstruct_positions
from vision_basedsensor_tpu.track import ReferenceMarkers, associate


def make_mesh(devices=None, spatial: int = 1) -> Mesh:
    """Create a ``(data[, spatial])`` mesh over the given (or all) devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if spatial > 1:
        assert n % spatial == 0, (n, spatial)
        import numpy as np
        arr = np.array(devices).reshape(n // spatial, spatial)
        return Mesh(arr, ("data", "spatial"))
    import numpy as np
    return Mesh(np.array(devices), ("data",))


def shard_frames(frames: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a frame batch with (batch, height) sharded per the mesh axes."""
    spec = _frame_spec(mesh)
    return jax.device_put(frames, NamedSharding(mesh, spec))


def _frame_spec(mesh: Mesh) -> P:
    if "spatial" in mesh.axis_names:
        return P("data", "spatial")
    return P("data")


def make_sharded_pipeline(mesh: Mesh, cam: CameraModel, cfg: PipelineConfig,
                          crop: bool = False, apply_warmup: bool = False):
    """Build the jitted SPMD pipeline step for the given mesh.

    Returns ``step(frames, ref) -> PipelineOutputs`` with the frame batch
    sharded on ``data`` (and image rows on ``spatial`` if present) and the
    reference marker table replicated.
    """
    frame_sharding = NamedSharding(mesh, _frame_spec(mesh))
    replicated = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(frame_sharding, replicated),
        donate_argnums=(0,),
    )
    def step(frames: jnp.ndarray, ref: ReferenceMarkers) -> PipelineOutputs:
        if crop:
            frames_c = crop_frames(frames, crop_ratios=cfg.crop_ratios)
        else:
            frames_c = frames
        det = detect_markers(frames_c, cfg.detect, axis_scale=ref.axis_scale)
        tracked = associate(ref, det, cfg.track.min_marker_distance_px)
        world, ok = reconstruct_positions(
            cam, tracked.xy, tracked.axes[..., 0], tracked.valid,
            cfg.reconstruct)
        if cfg.reconstruct.warmup_frames > 0 and apply_warmup:
            keep = jnp.arange(world.shape[0]) >= cfg.reconstruct.warmup_frames
            ok = ok & keep[:, None]
            world = jnp.where(ok[..., None], world, 0.0)
        # Replicate the tiny per-marker state so every device runs the
        # identical scan; XLA inserts one all-gather of (B, 65, 3+1).
        world = jax.lax.with_sharding_constraint(world, replicated)
        ok = jax.lax.with_sharding_constraint(ok, replicated)
        recon = displacement_scan(world, ok, cfg.reconstruct)
        from vision_basedsensor_tpu.analysis.force import contact_state_sequence
        contact = contact_state_sequence(recon, cfg.analysis)
        return PipelineOutputs(detections=det, tracked=tracked, recon=recon,
                               contact=contact)

    return step
