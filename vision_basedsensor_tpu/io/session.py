"""Session checkpoint/resume.

The reference's de-facto checkpointing is its file-per-stage protocol
(SURVEY.md §5.4) — any stage can re-run from the previous stage's artifact.
This module adds in-process session state on top: the frame-0 reference
marker table (including the session's photometric axis-calibration scalar),
the pipeline config, the calibration, the displacement-scan carry, and the
sequential-association last-sighting positions, so a live run can stop and
resume mid-video without re-running the identity prologue, losing cumulative
displacement state, or stepping the axis calibration.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from vision_basedsensor_tpu.config import PipelineConfig, from_json, to_json


class SessionState(NamedTuple):
    ref: "ReferenceMarkers"
    config: PipelineConfig
    calibration: object | None      # CalibrationArtifact | None
    scan_carry: dict                # displacement-scan carry ({} if fresh)
    assoc_xy: object | None         # sequential-mode last-seen (65, 2) | None
    frames_seen: int = 0            # global frame count (warmup offset)


def save_session(path: str, ref, config: PipelineConfig,
                 calibration=None, scan_carry: dict | None = None,
                 assoc_xy=None, frames_seen: int = 0) -> None:
    """Write a session checkpoint (directory with npz + json)."""
    os.makedirs(path, exist_ok=True)
    arrays = {
        "ref_xy": np.asarray(ref.xy),
        "ref_axes": np.asarray(ref.axes),
        "ref_angle": np.asarray(ref.angle),
        "ref_ring": np.asarray(ref.ring),
        "ref_valid": np.asarray(ref.valid),
        "ref_axis_scale": np.asarray(ref.axis_scale),
        "frames_seen": np.asarray(frames_seen, np.int64),
    }
    if scan_carry:
        for k, v in scan_carry.items():
            arrays[f"carry_{k}"] = np.asarray(v)
    if assoc_xy is not None:
        arrays["assoc_xy"] = np.asarray(assoc_xy)
    np.savez(os.path.join(path, "state.npz"), **arrays)
    to_json(config, os.path.join(path, "config.json"))
    if calibration is not None:
        calibration.save_json(os.path.join(path, "calibration.json"))


def load_session(path: str) -> SessionState:
    import jax.numpy as jnp

    from vision_basedsensor_tpu.track.rings import ReferenceMarkers

    with np.load(os.path.join(path, "state.npz")) as z:
        ref = ReferenceMarkers(
            xy=jnp.asarray(z["ref_xy"]),
            axes=jnp.asarray(z["ref_axes"]),
            angle=jnp.asarray(z["ref_angle"]),
            ring=jnp.asarray(z["ref_ring"]),
            valid=jnp.asarray(z["ref_valid"]),
            axis_scale=(jnp.asarray(z["ref_axis_scale"])
                        if "ref_axis_scale" in z.files else 1.0),
        )
        carry = {k[len("carry_"):]: jnp.asarray(z[k])
                 for k in z.files if k.startswith("carry_")}
        assoc_xy = jnp.asarray(z["assoc_xy"]) if "assoc_xy" in z.files else None
        fseen = int(z["frames_seen"]) if "frames_seen" in z.files else 0
    config = from_json(os.path.join(path, "config.json"))
    calib = None
    cpath = os.path.join(path, "calibration.json")
    if os.path.exists(cpath):
        from vision_basedsensor_tpu.calibrate import CalibrationArtifact
        calib = CalibrationArtifact.load_json(cpath)
    return SessionState(ref=ref, config=config, calibration=calib,
                        scan_carry=carry, assoc_xy=assoc_xy,
                        frames_seen=fseen)
