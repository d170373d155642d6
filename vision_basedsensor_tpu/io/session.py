"""Session checkpoint/resume.

The reference's de-facto checkpointing is its file-per-stage protocol
(SURVEY.md §5.4) — any stage can re-run from the previous stage's artifact.
This module adds in-process session state on top: the frame-0 reference
marker table, the pipeline config, the calibration, and the displacement-scan
carry, so a live run can stop and resume mid-video without re-running the
identity prologue or losing cumulative displacement state.
"""
from __future__ import annotations

import json
import os

import numpy as np

from vision_basedsensor_tpu.config import PipelineConfig, from_json, to_json


def save_session(path: str, ref, config: PipelineConfig,
                 calibration=None, scan_carry: dict | None = None) -> None:
    """Write a session checkpoint (directory with npz + json)."""
    os.makedirs(path, exist_ok=True)
    arrays = {
        "ref_xy": np.asarray(ref.xy),
        "ref_axes": np.asarray(ref.axes),
        "ref_angle": np.asarray(ref.angle),
        "ref_ring": np.asarray(ref.ring),
        "ref_valid": np.asarray(ref.valid),
    }
    if scan_carry:
        for k, v in scan_carry.items():
            arrays[f"carry_{k}"] = np.asarray(v)
    np.savez(os.path.join(path, "state.npz"), **arrays)
    to_json(config, os.path.join(path, "config.json"))
    if calibration is not None:
        calibration.save_json(os.path.join(path, "calibration.json"))


def load_session(path: str):
    """Returns (ReferenceMarkers, PipelineConfig, CalibrationArtifact|None,
    scan_carry dict)."""
    import jax.numpy as jnp

    from vision_basedsensor_tpu.track.rings import ReferenceMarkers

    with np.load(os.path.join(path, "state.npz")) as z:
        ref = ReferenceMarkers(
            xy=jnp.asarray(z["ref_xy"]),
            axes=jnp.asarray(z["ref_axes"]),
            angle=jnp.asarray(z["ref_angle"]),
            ring=jnp.asarray(z["ref_ring"]),
            valid=jnp.asarray(z["ref_valid"]),
        )
        carry = {k[len("carry_"):]: jnp.asarray(z[k])
                 for k in z.files if k.startswith("carry_")}
    config = from_json(os.path.join(path, "config.json"))
    calib = None
    cpath = os.path.join(path, "calibration.json")
    if os.path.exists(cpath):
        from vision_basedsensor_tpu.calibrate import CalibrationArtifact
        calib = CalibrationArtifact.load_json(cpath)
    return ref, config, calib, carry
