"""Image-to-intrinsics calibration: the reference C10 flow end-to-end.

``calibrate_camera(img_dir, pattern_size, square_size)`` in the reference
(``intrinsic_calibration.py:53-109``) crops each image, finds chessboard
corners, refines them, and runs ``cv2.calibrateCamera``. Here: the same crop
convention, our device-side chessboard detector + sub-pixel refinement
(calibrate/chessboard.py), and the Zhang solver (calibrate/zhang.py).
"""
from __future__ import annotations

from typing import Iterable, NamedTuple

import numpy as np

from vision_basedsensor_tpu.calibrate.artifact import CalibrationArtifact
from vision_basedsensor_tpu.calibrate.chessboard import find_chessboard
from vision_basedsensor_tpu.calibrate.zhang import ZhangResult, calibrate_intrinsics
from vision_basedsensor_tpu.core.imaging import to_grayscale


def board_object_points(pattern_size: tuple[int, int],
                        square_mm: float) -> np.ndarray:
    """Planar board coordinates in the reference's ordering
    (``intrinsic_calibration.py:58-59``: x varies fastest)."""
    cols, rows = pattern_size
    xs, ys = np.meshgrid(np.arange(cols), np.arange(rows))
    return np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1) * square_mm


class ImageCalibration(NamedTuple):
    result: ZhangResult
    artifact: CalibrationArtifact
    used_images: list[int]


def calibrate_from_images(images: Iterable[np.ndarray],
                          pattern_size: tuple[int, int] = (6, 6),
                          square_mm: float = 3.0,
                          crop_ratios: tuple | None = None,
                          min_images: int = 3,
                          refine_iters: int = 30) -> ImageCalibration | None:
    """Detect boards in every image and solve intrinsics.

    Returns None when fewer than ``min_images`` boards are found (the
    reference's >= 3 valid images rule, ``intrinsic_calibration.py:92``).
    """
    import jax.numpy as jnp

    from vision_basedsensor_tpu.core.imaging import crop_frames

    objp = board_object_points(pattern_size, square_mm)
    objs, imgs, used = [], [], []
    for i, img in enumerate(images):
        gray = np.asarray(to_grayscale(jnp.asarray(img)))
        if crop_ratios is not None:
            gray = np.asarray(crop_frames(jnp.asarray(gray), crop_ratios=tuple(crop_ratios)))
        res = find_chessboard(gray, pattern_size)
        if not res.found:
            continue
        objs.append(objp)
        imgs.append(res.corners)
        used.append(i)
    if len(objs) < min_images:
        return None

    # Corner ordering from the detector is canonical-but-arbitrary in
    # direction; Zhang's planar solve is invariant to a consistent flip, and
    # the GN refinement handles per-view pose, so orderings just need to be
    # internally consistent per image (order_grid guarantees that).
    z = calibrate_intrinsics(np.stack(objs), np.stack(imgs),
                             refine_iters=refine_iters)
    art = CalibrationArtifact(
        fx=float(z.cam.fx), fy=float(z.cam.fy), cx=float(z.cam.cx),
        cy=float(z.cam.cy), skew=0.0, dist=np.asarray(z.cam.dist),
        intrinsic_reproj_error=float(z.mean_reproj_error))
    return ImageCalibration(result=z, artifact=art, used_images=used)
