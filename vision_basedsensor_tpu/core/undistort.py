"""Full-frame undistortion: rectify-map construction + bilinear remap.

Replaces the reference's optional frame-undistortion path
(``marker_detection.py:93-109``: ``getOptimalNewCameraMatrix`` +
``initUndistortRectifyMap`` + ``remap``) with jitted array ops: the map is a
``(H, W, 2)`` source-coordinate field built once from the camera model, and
remap is a bilinear gather that batches over frames.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vision_basedsensor_tpu.core import camera as cam_mod
from vision_basedsensor_tpu.core.camera import CameraModel


def optimal_new_camera(cam: CameraModel, h: int, w: int,
                       alpha: float = 0.0) -> CameraModel:
    """Scaled pinhole (no distortion) covering the undistorted image.

    alpha=0 crops to all-valid pixels (the reference's choice,
    ``marker_detection.py:101-103``); alpha=1 keeps every source pixel.
    """
    # Undistort the border grid to find the valid region, like OpenCV does.
    xs = np.linspace(0, w - 1, 32)
    ys = np.linspace(0, h - 1, 32)
    border = np.concatenate([
        np.stack([xs, np.zeros_like(xs)], -1),
        np.stack([xs, np.full_like(xs, h - 1)], -1),
        np.stack([np.zeros_like(ys), ys], -1),
        np.stack([np.full_like(ys, w - 1), ys], -1),
    ])
    und = np.asarray(cam_mod.undistort_points(cam, jnp.asarray(border),
                                              iters=10, to_pixels=False))
    # Outer box (alpha=1): bounding box of all undistorted border points.
    x0o, y0o = und.min(0)
    x1o, y1o = und.max(0)
    # Inner box (alpha=0): the largest box inside every border curve.
    top = und[:32]
    bot = und[32:64]
    lef = und[64:96]
    rig = und[96:]
    x0i, x1i = lef[:, 0].max(), rig[:, 0].min()
    y0i, y1i = top[:, 1].max(), bot[:, 1].min()
    x0 = x0i + (x0o - x0i) * alpha
    x1 = x1i + (x1o - x1i) * alpha
    y0 = y0i + (y0o - y0i) * alpha
    y1 = y1i + (y1o - y1i) * alpha
    fx_new = (w - 1) / max(x1 - x0, 1e-9)
    fy_new = (h - 1) / max(y1 - y0, 1e-9)
    return CameraModel.create(fx_new, fy_new, -x0 * fx_new, -y0 * fy_new)


def build_rectify_map(cam: CameraModel, h: int, w: int,
                      new_cam: CameraModel | None = None) -> jnp.ndarray:
    """Source pixel coordinates ``(H, W, 2)`` for each destination pixel.

    Forward-distorts the new camera's rays through the original model —
    the same construction as ``cv2.initUndistortRectifyMap``.
    """
    if new_cam is None:
        new_cam = optimal_new_camera(cam, h, w, alpha=0.0)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    uv = jnp.stack([gx, gy], axis=-1)
    xyn = cam_mod.pixel_to_normalized(new_cam, uv)
    return cam_mod.normalized_to_pixel(cam, cam_mod.distort_normalized(cam, xyn))


@jax.jit
def remap_bilinear(frames: jnp.ndarray, src_map: jnp.ndarray) -> jnp.ndarray:
    """Bilinear remap of frames ``(..., H, W)`` through ``src_map (H, W, 2)``.

    Out-of-bounds samples read the clamped border (BORDER_REPLICATE-like;
    the reference's valid-region crop makes borders irrelevant).
    """
    h, w = frames.shape[-2:]
    x = jnp.clip(src_map[..., 0], 0.0, w - 1.000001)
    y = jnp.clip(src_map[..., 1], 0.0, h - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    def gather(yy, xx):
        return frames[..., yy, xx]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))
