"""BASELINE config 1 on REAL data: the reference's own raw sensor image.

``img/raw_markers.png`` is an actual frame from the physical sensor
(camera inside the bonnet viewing the 65 printed markers). All 65 markers
must be detected and receive canonical ids with the correct ring structure —
including the real prototype's quirks the synthetic fixtures don't have
(its outermost markers sit ~45 deg and ~8% radius off the published table,
handled by per-ring phase estimation and the ring-residual tolerance).
"""
import collections
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vision_basedsensor_tpu.config import DetectConfig, TrackConfig
from vision_basedsensor_tpu.detect import detect_markers
from vision_basedsensor_tpu.track import assign_identities

RAW = "/root/reference/img/raw_markers.png"

pytestmark = pytest.mark.skipif(not os.path.exists(RAW),
                                reason="reference image not mounted")


@pytest.fixture(scope="module")
def real_detections():
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread(RAW)
    return detect_markers(jnp.asarray(img), DetectConfig())


def test_real_image_detects_all_65(real_detections):
    assert int(np.asarray(real_detections.valid).sum()) == 65


def test_real_image_canonical_ids(real_detections):
    ref = assign_identities(real_detections, TrackConfig())
    v = np.asarray(ref.valid)
    assert v.sum() == 65, f"assigned {v.sum()}"
    counts = collections.Counter(np.asarray(ref.ring)[v].tolist())
    assert dict(sorted(counts.items())) == {0: 1, 1: 6, 2: 12, 3: 18, 4: 24, 5: 4}


def test_real_image_marker_sizes_sane(real_detections):
    v = np.asarray(real_detections.valid)
    axes = np.asarray(real_detections.axes)[v]
    # Physical markers are 2 mm; on this frame they image at ~13-30 px.
    assert 8 < np.median(axes[:, 0]) < 40
    assert (axes[:, 1] >= 5).all()  # min-size gate respected
