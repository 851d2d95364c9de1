"""flow_viz.flow_to_img parity vs the reference's OWN cv2 rendering.

Fixtures from scripts/capture_optflow_oracle.py: the verbatim
FISR_tfoptflow/optflow.py:190-235 flow_to_img (cartToPolar -> u8 HSV ->
cv2.cvtColor HSV2RGB) on four deterministic flows covering all three
saturation branches (NORM_MINMAX, flow_mag_max, normalize=False) and a
full-color-wheel sweep. Our port is an independent numpy implementation;
the only licensed deviation is cv2.cartToPolar's fast atan (~0.3 deg) vs
exact arctan2, which moves the u8 hue by at most one count on a tiny
fraction of pixels. Bounds are calibrated from the capture (worst case
measured: max=7, mean=0.46, frac>2 = 2.2e-4) with ~2x headroom.
"""

import json
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tf_oracle")

needs_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "optflow_manifest.json")),
    reason="optflow oracle fixtures not captured")


@pytest.fixture(scope="module")
def oracle():
    with open(os.path.join(FIX, "optflow_manifest.json")) as f:
        man = json.load(f)
    z = np.load(os.path.join(FIX, "optflow_viz.npz"))
    return man, z


@needs_fixture
@pytest.mark.parametrize("case", ["rand", "wheel", "magmax", "raw"])
def test_flow_to_img_matches_reference_cv2(oracle, case):
    from fisr_tpu.utils.flow_viz import flow_to_img

    man, z = oracle
    kw = man["cases"][case]
    ours = flow_to_img(z[f"flow__{case}"], **kw)
    ref = z[f"img__{case}"]
    assert ours.dtype == np.uint8 and ours.shape == ref.shape
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 16, diff.max()
    assert diff.mean() <= 1.0, diff.mean()
    assert (diff > 2).mean() <= 2e-3, (diff > 2).mean()


@needs_fixture
def test_zero_flow_pixel_renders_white(oracle):
    """The wheel case's center pixel has exactly zero flow -> sat 0 ->
    (255,255,255) in both the reference capture and our port."""
    from fisr_tpu.utils.flow_viz import flow_to_img

    man, z = oracle
    flow = z["flow__wheel"]
    iy, ix = np.unravel_index(
        np.argmin(np.abs(flow).sum(-1)), flow.shape[:2])
    assert np.all(flow[iy, ix] == 0.0)
    assert tuple(z["img__wheel"][iy, ix]) == (255, 255, 255)
    assert tuple(flow_to_img(flow)[iy, ix]) == (255, 255, 255)
