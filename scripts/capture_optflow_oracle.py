"""Capture the reference's flow_to_img (FISR_tfoptflow/optflow.py:190-235,
pure numpy+cv2 — no TF needed) as the oracle for utils/flow_viz.flow_to_img.

Pins the full cv2 rendering chain: cartToPolar (fast atan, ~0.3 deg) ->
u8 hue truncation at [0,180) -> NORM_MINMAX / flow_mag_max / raw
saturation -> cv2.cvtColor(HSV2RGB) on the u8 path. Four cases cover all
three saturation branches plus a full-wheel sweep; the script also runs
OUR port against the capture and prints the measured per-pixel error so
the test bounds are calibrated, not guessed.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_optflow_oracle.py
"""

import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

H, W = 48, 64


def make_flows():
    """Deterministic flows covering the whole wheel + all sat branches."""
    rng = np.random.default_rng(1225)
    cases = {}

    # 1. random smooth-ish flow, minmax-normalized (the panel default)
    cases["rand"] = rng.uniform(-9.0, 9.0, (H, W, 2)).astype(np.float32)

    # 2. full-wheel sweep: rotational field hits every hue sector, radial
    #    magnitude hits every saturation count; includes an exact-zero px
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    cy, cx = float(H // 2), float(W // 2)  # integer center: one exact-0 px
    u, v = xx - cx, yy - cy
    cases["wheel"] = np.stack([u, v], -1).astype(np.float32)

    # 3. fixed flow_mag_max scaling (the shared-scale panel path)
    cases["magmax"] = (cases["wheel"] * 0.37).astype(np.float32)

    # 4. normalize=False with magnitudes inside [0, 255): raw sat counts
    cases["raw"] = rng.uniform(-80.0, 80.0, (H, W, 2)).astype(np.float32)
    return cases


def main():
    sys.modules.setdefault("skimage", types.SimpleNamespace())
    sys.modules.setdefault("skimage.io",
                           types.SimpleNamespace(imsave=None))
    sys.modules.setdefault(
        "FISR_tfoptflow.utils",
        types.SimpleNamespace(clean_dst_file=None))
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from FISR_tfoptflow import optflow as ref_optflow

    sys.path.insert(0, REPO)
    from fisr_tpu.utils import flow_viz

    flows = make_flows()
    out = {}
    specs = [
        ("rand", dict(normalize=True)),
        ("wheel", dict(normalize=True)),
        ("magmax", dict(normalize=True, flow_mag_max=20.0)),
        ("raw", dict(normalize=False)),
    ]
    report = {}
    for name, kw in specs:
        ref_img = ref_optflow.flow_to_img(flows[name], **kw)
        ours = flow_viz.flow_to_img(flows[name], **kw)
        assert ref_img.dtype == np.uint8 and ref_img.shape == (H, W, 3)
        diff = np.abs(ref_img.astype(np.int32) - ours.astype(np.int32))
        report[name] = {
            "max": int(diff.max()),
            "mean": float(diff.mean()),
            "frac_gt2": float((diff > 2).mean()),
        }
        out[f"flow__{name}"] = flows[name]
        out[f"img__{name}"] = ref_img

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(os.path.join(OUT_DIR, "optflow_viz.npz"), **out)
    manifest = {
        "h": H, "w": W,
        "cases": {n: kw for n, kw in specs},
        "measured_error_vs_ours": report,
        "source": "FISR_tfoptflow/optflow.py:190-235 flow_to_img verbatim "
                  "(numpy+cv2 %s; skimage/utils stubbed — only used by "
                  "file-writer paths)" % __import__("cv2").__version__,
    }
    with open(os.path.join(OUT_DIR, "optflow_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(report, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
