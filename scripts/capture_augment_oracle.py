"""Capture the reference's Augmenter (FISR_tfoptflow/augment.py:38-138,
pure numpy+cv2 — no TF needed) on forced-branch cases, as the oracle for
data/augment.augment_pair.

Pins the flip flow-sign semantics and the translate semantics (frame 2
shifted by cv2.warpAffine with BORDER_CONSTANT zero fill, flow gaining
(tw, th)). The scale branch calls the upstream `utils.scale` the reference
does NOT vendor (one of the 8 missing modules, PARITY.md), so it cannot be
captured — our scale_keep_size remains the documented equivalent.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_augment_oracle.py
"""

import json
import os
import random
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

H, W = 24, 32
SEED = 1969


def main():
    # the reference module imports `from .utils import scale` — that utils
    # module is one of the 8 upstream files the reference does not vendor
    sys.modules.setdefault(
        "FISR_tfoptflow.utils", types.SimpleNamespace(scale=None))
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from FISR_tfoptflow.augment import Augmenter

    rng = np.random.default_rng(61)
    img1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    flow = rng.uniform(-6, 6, (H, W, 2)).astype(np.float32)
    images = np.stack([np.stack([img1, img2])])  # [1, 2, H, W, 3]
    labels = flow[None]

    # case 1: both flips, nothing else (p=1.0 fires: random() < 1.0 always)
    aug = Augmenter({"aug_type": "basic", "aug_labels": True,
                     "fliplr": 1.0, "flipud": 1.0,
                     "translate": (0.0, 0.0), "scale": (0.0, 0.0),
                     "random_seed": SEED})
    flip_imgs, flip_flow = aug.augment(images, labels)

    # case 2: translate only (heavy mode, flips off via p=0 -> branch not
    # even drawn, augment.py:83,92)
    aug = Augmenter({"aug_type": "heavy", "aug_labels": True,
                     "fliplr": 0.0, "flipud": 0.0,
                     "translate": (1.0, 0.25), "scale": (0.0, 0.0),
                     "random_seed": SEED})
    tr_imgs, tr_flow = aug.augment(images, labels)
    # replicate the module-random draw order to recover (tw, th)
    r = random.Random()
    r.seed(SEED)
    assert r.random() < 1.0  # the translate gate
    tw = int(r.uniform(-0.25, 0.25) * W)
    th = int(r.uniform(-0.25, 0.25) * H)
    assert tw or th, "degenerate draw — change SEED"
    np.testing.assert_allclose(
        np.asarray(tr_flow)[0] - flow,
        np.broadcast_to(np.float32([tw, th]), flow.shape), atol=1e-5)

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(
        os.path.join(OUT_DIR, "augment.npz"),
        img1=img1, img2=img2, flow=flow,
        flip_img1=np.asarray(flip_imgs)[0, 0],
        flip_img2=np.asarray(flip_imgs)[0, 1],
        flip_flow=np.asarray(flip_flow)[0],
        tr_img1=np.asarray(tr_imgs)[0, 0],
        tr_img2=np.asarray(tr_imgs)[0, 1],
        tr_flow=np.asarray(tr_flow)[0],
        tw=np.int64(tw), th=np.int64(th))
    with open(os.path.join(OUT_DIR, "augment_manifest.json"), "w") as f:
        json.dump({"h": H, "w": W, "tw": tw, "th": th, "seed": SEED,
                   "source": "FISR_tfoptflow/augment.py:38-138 verbatim "
                             "(numpy+cv2; utils.scale stubbed — the scale "
                             "branch is a missing upstream module)"},
                  f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"# flips + translate (tw={tw}, th={th}) captured -> augment.npz")


if __name__ == "__main__":
    main()
