"""Augmentation parity vs the reference's OWN Augmenter
(FISR_tfoptflow/augment.py, numpy+cv2 — captured without TF by
scripts/capture_augment_oracle.py).

Pins the flip flow-sign semantics and the translate semantics: frame 2
shifted with cv2.warpAffine zero fill, flow gaining (tw, th). The scale
branch calls the upstream `utils.scale` the reference does NOT vendor, so
our scale_keep_size stays a documented equivalent (PARITY.md)."""

import json
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tf_oracle")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "augment_manifest.json")),
    reason="augment oracle fixtures not captured")


class _Uniforms:
    """rng stub feeding augment_pair a scripted uniform() sequence."""

    def __init__(self, seq):
        self.seq = list(seq)

    def uniform(self, lo=0.0, hi=1.0):
        u = self.seq.pop(0)
        return lo + (hi - lo) * u if (lo, hi) != (0.0, 1.0) else u


def _load():
    with open(os.path.join(FIX, "augment_manifest.json")) as f:
        man = json.load(f)
    return man, np.load(os.path.join(FIX, "augment.npz"))


def test_flips_match_reference():
    from fisr_tpu.data.augment import AugmentOptions, augment_pair

    _, z = _load()
    x = np.stack([z["img1"], z["img2"]])
    opts = AugmentOptions(fliplr=1.0, flipud=1.0,
                          translate_prob=-1.0, scale_prob=-1.0)
    # both flip gates fire (0.5 < 1.0); translate/scale gates never
    xa, ya = augment_pair(x, z["flow"], opts, _Uniforms([0.5, 0.5, 1.0, 1.0]))
    np.testing.assert_array_equal(xa[0], z["flip_img1"])
    np.testing.assert_array_equal(xa[1], z["flip_img2"])
    np.testing.assert_allclose(ya, z["flip_flow"], atol=0)


def test_translate_matches_reference():
    from fisr_tpu.data.augment import AugmentOptions, augment_pair

    man, z = _load()
    h, w = man["h"], man["w"]
    tw, th = man["tw"], man["th"]
    x = np.stack([z["img1"], z["img2"]])
    frac = 0.25
    opts = AugmentOptions(fliplr=-1.0, flipud=-1.0,
                          translate_prob=1.0, translate_frac=frac,
                          scale_prob=-1.0)
    # script the draws so int(uniform(-f,f)*dim) reproduces the capture's
    # (tw, th); augment_pair draw order: fliplr gate, flipud gate,
    # translate gate, tx-uniform, ty-uniform, scale gate
    u_tx = (tw / w / frac + 1.0) / 2.0
    u_ty = (th / h / frac + 1.0) / 2.0
    xa, ya = augment_pair(x, z["flow"], opts,
                          _Uniforms([1.0, 1.0, 0.0, u_tx, u_ty, 1.0]))
    assert int((2 * u_tx - 1) * frac * w) == tw
    np.testing.assert_array_equal(xa[0], z["tr_img1"])
    # frame 2: cv2.warpAffine zero-fill shift — must match bit-level
    np.testing.assert_array_equal(xa[1], z["tr_img2"])
    np.testing.assert_allclose(ya, z["tr_flow"], atol=1e-5)
