"""Optical-flow training augmentation (flow-label-consistent).

Rebuild of the tfoptflow Augmenter (augment.py:27-36 options, :56+): random
horizontal/vertical flips (p=0.5 each) and random translation (+/-5% of
size, p=0.5), applied identically to both frames AND transformed on the flow
labels: a horizontal flip negates u, a vertical flip negates v; translating
frame 2 relative to frame 1 adds the translation to the flow.

Implemented with numpy on the host (the reference augments on CPU too);
deterministic under a seeded Generator (reference seed 1969).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["AugmentOptions", "augment_pair"]


@dataclasses.dataclass
class AugmentOptions:
    fliplr: float = 0.5
    flipud: float = 0.5
    translate_prob: float = 0.5
    translate_frac: float = 0.05  # +/- fraction of H/W
    seed: int = 1969


def augment_pair(x: np.ndarray, y: np.ndarray, opts: AugmentOptions,
                 rng: np.random.Generator):
    """x: [2, H, W, 3] frame pair; y: [H, W, 2] flow (u, v). Returns new
    (x, y)."""
    x = x.copy()
    y = y.copy()
    h, w = y.shape[:2]
    if rng.uniform() < opts.fliplr:
        x = x[:, :, ::-1]
        y = y[:, ::-1]
        y[..., 0] = -y[..., 0]
    if rng.uniform() < opts.flipud:
        x = x[:, ::-1]
        y = y[::-1]
        y[..., 1] = -y[..., 1]
    if rng.uniform() < opts.translate_prob:
        tx = int(rng.uniform(-opts.translate_frac, opts.translate_frac) * w)
        ty = int(rng.uniform(-opts.translate_frac, opts.translate_frac) * h)
        if tx or ty:
            # shift frame 2 by (tx, ty); flow gains the same offset
            x2 = np.roll(np.roll(x[1], ty, axis=0), tx, axis=1)
            # replicate rolled-in borders
            if ty > 0:
                x2[:ty] = x2[ty : ty + 1]
            elif ty < 0:
                x2[ty:] = x2[ty - 1 : ty]
            if tx > 0:
                x2[:, :tx] = x2[:, tx : tx + 1]
            elif tx < 0:
                x2[:, tx:] = x2[:, tx - 1 : tx]
            x[1] = x2
            y = y + np.array([tx, ty], y.dtype)
    return x, y
