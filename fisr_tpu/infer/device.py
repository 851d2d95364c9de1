"""Fully-jitted, device-resident inference runners.

For production serving the frame should never leave HBM between steps: patch
extraction, the model, trimming, and canvas reassembly are all traced into
ONE XLA program (contrast: the reference's per-patch feed_dict round trip,
FISRnet.py:846-880; and even our host-staged TiledRunner). Two modes:

* full  — no tiling at all: one FISRnet apply on the whole frame. On a 16GB
  v5e a 2K (1024x1920) 29-ch window fits comfortably in bf16; tiling's halo
  recompute (~12% for a 2x2 grid) disappears. This is the single-chip
  flagship path.
* tiled — the `padded` tiling of infer/tiled.py expressed in pure jnp inside
  jit (zero-pad split axes, batch the patch grid, trim, reassemble), for
  frames too large for HBM.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import F32, Policy

__all__ = ["make_device_runner"]


def tiled_apply(params, x: jnp.ndarray, grid: Tuple[int, int],
                boundary: int = 32, sf: int = 2, policy: Policy = F32) -> jnp.ndarray:
    """In-jit padded tiling body (traceable; used by runners + fused video).

    Zero-pads only grid-split axes, batches the patch grid into one FISRnet
    apply, trims and reassembles — all inside the caller's trace.
    """
    gh, gw = grid
    b, h, w, _c = x.shape
    s_h, s_w = h // gh, w // gw
    bh = boundary if gh > 1 else 0
    bw = boundary if gw > 1 else 0
    xp = jnp.pad(x, ((0, 0), (bh, bh), (bw, bw), (0, 0)))
    patches = [
        xp[:, ph * s_h : (ph + 1) * s_h + 2 * bh,
           pw * s_w : (pw + 1) * s_w + 2 * bw, :]
        for ph in range(gh) for pw in range(gw)
    ]
    pred = fisrnet.apply(params, jnp.concatenate(patches, 0), sf, policy)[2]
    th, tw = bh * sf, bw * sf
    rows = []
    for ph in range(gh):
        row = [
            pred[(ph * gw + pw) * b : (ph * gw + pw + 1) * b,
                 th : th + s_h * sf, tw : tw + s_w * sf, :]
            for pw in range(gw)
        ]
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def best_grid(h: int, w: int, target: Tuple[int, int] = (4, 4)):
    """Largest valid grid <= target whose patches stay 32-multiples."""
    gh = max(g for g in range(1, target[0] + 1) if h % (32 * g) == 0)
    gw = max(g for g in range(1, target[1] + 1) if w % (32 * g) == 0)
    return gh, gw


def make_device_runner(mode: str = "full", grid: Tuple[int, int] = (2, 2),
                       boundary: int = 32, sf: int = 2, policy: Policy = F32):
    """Returns jitted fn(params, x [B,h,w,29]) -> [B, h*sf, w*sf, 9] (device)."""

    if mode == "full":
        def run(params, x):
            return fisrnet.apply(params, x, sf, policy)[2]

        return jax.jit(run)

    if mode != "tiled":
        raise ValueError(mode)

    return jax.jit(lambda params, x: tiled_apply(params, x, grid, boundary,
                                                 sf, policy))
