"""Patch-tiled high-resolution inference (single device).

The reference tiles 4K frames into a `test_patch` grid with a 32-px halo to
fit GPU memory, rebuilding the TF graph and round-tripping the host for
EVERY patch (FISRnet.py:846-880 — the per-patch `tf.placeholder` + `model()`
+ `sess.run` inside the loop). Here the same tiling is a handful of jitted
calls on batched patch stacks:

* `get_hw_boundary` / `trim_patch_boundary` — exact ports of the asymmetric
  halo math (utils.py:118-159): interior patch sides carry a `boundary` halo,
  frame-edge sides carry none, and the model output is trimmed by
  boundary*sf wherever a halo existed.
* `exact` mode — reproduces the reference patch shapes bit-for-bit: patches
  are grouped by their (add_H, add_W) halo signature (<= 4 distinct shapes
  for any grid) and each group runs as ONE batched apply.
* `padded` mode — uniform-shape variant: the canvas is zero-padded by
  `boundary` on all sides so every patch is the same shape and the whole
  grid is ONE apply; trimming is uniform. Interior patches are identical to
  `exact`; frame-edge pixels differ only within the deep receptive field
  (the same class of approximation tiling itself introduces). This is the
  math the multi-chip halo-exchange path (infer/sharded.py) implements with
  ppermute, so the two are cross-checkable bit-for-bit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import F32, Policy

__all__ = ["get_hw_boundary", "trim_patch_boundary", "TiledRunner"]


def get_hw_boundary(patch_boundary: int, h: int, w: int, p_h: int, s_h: int,
                    p_w: int, s_w: int):
    """Exact port of utils.py:118-135."""
    h_low = max(p_h * s_h - patch_boundary, 0)
    h_high = min((p_h + 1) * s_h + patch_boundary, h)
    w_low = max(p_w * s_w - patch_boundary, 0)
    w_high = min((p_w + 1) * s_w + patch_boundary, w)
    add_h = 0
    add_w = 0
    if p_h * s_h >= patch_boundary:
        add_h += patch_boundary
    if (p_h + 1) * s_h + patch_boundary <= h:
        add_h += patch_boundary
    if p_w * s_w >= patch_boundary:
        add_w += patch_boundary
    if (p_w + 1) * s_w + patch_boundary <= w:
        add_w += patch_boundary
    return h_low, h_high, w_low, w_high, add_h, add_w


def trim_patch_boundary(img: np.ndarray, patch_boundary: int, h: int, w: int,
                        p_h: int, s_h: int, p_w: int, s_w: int, sf: int):
    """Exact port of utils.py:138-159 (img: [B, H', W', C])."""
    if patch_boundary == 0:
        return img
    if p_h * s_h >= patch_boundary:
        img = img[:, patch_boundary * sf :, :, :]
    if (p_h + 1) * s_h + patch_boundary <= h:
        img = img[:, : -patch_boundary * sf or None, :, :]
    if p_w * s_w >= patch_boundary:
        img = img[:, :, patch_boundary * sf :, :]
    if (p_w + 1) * s_w + patch_boundary <= w:
        img = img[:, :, : -patch_boundary * sf or None, :]
    return img


@dataclasses.dataclass
class TiledRunner:
    """Patch-tiled FISRnet level-3 inference over full frames.

    params:   FISRnet param pytree
    grid:     (rows, cols) patch grid — reference `test_patch` (main.py:89)
    boundary: halo width in input pixels (32, FISRnet.py:779)
    sf:       spatial upscale factor (2)
    """

    params: object
    grid: Tuple[int, int] = (2, 2)
    boundary: int = 32
    sf: int = 2
    policy: Policy = F32
    mode: str = "exact"  # 'exact' | 'padded'

    def __post_init__(self):
        self._apply = jax.jit(
            lambda p, x: fisrnet.apply(p, x, self.sf, self.policy)[2]
        )

    # ------------------------------------------------------------------
    def __call__(self, inp: np.ndarray) -> np.ndarray:
        """inp: [B, h, w, 29] host array (h, w multiples of 32*grid).
        Returns [B, h*sf, w*sf, 9] host array."""
        b, h, w, _c = inp.shape
        gh, gw = self.grid
        s_h, s_w = h // gh, w // gw
        # interior patches whose low halo clips at the frame edge would
        # break the equal-crop-shape grouping below; the reference never
        # hits this (boundary=32 with s >= 32 guaranteed by its crop,
        # FISRnet.py:818-825) — fail clearly instead of on a concat
        if (gh > 1 and s_h < self.boundary) or (gw > 1 and s_w < self.boundary):
            raise ValueError(
                f"patch side ({s_h}x{s_w} from grid {self.grid} on "
                f"{h}x{w}) must be >= boundary ({self.boundary}); use a "
                f"coarser grid or a smaller boundary")
        if self.mode == "padded":
            return self._run_padded(inp)
        return self._run_exact(inp)

    def _run_exact(self, inp: np.ndarray) -> np.ndarray:
        b, h, w, c = inp.shape
        gh, gw = self.grid
        s_h, s_w = h // gh, w // gw
        out = np.zeros((b, h * self.sf, w * self.sf, 9), np.float32)

        # group patches by halo signature so each distinct shape jits once
        groups: dict = {}
        for p_h in range(gh):
            for p_w in range(gw):
                hl, hh, wl, wh, add_h, add_w = get_hw_boundary(
                    self.boundary, h, w, p_h, s_h, p_w, s_w
                )
                groups.setdefault((add_h, add_w), []).append(
                    (p_h, p_w, hl, hh, wl, wh)
                )

        for (add_h, add_w), patches in groups.items():
            stack = np.concatenate(
                [inp[:, hl:hh, wl:wh, :] for (_, _, hl, hh, wl, wh) in patches], 0
            )
            pred = np.asarray(self._apply(self.params, jnp.asarray(stack)),
                              np.float32)
            for i, (p_h, p_w, *_rest) in enumerate(patches):
                patch_pred = pred[i * b : (i + 1) * b]
                trimmed = trim_patch_boundary(
                    patch_pred, self.boundary, h, w, p_h, s_h, p_w, s_w, self.sf
                )
                out[:, p_h * s_h * self.sf : (p_h + 1) * s_h * self.sf,
                    p_w * s_w * self.sf : (p_w + 1) * s_w * self.sf, :] = trimmed
        return out

    def _run_padded(self, inp: np.ndarray) -> np.ndarray:
        b, h, w, c = inp.shape
        gh, gw = self.grid
        s_h, s_w = h // gh, w // gw
        # pad (with zeros) only the axes the grid actually splits — an unsplit
        # axis keeps the model's native conv-SAME frame-edge behavior
        bh = self.boundary if gh > 1 else 0
        bw = self.boundary if gw > 1 else 0
        padded = np.pad(inp, ((0, 0), (bh, bh), (bw, bw), (0, 0)))
        patches = []
        for p_h in range(gh):
            for p_w in range(gw):
                patches.append(
                    padded[:, p_h * s_h : (p_h + 1) * s_h + 2 * bh,
                           p_w * s_w : (p_w + 1) * s_w + 2 * bw, :]
                )
        stack = np.concatenate(patches, 0)
        pred = np.asarray(self._apply(self.params, jnp.asarray(stack)), np.float32)
        th, tw = bh * self.sf, bw * self.sf
        out = np.zeros((b, h * self.sf, w * self.sf, 9), np.float32)
        k = 0
        for p_h in range(gh):
            for p_w in range(gw):
                patch_pred = pred[k * b : (k + 1) * b,
                                  th : th + s_h * self.sf,
                                  tw : tw + s_w * self.sf, :]
                out[:, p_h * s_h * self.sf : (p_h + 1) * s_h * self.sf,
                    p_w * s_w * self.sf : (p_w + 1) * s_w * self.sf, :] = patch_pred
                k += 1
        return out
