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

from fisr_tpu.infer.halo import unpatchify
from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import F32, Policy
from fisr_tpu.ops.resize import downsample_int

__all__ = ["make_device_runner", "staged_apply", "run_level_tiled",
           "tiled_apply", "tiled_apply_padded", "padded_grid",
           "FastTiledRunner"]


def _split(x: jnp.ndarray, grid, halo_h: int, halo_w: int) -> jnp.ndarray:
    """Overlapping patchify: zero-pad the canvas, batch the (gh, gw) grid."""
    gh, gw = grid
    _b, h, w, _c = x.shape
    if h % gh or w % gw:
        raise ValueError(
            f"grid {grid} does not divide frame {h}x{w}: slice reassembly "
            f"would silently drop up to {gh - 1}/{gw - 1} rows/cols")
    sh, sw = h // gh, w // gw
    xp = jnp.pad(x, ((0, 0), (halo_h, halo_h), (halo_w, halo_w), (0, 0)))
    return jnp.concatenate(
        [xp[:, i * sh : (i + 1) * sh + 2 * halo_h,
            j * sw : (j + 1) * sw + 2 * halo_w, :]
         for i in range(gh) for j in range(gw)], 0)


def run_level_tiled(p, x: jnp.ndarray, grid, halo: int, sf: int = 2,
                    policy: Policy = F32) -> jnp.ndarray:
    """One FISRnet level, patch-tiled at `grid` with a `halo`-px ring.

    Full-frame in, full-frame out; halos are declared stale to the model so
    it can shrink them mid-pipeline (fisrnet.apply_level) when both axes are
    split. grid (1,1) short-circuits to the plain full-frame apply.
    """
    gh, gw = grid
    if gh * gw == 1:
        return fisrnet.apply_level(p, x, sf, policy)
    b = x.shape[0]
    hh = halo if gh > 1 else 0
    hw = halo if gw > 1 else 0
    stale = halo if (hh == hw and halo >= 16 and (halo - 16) % 8 == 0) else 0
    pred = fisrnet.apply_level(p, _split(policy.cast(x), grid, hh, hw),
                               sf, policy, stale_halo=stale, fast_upsample=True)
    th = (8 if stale else hh) * sf
    tw = (8 if stale else hw) * sf
    core = pred[:, th : pred.shape[1] - th or None,
                tw : pred.shape[2] - tw or None, :]
    return unpatchify(core, grid, b)


def default_plans(h: int, w: int):
    """Per-level patch grids for an (h, w) input window, tuned on v5e
    (PERF.md): the finest level needs (4,4)-sized extents for XLA to tile
    its convs well; coarser levels get away with fewer, larger patches,
    which halves their halo-recompute ratio."""
    def g(scale, target):
        def pick(extent, tgt):
            # largest grid <= tgt that divides the extent (a non-divisor
            # would make _split's slice reassembly drop rows)
            want = max(1, min(tgt, extent // 256))
            return max(d for d in range(1, want + 1) if extent % d == 0)
        return (pick(h // scale, target), pick(w // scale, target))
    return {"level_1": (1, 1), "level_2": g(2, 2), "level_3": g(1, 4)}


def staged_apply(params, img: jnp.ndarray, plans=None, boundary: int = 32,
                 sf: int = 2, policy: Policy = F32):
    """Full 3-level FISRnet with per-LEVEL tiling (run_level_tiled).

    Each level is tiled at its own grid with the reference halo expressed at
    its own scale (boundary/4, /2, /1 — the proportions the reference's
    whole-window tiling gives each level implicitly, FISRnet.py:846-880);
    levels hand off full-frame tensors. Same signature contract as
    `fisrnet.apply`; `plans` maps level name -> patch grid.

    vs tiled_apply (whole-window tiling): the coarse levels run as fewer,
    larger patches (halo-recompute ratio 1.2 instead of 1.42) and patch
    seams per level are independent — interiors are closer to full-frame
    inference, frame edges carry the same zero-pad approximation class.
    """
    if plans is None:
        plans = default_plans(img.shape[1], img.shape[2])
    img = policy.cast(img)
    img_l1 = downsample_int(img, 4)
    pred_l1 = run_level_tiled(params["level_1"], img_l1, plans["level_1"],
                              boundary // 4, sf, policy)
    img_l2 = jnp.concatenate([downsample_int(img, 2), pred_l1], axis=-1)
    pred_l2 = run_level_tiled(params["level_2"], img_l2, plans["level_2"],
                              boundary // 2, sf, policy)
    img_l3 = jnp.concatenate([img, pred_l2], axis=-1)
    pred_l3 = run_level_tiled(params["level_3"], img_l3, plans["level_3"],
                              boundary, sf, policy)
    return pred_l1, pred_l2, pred_l3


def tiled_apply(params, x: jnp.ndarray, grid: Tuple[int, int],
                boundary: int = 32, sf: int = 2, policy: Policy = F32) -> jnp.ndarray:
    """In-jit padded tiling body (traceable; used by runners + fused video).

    Zero-pads only grid-split axes, batches the patch grid into one FISRnet
    apply, trims and reassembles — all inside the caller's trace. When both
    axes are split, the discardable halo is declared to the model
    (final_stale_halo), which shrinks it mid-pipeline once the remaining
    stages stop reading it — bit-identical output, ~18% fewer dec0/head
    FLOPs (models/fisrnet.apply_level).
    """
    gh, gw = grid
    b, h, w, _c = x.shape
    if h % gh or w % gw:
        raise ValueError(f"grid {grid} does not divide frame {h}x{w}")
    s_h, s_w = h // gh, w // gw
    bh = boundary if gh > 1 else 0
    bw = boundary if gw > 1 else 0
    stale = boundary if (
        bh == bw == boundary and boundary >= 16 and (boundary - 16) % 8 == 0
    ) else 0
    xp = jnp.pad(policy.cast(x), ((0, 0), (bh, bh), (bw, bw), (0, 0)))
    patches = [
        xp[:, ph * s_h : (ph + 1) * s_h + 2 * bh,
           pw * s_w : (pw + 1) * s_w + 2 * bw, :]
        for ph in range(gh) for pw in range(gw)
    ]
    pred = fisrnet.apply(params, jnp.concatenate(patches, 0), sf, policy,
                         final_stale_halo=stale, fast_upsample=True,
                         fuse_input_glue=True)[2]
    rem = 8  # stale ring left on pred after the mid-pipeline shrink
    th = (rem if stale else bh) * sf
    tw = (rem if stale else bw) * sf
    core = pred[:, th : th + s_h * sf, tw : tw + s_w * sf, :]
    return unpatchify(core, grid, b)


def tiled_apply_padded(params, x: jnp.ndarray, grid: Tuple[int, int],
                       pads: Tuple[int, int] = (0, 0), boundary: int = 32,
                       sf: int = 2, policy: Policy = F32) -> jnp.ndarray:
    """`tiled_apply` behind an edge-replicated pad that unlocks `grid`.

    Pads rows/cols at the bottom/right (edge mode — replicated context is
    closer to frame-interior statistics than a zero ring), tiles at `grid`,
    crops the sf-scaled output back. Lets extents that don't divide into
    the measured patch sweet spot reach it anyway: at the video pipeline's
    1056-row frames (1056/32 = 33 admits only gh in {1,3}), padding 96 rows
    to 1152 and tiling (4,6) measured 212.5 ms vs (3,6)'s 234.0 on v5e —
    -9.2% despite +9.1% rows, because (3,6)'s 416-row haloed patches sit
    past the 320-row XLA sweet spot (scripts/probe_pad46.py, 5-rep medians,
    one process). Deviation class: identical to `tiled_apply` everywhere
    except the bottom/right `boundary`-px band of the real frame, whose
    halo reads replicated rows instead of the zero ring.
    """
    ph, pw = pads
    if not (ph or pw):
        return tiled_apply(params, x, grid, boundary, sf, policy)
    _b, h, w, _c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    y = tiled_apply(params, xp, grid, boundary, sf, policy)
    return y[:, : h * sf, : w * sf, :]


def padded_grid(h: int, w: int, target: Tuple[int, int] = (4, 6),
                max_pad_frac: float = 0.10):
    """((gh, gw), (pad_h, pad_w)): largest grid <= target reachable by
    padding each axis at most `max_pad_frac`, preferring less padding at
    equal grid. The per-axis descent with pad=0 admitted is itself the
    `best_grid`-equivalent fallback: when no pad within the bound unlocks
    a larger grid, each axis lands on its largest exactly-dividing g and
    the result equals best_grid(h, w) with pad (0, 0) — no separate call.

    Pad-budget note: this heuristic caps pads at 10% per axis, while the
    autotune sweep's padded_candidates explores up to 12.5%
    (infer/autotune.py). Deliberate asymmetry: the unmeasured heuristic
    stays conservative (pad work is pure overhead unless the grid change
    wins, and 10% covers the measured 1056->1152 case), while the sweep —
    which times every candidate before serving it — may range wider; a
    'tuned' plan can therefore carry a pad 'auto' would never choose,
    justified by its measurement.

    Encoded crossover (v5e, 2026-08-18, scripts/probe_pad46.py): at
    1056x1920, pad 96 rows (9.1%) -> (4,6) wins -21.5 ms over the
    unpadded (3,6); (6,6) at the same padded extent loses (236.6 ms) —
    so the target stays (4,6) and the pad budget stays ~10%. At bench's
    1024x1920 the rule degenerates to pad 0 / (4,6) (unchanged numerics).
    """
    if h % 32 or w % 32:
        raise ValueError(f"padded_grid: frame {h}x{w} must be 32-multiples")

    def axis(extent: int, tgt: int):
        for g in range(tgt, 0, -1):
            pad = (-extent) % (32 * g)
            if pad <= max_pad_frac * extent:
                return g, pad
        return 1, 0

    (gh, ph), (gw, pw) = axis(h, target[0]), axis(w, target[1])
    return (gh, gw), (ph, pw)


class FastTiledRunner:
    """TiledRunner-interface adapter over the fully-jitted device path.

    Same call contract as infer/tiled.TiledRunner (host numpy in/out, .grid
    and .sf attributes — what infer/evaluate.evaluate_test_set needs), but
    one XLA program per call: in-jit padded tiling + mid-pipeline
    stale-halo shrink + level-3 fast upsample. `padded`-class quality
    (interior patches exact, zero-ring frame edges); the `exact` TiledRunner
    remains the reference-parity default for published-number evaluation.
    """

    def __init__(self, params, grid: Tuple[int, int] = (2, 2),
                 boundary: int = 32, sf: int = 2, policy: Policy = F32):
        self.params = params
        self.grid = grid
        self.boundary = boundary
        self.sf = sf
        self.policy = policy
        self._fn = jax.jit(lambda p, x: tiled_apply(p, x, grid, boundary,
                                                    sf, policy))

    def __call__(self, inp) -> "jnp.ndarray":
        import numpy as np

        return np.asarray(self._fn(self.params, jnp.asarray(inp)), np.float32)


def best_grid(h: int, w: int, target: Tuple[int, int] = (4, 6)):
    """Largest valid grid <= target whose patches stay 32-multiples.

    Default target (4,6): the post-shrink grid sweep found patch W of
    320+2*32=384 is an XLA sweet spot at 2K (PERF.md — (4,6) 207.4 ms vs
    (4,4) 211.0 at 1024x1920; W 448 patches are ~10% slower)."""
    if h % 32 or w % 32:
        # even grid 1 needs 32-multiples (FISRnet's /4 pyramid + halo math);
        # callers crop first (run_video_pipeline: h - h % 32)
        raise ValueError(f"best_grid: frame {h}x{w} must be 32-multiples "
                         "(crop or pad first, e.g. 1080 -> 1056)")
    gh = max(g for g in range(1, target[0] + 1) if h % (32 * g) == 0)
    gw = max(g for g in range(1, target[1] + 1) if w % (32 * g) == 0)
    return gh, gw


def make_device_runner(mode: str = "full", grid: Tuple[int, int] = (2, 2),
                       boundary: int = 32, sf: int = 2, policy: Policy = F32):
    """Returns jitted fn(params, x [B,h,w,29]) -> [B, h*sf, w*sf, 9] (device)."""

    if mode == "full":
        def run(params, x):
            return fisrnet.apply(params, x, sf, policy,
                                 fuse_input_glue=True)[2]

        return jax.jit(run)

    if mode == "staged":
        return jax.jit(lambda params, x: staged_apply(params, x, None,
                                                      boundary, sf, policy)[2])

    if mode != "tiled":
        raise ValueError(mode)

    return jax.jit(lambda params, x: tiled_apply(params, x, grid, boundary,
                                                 sf, policy))
