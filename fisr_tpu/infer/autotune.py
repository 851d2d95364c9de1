"""On-device tiling autotuner: measure the grid crossovers, don't guess them.

The repo's tiling rules (`best_grid`'s (4,6) target, `default_plans`'
256/448-px extents, the PWC tiling thresholds) encode crossovers measured
on ONE chip generation (v5e, PERF.md). On a different TPU — or a future
XLA — those constants may be stale. This module re-derives the best
whole-window grid for a given frame size ON the attached device and
persists the result, keyed by (device_kind, frame, dtype, boundary), so a
deployment tunes once and serves from the cache.

The reference has no analog (its patch grid is a hand-set flag,
main.py:89 `--test_patch`); this is the TPU-native replacement for that
flag: measured, cached, device-specific.

Relay rules respected: timings are medians over `reps` passes fenced by a
scalar readback (CLAUDE.md — `block_until_ready` lies through the axon
relay), all candidates measured in ONE process.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["candidate_grids", "padded_candidates", "sweep", "TuneCache",
           "DEFAULT_CACHE_PATH"]

DEFAULT_CACHE_PATH = os.path.join(
    os.path.expanduser("~"), ".cache", "fisr_tpu", "autotune.json")

# Measured plans shipped with the package (keyed by device kind, so they
# only ever serve on matching hardware): standard video geometries tuned
# with cli/tune.py on real chips. A local tune for the same key always
# wins; this file is the out-of-the-box fallback so 720p/1080p/1440p
# serving starts on a measured plan instead of the heuristic.
SHIPPED_CACHE_PATH = os.path.join(os.path.dirname(__file__),
                                  "autotune_shipped.json")


def candidate_grids(h: int, w: int, max_gh: int = 6, max_gw: int = 8
                    ) -> List[Tuple[int, int]]:
    """All grids whose patches stay 32-multiples (the /4 pyramid + halo
    contract `best_grid` enforces), including the untiled (1,1)."""
    if h % 32 or w % 32:
        raise ValueError(f"frame {h}x{w} must be 32-multiples")
    ghs = [g for g in range(1, max_gh + 1) if h % (32 * g) == 0]
    gws = [g for g in range(1, max_gw + 1) if w % (32 * g) == 0]
    return [(gh, gw) for gh in ghs for gw in gws]


def padded_candidates(h: int, w: int, max_gh: int = 6, max_gw: int = 8,
                      max_pad_frac: float = 0.125
                      ) -> List[Tuple[Tuple[int, int], Tuple[int, int]]]:
    """[(grid, (pad_h, pad_w)), ...] for grids only reachable by padding.

    Complements `candidate_grids` with edge-padded variants
    (device.tiled_apply_padded): grids whose 32-multiple patch contract the
    raw extent misses but a <= max_pad_frac bottom/right pad unlocks — the
    class that won at 1056x1920 ((4,6)+96-row pad beat the unpadded (3,6)
    by 9.2%, PERF.md round 3). Pad-free grids are excluded (already swept).
    """
    if h % 32 or w % 32:
        raise ValueError(f"frame {h}x{w} must be 32-multiples")
    out = []
    for gh in range(1, max_gh + 1):
        ph = (-h) % (32 * gh)
        if ph > max_pad_frac * h:
            continue
        for gw in range(1, max_gw + 1):
            pw = (-w) % (32 * gw)
            if pw > max_pad_frac * w or not (ph or pw):
                continue
            out.append(((gh, gw), (ph, pw)))
    return out


def _time_runner(fn, params, x, reps: int) -> float:
    import jax.numpy as jnp

    def fence(out):
        return float(jnp.mean(out.astype(jnp.float32)))

    fence(fn(params, x))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(params, x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def sweep(params, h: int, w: int, *, policy=None, boundary: int = 32,
          sf: int = 2, reps: int = 3, batch: int = 1,
          grids: Optional[List[Tuple[int, int]]] = None,
          verbose: bool = False) -> List[dict]:
    """Measure every candidate grid for an (h, w) window on the attached
    device; returns [{grid, sec, mode}, ...] sorted fastest-first.

    (1,1) runs as the untiled full-frame apply (the tiled body would just
    add pad/trim glue around the same program).
    """
    import jax
    import jax.numpy as jnp

    from fisr_tpu.infer.device import make_device_runner
    from fisr_tpu.ops.conv import F32

    from fisr_tpu.infer.device import tiled_apply_padded

    policy = policy or F32
    plans = ([(g, (0, 0)) for g in grids] if grids is not None
             else [(g, (0, 0)) for g in candidate_grids(h, w)]
             + padded_candidates(h, w))
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, h, w, 29),
                           policy.compute_dtype)

    results = []
    for grid, pads in plans:
        if pads != (0, 0):
            mode = "padded"
            fn = jax.jit(lambda p, v, g=grid, pd=pads: tiled_apply_padded(
                p, v, g, pd, boundary, sf, policy))
        else:
            mode = "full" if grid == (1, 1) else "tiled"
            fn = make_device_runner(mode, grid=grid, boundary=boundary, sf=sf,
                                    policy=policy)
        try:
            sec = _time_runner(fn, params, x, reps)
        except Exception as e:  # OOM on big frames at (1,1), etc.
            if verbose:
                print(f"# grid {grid} pad {pads}: failed ({type(e).__name__})")
            continue
        results.append({"grid": list(grid), "pad": list(pads),
                        "sec": round(sec, 5), "mode": mode})
        if verbose:
            print(f"# grid {grid} pad {pads}: {sec * 1e3:8.2f} ms ({mode})")
    results.sort(key=lambda r: r["sec"])
    if not results:
        raise RuntimeError("autotune sweep: every candidate grid failed")
    return results


class TuneCache:
    """Persisted sweep results keyed by device kind + measurement config.

    `best(h, w)` returns the measured winner for this device, or None if
    that frame size was never tuned here (callers fall back to the
    `best_grid` heuristic)."""

    def __init__(self, path: Optional[str] = None,
                 shipped_path: Optional[str] = SHIPPED_CACHE_PATH):
        # default resolved at call time so tests/deploys can repoint it
        path = path or DEFAULT_CACHE_PATH
        self.path = path
        self._data: Dict[str, dict] = {}
        self._local: Dict[str, dict] = {}
        # shipped entries load first; a local tune for the same key wins
        # (tune() persists only local entries — never the shipped ones)
        if shipped_path and os.path.exists(shipped_path):
            with open(shipped_path) as f:
                self._data.update(json.load(f))
        if os.path.exists(path):
            with open(path) as f:
                self._local = json.load(f)
            self._data.update(self._local)

    @staticmethod
    def _device_kind() -> str:
        import jax

        d = jax.devices()[0]
        return getattr(d, "device_kind", d.platform)

    def _key(self, h: int, w: int, dtype: str, boundary: int) -> str:
        return f"{self._device_kind()}|{h}x{w}|{dtype}|b{boundary}"

    def best(self, h: int, w: int, dtype: str = "bfloat16",
             boundary: int = 32) -> Optional[Tuple[int, int]]:
        """Fastest PAD-FREE grid (always divides h, w; plain tiled_apply)."""
        entry = self._data.get(self._key(h, w, dtype, boundary))
        if not entry:
            return None
        for r in entry["results"]:  # sorted fastest-first by sweep()
            if tuple(r.get("pad", (0, 0))) == (0, 0):
                return tuple(r["grid"])
        return None

    def best_plan(self, h: int, w: int, dtype: str = "bfloat16",
                  boundary: int = 32
                  ) -> Optional[Tuple[Tuple[int, int], Tuple[int, int]]]:
        """Fastest (grid, (pad_h, pad_w)) overall — padded entries included
        (consumed by video.resolve_fisr_plan / device.tiled_apply_padded)."""
        entry = self._data.get(self._key(h, w, dtype, boundary))
        if not entry:
            return None
        r = entry["results"][0]
        return tuple(r["grid"]), tuple(r.get("pad", (0, 0)))

    def tune(self, params, h: int, w: int, *, policy=None, boundary: int = 32,
             reps: int = 3, verbose: bool = False
             ) -> Optional[Tuple[int, int]]:
        """Sweep (pad-free + padded candidates), persist, and return the
        winning PAD-FREE grid (tune()'s stable contract: a grid that
        divides h, w), or None when every pad-free candidate failed to run
        (e.g. OOM at large frames) — mirroring `best`, which would also
        return None for this entry. The overall winner — possibly padded —
        is what `best_plan` serves to resolve_fisr_plan either way."""
        from fisr_tpu.ops.conv import F32

        policy = policy or F32
        dtype = np.dtype(policy.compute_dtype).name
        results = sweep(params, h, w, policy=policy, boundary=boundary,
                        reps=reps, verbose=verbose)
        entry = {"results": results, "reps": reps}
        self._data[self._key(h, w, dtype, boundary)] = entry
        self._local[self._key(h, w, dtype, boundary)] = entry
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._local, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)
        padfree = [r for r in results if tuple(r.get("pad", (0, 0))) == (0, 0)]
        return tuple(padfree[0]["grid"]) if padfree else None
