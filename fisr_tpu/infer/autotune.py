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

__all__ = ["candidate_grids", "sweep", "TuneCache", "DEFAULT_CACHE_PATH"]

DEFAULT_CACHE_PATH = os.path.join(
    os.path.expanduser("~"), ".cache", "fisr_tpu", "autotune.json")


def candidate_grids(h: int, w: int, max_gh: int = 6, max_gw: int = 8
                    ) -> List[Tuple[int, int]]:
    """All grids whose patches stay 32-multiples (the /4 pyramid + halo
    contract `best_grid` enforces), including the untiled (1,1)."""
    if h % 32 or w % 32:
        raise ValueError(f"frame {h}x{w} must be 32-multiples")
    ghs = [g for g in range(1, max_gh + 1) if h % (32 * g) == 0]
    gws = [g for g in range(1, max_gw + 1) if w % (32 * g) == 0]
    return [(gh, gw) for gh in ghs for gw in gws]


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

    policy = policy or F32
    grids = grids or candidate_grids(h, w)
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, h, w, 29),
                           policy.compute_dtype)

    results = []
    for grid in grids:
        mode = "full" if grid == (1, 1) else "tiled"
        fn = make_device_runner(mode, grid=grid, boundary=boundary, sf=sf,
                                policy=policy)
        try:
            sec = _time_runner(fn, params, x, reps)
        except Exception as e:  # OOM on big frames at (1,1), etc.
            if verbose:
                print(f"# grid {grid}: failed ({type(e).__name__})")
            continue
        results.append({"grid": list(grid), "sec": round(sec, 5), "mode": mode})
        if verbose:
            print(f"# grid {grid}: {sec * 1e3:8.2f} ms ({mode})")
    results.sort(key=lambda r: r["sec"])
    if not results:
        raise RuntimeError("autotune sweep: every candidate grid failed")
    return results


class TuneCache:
    """Persisted sweep results keyed by device kind + measurement config.

    `best(h, w)` returns the measured winner for this device, or None if
    that frame size was never tuned here (callers fall back to the
    `best_grid` heuristic)."""

    def __init__(self, path: Optional[str] = None):
        # default resolved at call time so tests/deploys can repoint it
        path = path or DEFAULT_CACHE_PATH
        self.path = path
        self._data: Dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                self._data = json.load(f)

    @staticmethod
    def _device_kind() -> str:
        import jax

        d = jax.devices()[0]
        return getattr(d, "device_kind", d.platform)

    def _key(self, h: int, w: int, dtype: str, boundary: int) -> str:
        return f"{self._device_kind()}|{h}x{w}|{dtype}|b{boundary}"

    def best(self, h: int, w: int, dtype: str = "bfloat16",
             boundary: int = 32) -> Optional[Tuple[int, int]]:
        entry = self._data.get(self._key(h, w, dtype, boundary))
        if not entry:
            return None
        return tuple(entry["results"][0]["grid"])

    def tune(self, params, h: int, w: int, *, policy=None, boundary: int = 32,
             reps: int = 3, verbose: bool = False) -> Tuple[int, int]:
        """Sweep, persist, and return the winning grid."""
        from fisr_tpu.ops.conv import F32

        policy = policy or F32
        dtype = np.dtype(policy.compute_dtype).name
        results = sweep(params, h, w, policy=policy, boundary=boundary,
                        reps=reps, verbose=verbose)
        self._data[self._key(h, w, dtype, boundary)] = {
            "results": results,
            "reps": reps,
        }
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)
        return tuple(results[0]["grid"])
