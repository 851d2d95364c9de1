"""Fused video pipeline benchmark (real TPU): pair-cached streaming windows.

Measures steady-state ms/window for a 2K 1056x1920 YUV window -> three 4K
frames. Since round 3 the streaming loop computes each adjacent frame pair
ONCE (make_pair_fn: bidirectional flow + warps) and feeds it to two windows
(make_fisr_window_fn), so a steady-state window costs one pair program +
one window program — the monolithic one-program-per-window form
(make_fused_video_step), which recomputes the shared pair, is also timed
and reported in `detail` for cross-round continuity. Modes: reference
parity (x2-upscaled flow, FISR_for_video semantics) and fast (native-res
flow). New-4K-frames/s counts 2 per window (adjacent windows overlap by
one output frame). Compare to the reference's three TF sessions +
.flo/.mat disk round-trips (main.py:211-217).

Prints ONE JSON line (metric `fisr_video_frames_per_sec`, the parity mode,
median of 3) so the flagship pipeline's trend is tracked across rounds like
the 4K pass — PERF.md records it each round.
"""
import json
import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.video import (make_fisr_window_fn, make_fused_video_step,
                                  make_pair_fn)
from fisr_tpu.models import fisrnet, pwcnet
from fisr_tpu.ops.conv import Policy


def median_time(run, sync, n=8, reps=3):
    sync(run())  # compile + sync (axon-safe scalar readback)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = run()
        sync(out)
        ts.append((time.perf_counter() - t0) / n)
    return sorted(ts)[reps // 2]


def main():
    policy = Policy(jnp.bfloat16)
    cfg = pwcnet.PWCNetConfig()
    fisr_params = fisrnet.init_params(jax.random.PRNGKey(0))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(1), cfg)
    h, w = 1056, 1920
    frames = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, h, w, 3),
                                jnp.float32) * 255.0

    def sync(out):
        float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))

    results = {}
    for name, upscale in (("parity", 2), ("fast", 1)):
        pair_fn = make_pair_fn(cfg, policy, upscale=upscale)
        window_fn = make_fisr_window_fn(policy, fisr_grid="auto")
        # steady state: ONE new pair + one window stage per window (the
        # previous window's second pair is reused as this window's first)
        prev_pair = pair_fn(pwc_params, frames[:, 0], frames[:, 1])
        sync(prev_pair)

        def run_window():
            new_pair = pair_fn(pwc_params, frames[:, 1], frames[:, 2])
            return window_fn(fisr_params, frames, prev_pair, new_pair)

        dt = median_time(run_window, sync)
        results[name] = dt
        print(f"# {name:6s} {dt*1e3:7.1f} ms/window (pair-cached)  "
              f"{2.0/dt:5.2f} new 4K frames/s", flush=True)

    # monolithic single-program window (recomputes the shared pair) — the
    # r2/early-r3 measurement condition, kept for cross-round continuity
    step = make_fused_video_step(cfg, policy, upscale=2, fisr_grid="auto")
    dt_mono = median_time(lambda: step(fisr_params, pwc_params, frames), sync)
    print(f"# parity {dt_mono*1e3:7.1f} ms/window (monolithic)", flush=True)

    dt = results["parity"]
    print(json.dumps({
        "metric": "fisr_video_frames_per_sec",
        "value": round(2.0 / dt, 4),
        "unit": "new 4K output frames/s (pair-cached window, parity mode)",
        # reference video phase: three TF sessions with .flo/.mat disk
        # hand-offs, well over 10 s/window on its hardware -> <0.2 fps;
        # pinned at 0.2 to stay conservative and cross-round comparable
        "vs_baseline": round((2.0 / dt) / 0.2, 3),
        "detail": {
            "window": [h, w], "ms_per_window": round(dt * 1e3, 1),
            "fast_mode_fps": round(2.0 / results["fast"], 3),
            "fast_ms_per_window": round(results["fast"] * 1e3, 1),
            "monolithic_ms_per_window": round(dt_mono * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    main()
