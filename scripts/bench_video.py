"""Fused video pipeline benchmark (real TPU): one XLA program per window.

Measures ms/window for a 2K 1056x1920 YUV window -> three 4K frames, in the
reference-parity mode (x2-upscaled flow, FISR_for_video semantics) and the
fast mode (native-res flow). New-4K-frames/s counts 2 per window (adjacent
windows overlap by one output frame). Compare to the reference's three
TF sessions + .flo/.mat disk round-trips (main.py:211-217).

Prints ONE JSON line (metric `fisr_video_frames_per_sec`, the parity mode,
median of 3) so the flagship pipeline's trend is tracked across rounds like
the 4K pass — PERF.md records it each round. The fast-mode number rides in
`detail`.
"""
import json
import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.video import make_fused_video_step
from fisr_tpu.models import fisrnet, pwcnet
from fisr_tpu.ops.conv import Policy


def measure(step, fisr_params, pwc_params, frames, n=8, reps=3):
    out = step(fisr_params, pwc_params, frames)
    float(jnp.mean(out))  # compile + sync (axon-safe scalar readback)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(fisr_params, pwc_params, frames)
        float(jnp.mean(out))
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

    results = {}
    for name, upscale in (("parity", 2), ("fast", 1)):
        step = make_fused_video_step(cfg, policy, upscale=upscale,
                                     fisr_grid="auto")
        dt = measure(step, fisr_params, pwc_params, frames)
        results[name] = dt
        print(f"# {name:6s} {dt*1e3:7.1f} ms/window  "
              f"{2.0/dt:5.2f} new 4K frames/s", flush=True)

    dt = results["parity"]
    print(json.dumps({
        "metric": "fisr_video_frames_per_sec",
        "value": round(2.0 / dt, 4),
        "unit": "new 4K output frames/s (fused window, parity mode)",
        # reference video phase: three TF sessions with .flo/.mat disk
        # hand-offs, well over 10 s/window on its hardware -> <0.2 fps;
        # pinned at 0.2 to stay conservative and cross-round comparable
        "vs_baseline": round((2.0 / dt) / 0.2, 3),
        "detail": {
            "window": [h, w], "ms_per_window": round(dt * 1e3, 1),
            "fast_mode_fps": round(2.0 / results["fast"], 3),
            "fast_ms_per_window": round(results["fast"] * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    main()
