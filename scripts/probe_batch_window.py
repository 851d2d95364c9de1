"""Probe: does batching 4K windows raise per-window serving throughput?

Question (round 4): bench.py's unit is ONE 29-ch window (B=1). A throughput
server could run B windows per dispatch; if t(B) < B * t(1), per-window
throughput improves (glue amortization, better sublane fill on the coarse
levels). If t(B) >= B * t(1) this is another measured negative — same class
as the round-3 "batch-4B monolithic flow" which LOST to per-pair dispatch
at large extents (PERF.md), so the expectation is low.

Method per repo rules: ONE process, warmup per config, 5-rep medians,
scalar-readback fences (relay's block_until_ready lies).
"""

import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.device import make_device_runner
from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import Policy


def timed(runner, params, inp, n_iters=10, reps=5):
    out = runner(params, inp)
    float(jnp.mean(out))  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = runner(params, inp)
        float(jnp.mean(out))
        times.append((time.perf_counter() - t0) / n_iters)
    return sorted(times)[len(times) // 2]


def main():
    h, w = 1024, 1920
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16),
        fisrnet.init_params(jax.random.PRNGKey(0)))
    runner = make_device_runner("tiled", grid=(4, 6), boundary=32,
                                policy=Policy(jnp.bfloat16))
    base = None
    for b in (1, 2, 4):
        inp = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 29),
                                 jnp.bfloat16)
        try:
            dt = timed(runner, params, inp)
        except Exception as e:  # OOM at larger B is a result, not a crash
            print(f"B={b}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            continue
        tput = b / dt
        if b == 1:
            base = tput
        print(f"B={b}: {dt*1e3:8.1f} ms/dispatch  {dt/b*1e3:7.1f} ms/window  "
              f"{tput:6.3f} windows/s  ({tput/base:+.1%} vs B=1)"
              if base else f"B={b}: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
