"""Probe: pad video-height 1056 -> 1152 to admit the (4,6) grid.

The video window stage runs FISRnet at 1056x1920, where the 32-multiple
patch invariant (infer/device.best_grid) admits only gh in {1,3}
(1056/32 = 33), so it serves at (3,6) — patch H 352 vs the measured
320-row sweet spot of the bench's (4,6) at 1024 rows (PERF.md round-2
sweep). Hypothesis: padding H 1056 -> 1152 (= 36*32, admits (4,6) and
(6,6)) inside one jitted program and cropping the 2x output back wins
despite 9.1%% more rows, because (3,6)'s 416-row haloed patches tile
worse than (4,6)'s 320-row ones.

All variants are ONE jitted program (pad + tiled_apply + crop), same
process, 5-rep medians of 10 iters, scalar-readback fences (relay rule).
"""

import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.device import tiled_apply
from fisr_tpu.ops.conv import Policy

H, W, C = 1056, 1920, 29
SF = 2
POLICY = Policy(jnp.bfloat16)


def make_padded(grid, pad_h):
    """Pad rows with edge replication, run tiled, crop the 2x output."""
    def run(params, x):
        if pad_h:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, 0), (0, 0)), mode="edge")
        y = tiled_apply(params, x, grid, 32, SF, POLICY)
        return y[:, : H * SF] if pad_h else y
    return jax.jit(run)


def bench(fn, params, x, reps=5, iters=10):
    float(jnp.mean(fn(params, x)))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(params, x)
        float(jnp.mean(y))  # sync: block_until_ready lies over axon
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2]


def main():
    from fisr_tpu.models import fisrnet

    params = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16),
                                    fisrnet.init_params(jax.random.PRNGKey(0)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, C), jnp.bfloat16)

    variants = [
        ("(3,6) @1056 control", (3, 6), 0),
        ("(4,6) @1152 pad96", (4, 6), 96),
        ("(6,6) @1152 pad96", (6, 6), 96),
    ]
    for name, grid, pad in variants:
        dt = bench(make_padded(grid, pad), params, x)
        print(f"{name}: {dt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
