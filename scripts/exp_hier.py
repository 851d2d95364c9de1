"""Experiment: per-level tiling choices for the 4K pass.

Levels 1/2 run at 1/4 and 1/2 resolution — small enough that full-frame may
beat tiled (no halo recompute). Level 3 needs tiling (XLA tiles 2K spatial
extents badly); sweep its grid.
"""

import time

import jax
import jax.numpy as jnp

from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import Policy

POL = Policy(jnp.bfloat16)


def timeit(fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.mean(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.mean(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    params = fisrnet.init_params(jax.random.PRNGKey(0))
    H, W = 1024, 1920

    print("== levels 1/2: full-frame vs (4,4)-tiled-with-halo ==", flush=True)
    for lv, scale, cin in (("level_1", 4, 29), ("level_2", 2, 38)):
        h, w = H // scale, W // scale
        xf = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, cin), jnp.float32)
        t_full = timeit(lambda p, v: fisrnet.apply_level(p, v, 2, POL),
                        params[lv], xf)
        ph, pw = h // 4 + 2 * (32 // scale), w // 4 + 2 * (32 // scale)
        xt = jax.random.uniform(jax.random.PRNGKey(2), (16, ph, pw, cin), jnp.float32)
        t_tile = timeit(lambda p, v: fisrnet.apply_level(p, v, 2, POL),
                        params[lv], xt)
        print(f"{lv}: full [1,{h},{w}] {t_full:.1f} ms | tiled(4,4)+halo "
              f"[16,{ph},{pw}] {t_tile:.1f} ms", flush=True)

    print("== level_3 grid sweep (patch batch incl. 32px halo) ==", flush=True)
    for gh, gw in ((4, 4), (2, 4), (4, 2), (2, 8), (8, 2), (8, 4), (4, 8), (2, 2)):
        ph, pw = H // gh + 64, W // gw + 64
        n = gh * gw
        x = jax.random.uniform(jax.random.PRNGKey(3), (n, ph, pw, 38), jnp.float32)
        try:
            t = timeit(lambda p, v: fisrnet.apply_level(p, v, 2, POL),
                       params["level_3"], x, n=5)
        except Exception as e:  # OOM etc.
            print(f"grid ({gh},{gw}): FAILED {type(e).__name__}", flush=True)
            continue
        halo = (ph * pw * n) / (H * W)
        print(f"grid ({gh},{gw}) [{n},{ph},{pw}]: {t:.1f} ms (halo x{halo:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
