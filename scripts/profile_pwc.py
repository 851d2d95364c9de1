"""Per-stage timing of PWC-Net apply at the x2-upscaled video scale.

The fused video window (1056x1920) runs 4 PWC directions on 2112x3840
inputs; this breaks one direction into feature pyramid / per-level
cost-volume+estimator+context blocks to find where the ~250 ms goes.
"""
import time
import functools

import jax
import jax.numpy as jnp

from fisr_tpu.models import pwcnet
from fisr_tpu.ops.conv import Policy
from fisr_tpu.ops.warp import dense_image_warp

P = Policy(jnp.bfloat16)
CFG = pwcnet.PWCNetConfig()


def t(f, *a, n=10):
    g = jax.jit(f)
    r = g(*a)
    float(jnp.mean(jax.tree_util.tree_leaves(r)[-1]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(*a)
    float(jnp.mean(jax.tree_util.tree_leaves(r)[-1]))
    return round((time.perf_counter() - t0) / n * 1e3, 2)


def main():
    params = pwcnet.init_params(jax.random.PRNGKey(0), CFG)
    H, W = 2112, 3840
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), jnp.float32)

    print("extract_features (1 img):",
          t(lambda p, x: pwcnet.extract_features(p, x, CFG, P), params, img),
          "ms", flush=True)

    cv = CFG.cost_volume_fn()
    for lvl in (2, 3, 4):
        hh, ww = H // 2**lvl, W // 2**lvl
        c = pwcnet.PYR_CHANNELS[lvl]
        c1 = jax.random.uniform(jax.random.PRNGKey(2), (1, hh, ww, c), jnp.bfloat16)
        c2 = jax.random.uniform(jax.random.PRNGKey(3), (1, hh, ww, c), jnp.bfloat16)
        fl = jax.random.uniform(jax.random.PRNGKey(4), (1, hh, ww, 2), jnp.bfloat16)
        uf = jax.random.uniform(jax.random.PRNGKey(5), (1, hh, ww, 2), jnp.bfloat16)

        print(f"L{lvl} [{hh}x{ww}x{c}]:", flush=True)
        print("  warp       :", t(dense_image_warp, c2, fl), "ms", flush=True)
        print("  cost volume:", t(lambda a, b: cv(a, b), c1, c2), "ms", flush=True)

        od = pwcnet._estimator_channels(CFG, lvl)
        x = jax.random.uniform(jax.random.PRNGKey(6), (1, hh, ww, od), jnp.bfloat16)
        est = functools.partial(
            lambda p, xx: pwcnet._estimate(p["flow"][f"level_{lvl}"], xx, CFG, P),
            params)
        print("  estimator  :", t(est, x), "ms", flush=True)

        if f"level_{lvl}" in params["ctx"]:
            cx_in = pwcnet._upfeat_channels(CFG, lvl)
            feat = jax.random.uniform(jax.random.PRNGKey(7), (1, hh, ww, cx_in),
                                      jnp.bfloat16)
            ref = functools.partial(
                lambda p, ff, fl2: pwcnet._refine(p["ctx"][f"level_{lvl}"], ff,
                                                  fl2, CFG, P), params)
            print("  context    :", t(ref, feat, fl), "ms", flush=True)


if __name__ == "__main__":
    main()
