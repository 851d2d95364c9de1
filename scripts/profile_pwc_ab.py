"""One-process A/B: composed(+tiled-estimator) vs split PWC apply.

The split rewrite measured faster at every stage geometry, but the full
4K-scale apply read 200 ms vs round-2's 191 — cross-process numbers.
This settles it in one process (relay drift is +-2-3% run to run).
"""

import time

import jax
import jax.numpy as jnp

from fisr_tpu.models import pwcnet
from fisr_tpu.models.pwcnet import (CTX_SPEC, EST_CHANNELS, _deconv,
                                    _estimate, _leaky)
from fisr_tpu.ops.conv import Policy, conv2d
from fisr_tpu.ops.resize import resize_tf1
from fisr_tpu.ops.warp import dense_image_warp

POL = Policy(jnp.bfloat16)
CFG = pwcnet.PWCNetConfig()


def timeit(f, *args, n=10, reps=5, warm=2):
    fn = jax.jit(f)
    for _ in range(warm):
        out = fn(*args)
    float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / n * 1e3)
    return sorted(ts)[reps // 2]


# ---- round-2 composed form, reconstructed (incl. tiled estimator) ----------

def _estimator_grid(h, w):
    if h * w < 500_000:
        return None

    def pick(n, lo):
        for g in (4, 3, 2):
            if n % g == 0 and n // g >= lo:
                return g
        return 1
    gh, gw = pick(h, 120), pick(w, 224)
    return None if gh * gw == 1 else (gh, gw)


def _estimate_tiled(p, x):
    grid = _estimator_grid(x.shape[1], x.shape[2])
    if grid is None:
        return _estimate(p, x, CFG, POL)
    from fisr_tpu.infer.halo import halo_map

    return halo_map(lambda t: _estimate(p, t, CFG, POL), x, grid, 6,
                    (x.shape[1], x.shape[2]))


def _refine_composed(p, feat, flow):
    x = feat
    for i, (_c, dil) in enumerate(CTX_SPEC):
        x = conv2d(p[f"dc{i+1}"], x, POL, dilation=dil)
        if i < len(CTX_SPEC) - 1:
            x = _leaky(x)
    return flow + x


def apply_pyramids_composed(params, c1, c2):
    cv = CFG.cost_volume_fn()
    up_flow = up_feat = None
    flow_pred = None
    for lvl in range(CFG.pyr_lvls, CFG.flow_pred_lvl - 1, -1):
        if lvl == CFG.pyr_lvls:
            x = _leaky(cv(c1[lvl], c2[lvl]))
        else:
            scaler = jnp.asarray(20.0 / 2**lvl, POL.compute_dtype)
            warped = dense_image_warp(c2[lvl], up_flow * scaler)
            corr = _leaky(cv(c1[lvl], warped))
            x = jnp.concatenate([corr, c1[lvl], up_flow, up_feat], axis=-1)
        upfeat, flow = _estimate_tiled(params["flow"][f"level_{lvl}"], x)
        if lvl != CFG.flow_pred_lvl:
            flow = _refine_composed(params["ctx"][f"level_{lvl}"], upfeat, flow)
            up_flow = _deconv(params["up"][f"level_{lvl}"]["flow"], flow, POL)
            up_feat = _deconv(params["up"][f"level_{lvl}"]["feat"], upfeat, POL)
        else:
            flow = _refine_composed(params["ctx"][f"level_{lvl}"], upfeat, flow)
            s = 2**CFG.flow_pred_lvl
            h, w = flow.shape[1] * s, flow.shape[2] * s
            flow_pred = resize_tf1(flow.astype(jnp.float32), (h, w), "bilinear") * s
    return flow_pred


def main():
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16), pwcnet.init_params(jax.random.PRNGKey(0), CFG))
    for h, w, tag in ((1088, 1920, "video-scale"), (2176, 3840, "4K-scale")):
        a = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3), jnp.bfloat16)
        b = jax.random.uniform(jax.random.PRNGKey(2), (1, h, w, 3), jnp.bfloat16)

        def composed(p, x, y):
            return apply_pyramids_composed(
                p, pwcnet.extract_features(p, x, CFG, POL),
                pwcnet.extract_features(p, y, CFG, POL))

        t_old = timeit(composed, params, a, b)
        t_new = timeit(lambda p, x, y: pwcnet.apply(p, x, y, CFG, POL)[0],
                       params, a, b)
        print(f"{tag} ({h}x{w}): composed+tiled {t_old:.1f} ms  "
              f"split {t_new:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
