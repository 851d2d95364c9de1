"""Variant matrix for the PWC estimator split (what exactly wins where).

At each extent (level-2 video/4K scale, level-3), with BOTH outputs
consumed the way apply_pyramids does (flow + upfeat -> ctx -> deconv):

  A  composed, full-frame
  B  composed, halo_map-tiled (the round-2 production form at big extents)
  C  split estimator internals, MATERIALIZED upfeat, composed ctx/deconv
  D  fully split (parts end to end)  [the current landed form]

Run on the real TPU.
"""

import time

import jax
import jax.numpy as jnp

from fisr_tpu.models import pwcnet
from fisr_tpu.models.pwcnet import (_conv_parts, _deconv, _deconv_parts,
                                    _estimate, _estimate_split, _refine,
                                    EST_CHANNELS, _leaky)
from fisr_tpu.ops.conv import Policy, conv2d

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


def refine_composed(p, feat, flow, policy):
    x = feat
    for i, (_c, dil) in enumerate(pwcnet.CTX_SPEC):
        x = conv2d(p[f"dc{i+1}"], x, policy, dilation=dil)
        if i < len(pwcnet.CTX_SPEC) - 1:
            x = _leaky(x)
    return flow + x


def downstream_composed(ctx_p, up_p, upfeat, flow, policy):
    f2 = refine_composed(ctx_p, upfeat, flow, policy)
    if up_p is None:  # flow_pred_lvl has no up-sampler
        return (f2,)
    return f2, _deconv(up_p, upfeat, policy)


def make_variants(p2, ctx_p, up_p):
    def a_full(x_parts):
        x = jnp.concatenate(x_parts, -1)
        up, fl = _estimate(p2, x, CFG, POL)
        return downstream_composed(ctx_p, up_p, up, fl, POL)

    def b_tiled(x_parts):
        from fisr_tpu.infer.halo import halo_map

        x = jnp.concatenate(x_parts, -1)
        h, w = x.shape[1], x.shape[2]
        gh = 4 if h % 4 == 0 and h // 4 >= 120 else (2 if h % 2 == 0 and h // 2 >= 120 else 1)
        gw = 4 if w % 4 == 0 and w // 4 >= 224 else (2 if w % 2 == 0 and w // 2 >= 224 else 1)
        if gh * gw == 1:
            up, fl = _estimate(p2, x, CFG, POL)
        else:
            up, fl = halo_map(lambda t: _estimate(p2, t, CFG, POL), x,
                              (gh, gw), 6, (h, w))
        return downstream_composed(ctx_p, up_p, up, fl, POL)

    def c_hybrid(x_parts):
        parts, fl = _estimate_split(p2, x_parts, CFG, POL)
        up = jnp.concatenate(parts, -1)
        return downstream_composed(ctx_p, up_p, up, fl, POL)

    def d_split(x_parts):
        parts, fl = _estimate_split(p2, x_parts, CFG, POL)
        f2 = _refine(ctx_p, parts, fl, CFG, POL)
        if up_p is None:
            return (f2,)
        return f2, _deconv_parts(up_p, parts, POL)

    return [("A composed full ", a_full), ("B composed tiled", b_tiled),
            ("C split+mat up  ", c_hybrid), ("D fully split   ", d_split)]


def main():
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16), pwcnet.init_params(jax.random.PRNGKey(0), CFG))

    for lvl, h, w, tag in ((2, 528, 960, "L2 video-scale"),
                           (2, 544, 960, "L2 4K-scale"),
                           (3, 272, 480, "L3 4K-scale")):
        c1ch = pwcnet.PYR_CHANNELS[lvl]
        sizes = [81, c1ch, 2, 2]
        ks = jax.random.split(jax.random.PRNGKey(lvl), 4)
        x_parts = [jax.random.uniform(k, (1, h, w, s), jnp.bfloat16)
                   for k, s in zip(ks, sizes)]
        p2 = params["flow"][f"level_{lvl}"]
        ctx_p = params["ctx"][f"level_{lvl}"]
        up_p = params["up"].get(f"level_{lvl}", {}).get("feat")
        print(f"== {tag} ({h}x{w}) ==", flush=True)
        for name, fn in make_variants(p2, ctx_p, up_p):
            t = timeit(fn, x_parts)
            print(f"  {name} {t:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
