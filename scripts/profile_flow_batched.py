"""A/B probe: bidirectional flow as 2x batch-1 apply_pyramids (current)
vs ONE batch-2 pass over stacked pyramids (+ batched feature extraction).

Composed-program probe at video parity scale (1056x1920 YUV, x2-upscaled
flow -> 2112x3840 PWC extent), per CLAUDE.md rules: one process, 5-rep
medians, scalar-readback sync. The batched form flips the stacked pyramid
along batch to get (c2, c1) without a second estimation pass.
"""
import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.video import _pad_to
from fisr_tpu.models import pwcnet
from fisr_tpu.ops.color import yuv2rgb_matlab
from fisr_tpu.ops.conv import Policy
from fisr_tpu.ops.resize import resize_tf1, upsample2x_bilinear


def median_time(run, n=4, reps=5):
    out = run()
    float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = run()
        float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / n)
    return sorted(ts)[reps // 2]


def flow_seq(params, yuv1, yuv2, cfg, policy):
    rgb = [yuv2rgb_matlab(y) / 255.0 for y in (yuv1, yuv2)]
    h, w = rgb[0].shape[1], rgb[0].shape[2]
    rgb = [upsample2x_bilinear(r) for r in rgb]
    pair0, (hh, ww) = _pad_to(rgb[0], 2**cfg.pyr_lvls)
    pair1, _ = _pad_to(rgb[1], 2**cfg.pyr_lvls)
    c1 = pwcnet.extract_features(params, pair0, cfg, policy)
    c2 = pwcnet.extract_features(params, pair1, cfg, policy)
    fwd, _ = pwcnet.apply_pyramids(params, c1, c2, cfg, policy)
    bwd, _ = pwcnet.apply_pyramids(params, c2, c1, cfg, policy)
    flows = jnp.stack([fwd[:, :hh, :ww], bwd[:, :hh, :ww]], axis=1)
    return resize_tf1(flows, (h, w), "bilinear") / 2.0


def flow_batched(params, yuv1, yuv2, cfg, policy):
    b = yuv1.shape[0]
    rgb = [yuv2rgb_matlab(y) / 255.0 for y in (yuv1, yuv2)]
    h, w = rgb[0].shape[1], rgb[0].shape[2]
    rgb = [upsample2x_bilinear(r) for r in rgb]
    pair0, (hh, ww) = _pad_to(rgb[0], 2**cfg.pyr_lvls)
    pair1, _ = _pad_to(rgb[1], 2**cfg.pyr_lvls)
    both = jnp.concatenate([pair0, pair1], axis=0)  # [2B, H, W, 3]
    c = pwcnet.extract_features(params, both, cfg, policy)
    c_rev = [None] + [jnp.concatenate([t[b:], t[:b]], axis=0)
                      for t in c[1:]]
    flows2, _ = pwcnet.apply_pyramids(params, c, c_rev, cfg, policy)
    fwd, bwd = flows2[:b], flows2[b:]
    flows = jnp.stack([fwd[:, :hh, :ww], bwd[:, :hh, :ww]], axis=1)
    return resize_tf1(flows, (h, w), "bilinear") / 2.0


def main():
    policy = Policy(jnp.bfloat16)
    cfg = pwcnet.PWCNetConfig()
    params = pwcnet.init_params(jax.random.PRNGKey(1), cfg)
    h, w = 1056, 1920
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    yuv1 = jax.random.uniform(k1, (1, h, w, 3), jnp.float32) * 255.0
    yuv2 = jax.random.uniform(k2, (1, h, w, 3), jnp.float32) * 255.0

    seq = jax.jit(lambda p, a, b: flow_seq(p, a, b, cfg, policy))
    bat = jax.jit(lambda p, a, b: flow_batched(p, a, b, cfg, policy))

    # numeric agreement first (same math, different batching)
    fs = seq(params, yuv1, yuv2)
    fb = bat(params, yuv1, yuv2)
    import numpy as np
    d = np.abs(np.asarray(fs, np.float32) - np.asarray(fb, np.float32))
    print(f"max|seq-batched| = {d.max():.3e}  (flow px units)", flush=True)

    t_seq = median_time(lambda: seq(params, yuv1, yuv2))
    print(f"sequential 2x batch-1: {t_seq*1e3:7.1f} ms", flush=True)
    t_bat = median_time(lambda: bat(params, yuv1, yuv2))
    print(f"batched    1x batch-2: {t_bat*1e3:7.1f} ms", flush=True)
    # re-run seq to bracket drift
    t_seq2 = median_time(lambda: seq(params, yuv1, yuv2))
    print(f"sequential (re-run):   {t_seq2*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
