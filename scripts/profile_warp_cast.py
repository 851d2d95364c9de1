"""A/B probes at video parity scale (one TPU process, 5-rep medians):

1. window_fn with f32 params (production today) vs params pre-cast to bf16
   once outside the program — Policy(bf16) casts weights in-graph per call,
   so pre-casting halves weight HBM traffic (the bench.py measurement
   condition since round 2; the video pipeline still feeds f32).
2. _warp_core (two sequential dense_image_warp gathers) vs both directions
   stacked into ONE batched gather + one batched color conversion.
"""
import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.video import _warp_core, make_fisr_window_fn, make_pair_fn
from fisr_tpu.models import fisrnet, pwcnet
from fisr_tpu.ops.color import rgb2yuv_matlab, yuv2rgb_matlab
from fisr_tpu.ops.conv import Policy
from fisr_tpu.ops.warp import dense_image_warp


def median_time(run, sync, n=4, reps=5):
    sync(run())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = run()
        sync(out)
        ts.append((time.perf_counter() - t0) / n)
    return sorted(ts)[reps // 2]


def _warp_core_batched(yuv1, yuv2, flows):
    b = yuv1.shape[0]
    rgb = yuv2rgb_matlab(jnp.concatenate([yuv2, yuv1], axis=0))
    fl = jnp.concatenate([flows[:, 0], flows[:, 1]], axis=0) * 0.5
    mid = rgb2yuv_matlab(dense_image_warp(rgb, fl))
    return jnp.stack([mid[:b], mid[b:]], axis=1)


def main():
    policy = Policy(jnp.bfloat16)
    cfg = pwcnet.PWCNetConfig()
    fisr_params = fisrnet.init_params(jax.random.PRNGKey(0))
    fisr_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), fisr_params)
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(1), cfg)
    h, w = 1056, 1920
    frames = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, h, w, 3),
                                jnp.float32) * 255.0

    def sync(out):
        float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))

    pair_fn = make_pair_fn(cfg, policy, upscale=2)
    window_fn = make_fisr_window_fn(policy, fisr_grid="auto")
    prev_pair = pair_fn(pwc_params, frames[:, 0], frames[:, 1])
    new_pair = pair_fn(pwc_params, frames[:, 1], frames[:, 2])
    sync(new_pair)

    t_f32 = median_time(
        lambda: window_fn(fisr_params, frames, prev_pair, new_pair), sync)
    t_bf16 = median_time(
        lambda: window_fn(fisr_bf16, frames, prev_pair, new_pair), sync)
    print(f"window f32-params  {t_f32*1e3:7.1f} ms")
    print(f"window bf16-params {t_bf16*1e3:7.1f} ms")

    f1, f2 = frames[:, 1], frames[:, 2]
    flows = new_pair[0]
    w_seq = jax.jit(_warp_core)
    w_bat = jax.jit(_warp_core_batched)
    import numpy as np
    a = np.asarray(w_seq(f1, f2, flows), np.float32)
    bns = np.asarray(w_bat(f1, f2, flows), np.float32)
    print(f"warp batched max|d| {np.abs(a - bns).max():.2e}")
    t_seq = median_time(lambda: w_seq(f1, f2, flows), sync)
    t_bat = median_time(lambda: w_bat(f1, f2, flows), sync)
    print(f"warp sequential    {t_seq*1e3:7.1f} ms")
    print(f"warp batched       {t_bat*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
