"""Stage split of the pair-cached video window: pair_fn vs window_fn vs
warp-only, one TPU process, 5-rep medians (CLAUDE.md measurement rules).

Steady-state window = 1 pair program + 1 window program; bench_video reads
their sum. This probe attributes the ms between them (and inside pair_fn,
between the bidirectional flow and the +0.5-flow warps) so optimization
effort lands on the real bottleneck.
"""
import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.video import (_flow_core, _warp_core, make_fisr_window_fn,
                                  make_pair_fn)
from fisr_tpu.models import fisrnet, pwcnet
from fisr_tpu.ops.conv import Policy


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

    pair_fn = make_pair_fn(cfg, policy, upscale=2)
    window_fn = make_fisr_window_fn(policy, fisr_grid="auto")
    flow_fn = jax.jit(lambda p, a, b: _flow_core(p, a, b, cfg, policy, 2))
    warp_fn = jax.jit(_warp_core)

    f0, f1, f2 = frames[:, 0], frames[:, 1], frames[:, 2]
    prev_pair = pair_fn(pwc_params, f0, f1)
    sync(prev_pair)
    flows = flow_fn(pwc_params, f1, f2)
    sync(flows)

    t_pair = median_time(lambda: pair_fn(pwc_params, f1, f2), sync)
    t_flow = median_time(lambda: flow_fn(pwc_params, f1, f2), sync)
    t_warp = median_time(lambda: warp_fn(f1, f2, flows), sync)
    new_pair = pair_fn(pwc_params, f1, f2)
    t_win = median_time(
        lambda: window_fn(fisr_params, frames, prev_pair, new_pair), sync)

    print(f"pair_fn  {t_pair*1e3:7.1f} ms   (flow {t_flow*1e3:.1f} + "
          f"warp {t_warp*1e3:.1f} standalone)")
    print(f"window   {t_win*1e3:7.1f} ms")
    print(f"sum      {(t_pair+t_win)*1e3:7.1f} ms  (bench_video parity read "
          "553.7)")


if __name__ == "__main__":
    main()
