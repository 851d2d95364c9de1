"""FISR 4K inference benchmark — prints ONE JSON line.

Metric: full 4K FISRnet passes per second. One pass = one 29-channel sliding
window at the reference's effective 2K input size (1024 x 1920 after its
crop-to-32*patch, FISRnet.py:822-823) -> one [2048, 3840, 9] output (two
interpolated 4K frames + one super-resolved 4K frame), i.e. the unit the
reference times as "inference time per output 4K frame" (FISRnet.py:934-935).

vs_baseline: ratio against the TF1/TITAN Xp reference implementation,
estimated at 0.5 passes/s (~2 s per 4K output frame). Basis: one pass is
~6.3 TFLOP of conv work (counted analytically below); a TITAN Xp peaks at
12.1 TFLOP/s fp32 and TF1.13 sustains ~30-35% on 64-ch 3x3 convs, and the
reference additionally rebuilds the graph and round-trips the host per
patch. No published number exists (BASELINE.md), so the estimate is pinned
here to keep vs_baseline comparable across rounds.

Run on the real TPU (axon). bf16 activations / f32 params.
"""

import json
import time

import numpy as np


def conv_flops_per_pass(h: int, w: int, sf: int = 2) -> float:
    """Analytic MAC count of one 3-level FISRnet pass on an (h, w) input."""
    def level(hh, ww, cin):
        px = hh * ww
        macs = 0.0
        # encoder
        for c_in, c in ((cin, 64), (64, 128), (128, 256)):
            macs += (9 * c_in * c + 4 * 9 * c * c) * px
            px /= 4
        # bottleneck
        macs += (9 * 256 * 512 + 2 * 9 * 512 * 512) * px
        # decoder
        for c_in, c in ((512, 256), (256, 128), (128, 64)):
            px *= 4
            macs += (2 * 9 * c_in * c + 4 * 9 * c * c) * px
        # heads (fisr + sr)
        for out_ch in (6, 3):
            macs += (9 * 64 * 64 + 2 * 9 * 64 * 64 + 9 * 64 * 64 * sf * sf) * px
            macs += 9 * 64 * out_ch * (px * sf * sf)
        return macs

    total = level(h // 4, w // 4, 29) + level(h // 2, w // 2, 38) + level(h, w, 38)
    return 2.0 * total  # FLOPs


def main():
    import jax
    import jax.numpy as jnp

    from fisr_tpu.infer.device import make_device_runner
    from fisr_tpu.models import fisrnet
    from fisr_tpu.ops.conv import Policy

    h, w = 1024, 1920  # reference effective 2K input after crop
    baseline_passes_per_sec = 0.5

    # device-resident end to end: in production the frame never leaves HBM
    # between pipeline stages, so the metric excludes host I/O. Weights are
    # pre-cast to the serving dtype (a server casts once at load) and the
    # window arrives bf16 — exactly what the fused video pipeline
    # (infer/video.make_fused_video_step, bf16 policy) hands this stage.
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16),
        fisrnet.init_params(jax.random.PRNGKey(0)))
    inp = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 29), jnp.bfloat16)

    # (4,6) batched tiling beats full-frame on v5e (XLA tiles the 64-ch
    # convs better at smaller spatial extents), halos included; re-swept
    # 2026-08-17 after the stale-halo shrink changed the halo economics
    # ((4,4) 211.0 ms, (4,6) 207.4, (4,8) 222.8 — 5-rep medians)
    mode, grid = "tiled", (4, 6)
    runner = make_device_runner(mode, grid=grid, boundary=32,
                                policy=Policy(jnp.bfloat16))
    out = runner(params, inp)
    float(jnp.mean(out))  # compile + warm up (scalar readback = real sync)

    # median of 3 timing repeats: the axon relay adds +-2-3% run-to-run
    # noise, and the driver records a single bench invocation
    n_iters, reps = 20, 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = runner(params, inp)
        float(jnp.mean(out))  # sync: block_until_ready lies over axon
        times.append((time.perf_counter() - t0) / n_iters)
    dt = sorted(times)[reps // 2]
    assert out.shape == (1, 2 * h, 2 * w, 9)

    passes_per_sec = 1.0 / dt
    tflops = conv_flops_per_pass(h, w) / dt / 1e12
    print(json.dumps({
        "metric": "fisr_4k_passes_per_sec",
        "value": round(passes_per_sec, 4),
        "unit": "4K output-frame passes/s",
        "vs_baseline": round(passes_per_sec / baseline_passes_per_sec, 3),
        "detail": {
            "input": [h, w], "mode": f"{mode} bf16", "grid": list(grid),
            # measurement condition, recorded since round 2: params pre-cast
            # to bf16 at load + bf16 input window (the serving condition —
            # round 1 measured f32 params with in-graph casts, so part of
            # the r1->r2 delta is this condition change, not pipeline speed)
            "dtype_condition": "bf16 params + bf16 input (since r2)",
            "sec_per_pass": round(dt, 4),
            "achieved_tflops": round(tflops, 2),
            # model-FLOPs utilization vs the v5e 197 TFLOP/s bf16 peak —
            # progress measure independent of the estimated TF baseline
            "mfu": round(tflops / 197.0, 4),
        },
    }))


if __name__ == "__main__":
    main()
