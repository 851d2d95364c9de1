"""FISRnet training-step throughput on the real chip — prints ONE JSON line.

Metric: training samples/s (one sample = one 5-frame 96x96 corpus entry;
each step folds 4 weight-shared window rows per sample into one [4B] apply —
train/trainer.py). Sweeps batch size and reports the best, plus analytic
train MFU (fwd conv FLOPs x3 for fwd+bwd, bench.py's per-level count).

The batch stays device-resident (donated state, reused batch): the axon
relay moves ~40 MB/s host<->device, so per-step uploads would measure the
tunnel, not the trainer. The real input pipeline is prefetch_to_device
(train/loop.py) and is benchmarked by its own test.

Reference analog: the TF1 trainer prints sec/step on a TITAN Xp
(FISRnet.py:663-712, batch 8); no published number exists, so no
vs_baseline is claimed — this line tracks round-over-round trend only.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from bench import conv_flops_per_pass
    from fisr_tpu.ops.conv import Policy
    from fisr_tpu.train import schedule
    from fisr_tpu.train.trainer import (adam_with_schedule, create_state,
                                        make_train_step)

    h = w = 96
    policy = Policy(jnp.bfloat16)
    opt = adam_with_schedule(schedule.stair_decay(1e-4, [50_000], 0.1))
    step = make_train_step(opt, policy=policy, donate=True)

    rng = np.random.default_rng(0)

    def make_batch(b):
        def t(c):
            return jnp.asarray(rng.uniform(size=(b, h, w, c)), jnp.float32)
        return {"data": t(15), "flow": t(16), "warp": t(24),
                "flow_ss2": t(8), "warp_ss2": t(12),
                "label": jnp.asarray(rng.uniform(size=(b, 2 * h, 2 * w, 21)),
                                     jnp.float32)}

    fwd_flops_per_sample = 4 * conv_flops_per_pass(h, w)  # 4 window rows
    train_flops_per_sample = 3 * fwd_flops_per_sample     # fwd + bwd ~ 3x

    results = {}
    for b in (8, 16, 32, 64):
        state = create_state(jax.random.PRNGKey(0), opt)
        batch = make_batch(b)
        state, logs = step(state, batch)            # compile + warm
        float(logs["total_loss"])                    # relay fence
        reps = max(2, 64 // b)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                state, logs = step(state, batch)
            float(logs["total_loss"])                # scalar readback fence
            ts.append((time.perf_counter() - t0) / reps)
        sec = float(np.median(ts))
        results[b] = b / sec
        print(f"# batch {b:3d}: {sec*1e3:7.1f} ms/step  {b/sec:7.1f} samples/s",
              file=sys.stderr)

    best_b = max(results, key=results.get)
    sps = results[best_b]
    tflops = sps * train_flops_per_sample / 1e12
    mfu = tflops / 197.0  # v5e bf16 peak
    print(json.dumps({
        "metric": "fisr_train_samples_per_sec",
        "value": round(sps, 2),
        "unit": "96x96 corpus samples/s (4 window rows each)",
        "detail": {"best_batch": best_b, "policy": "bf16",
                   "achieved_train_tflops": round(tflops, 2),
                   "mfu": round(mfu, 4),
                   "per_batch": {str(k): round(v, 2)
                                 for k, v in sorted(results.items())}},
    }))


if __name__ == "__main__":
    main()
