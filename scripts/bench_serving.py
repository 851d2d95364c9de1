"""Multi-chip serving benchmark: steady-state windows/s, any mesh size.

Round-4 VERDICT item 4: a runnable measurement artifact so the first round
with real multi-chip hardware MEASURES frame-parallel and pair-cached
streaming throughput instead of extrapolating. Points at whatever devices
exist (`jax.devices()`): on the 1-chip axon relay it measures 1-chip
steady state; on a real v5e-8 the same command measures the 8-chip claims
in PERF.md (frame-parallel ~linear, pair-cached ~1.6x/chip at 2K).

Modes (both device-resident; frames synthesized on device, outputs fenced
by scalar readback — the relay's block_until_ready returns early):
  * frame_parallel — independent fused flow->warp->FISRnet windows, one
    (or --per_chip) per chip per round (infer/serving.
    make_frame_parallel_video_step): zero inter-chip traffic, each chip
    computes BOTH of its window's frame pairs.
  * stream — pair-cached consecutive-window streaming
    (make_frame_parallel_stream_step): each chip computes ONE new pair,
    receives the shared pair over ICI (ppermute), carry threaded between
    rounds exactly like production serving (infer/daemon.py).

Prints ONE JSON line:
  {"metric": "fisr_serving_windows_per_sec", "value": <stream mode>, ...,
   "detail": {"frame_parallel": {...}, "stream": {...}, ...}}

Run on hardware:   python scripts/bench_serving.py
Virtual-mesh check (shape/semantics only, timings meaningless):
  tests/test_serving_bench.py runs measure() on the 8-CPU mesh.
"""

import argparse
import json
import time


def measure(height=1056, width=1920, per_chip=1, rounds=5, warmup=2,
            mesh=None, fisr_grid="auto", dtype="bfloat16", flow_scale=2):
    """Returns the benchmark record (dict). Pure function of the attached
    devices; import-safe for the virtual-mesh test."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fisr_tpu.core.mesh import make_mesh
    from fisr_tpu.infer.serving import (make_frame_parallel_stream_step,
                                        make_frame_parallel_video_step)
    from fisr_tpu.infer.video import make_pair_fn
    from fisr_tpu.models import fisrnet, pwcnet
    from fisr_tpu.ops.conv import Policy

    policy = Policy(jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    if mesh is None:
        mesh = make_mesh((len(jax.devices()), 1))
    ndev = mesh.shape["data"]
    n = ndev * per_chip

    fisr_params = fisrnet.init_params(jax.random.PRNGKey(0))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(1))
    if dtype == "bfloat16":
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), t)
        fisr_params, pwc_params = cast(fisr_params), cast(pwc_params)

    # device-resident input: n consecutive windows from an n+2-frame scene
    seq = jax.random.uniform(jax.random.PRNGKey(2), (n + 2, height, width, 3),
                             jnp.float32, 0.0, 255.0)
    windows = jnp.stack([seq[k:k + 3] for k in range(n)])

    def fence(x):
        return float(jnp.mean(x[..., ::64, ::64, 0].astype(jnp.float32)))

    def time_rounds(run, state=None):
        # warmup (compile) then median of timed rounds, carry threaded
        for _ in range(warmup):
            out, state = run(state)
        fence(out)
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            out, state = run(state)
            fence(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    results = {}

    fp_step = make_frame_parallel_video_step(
        mesh, policy=policy, fisr_grid=fisr_grid, upscale=flow_scale)

    def fp_run(_state):
        return fp_step(fisr_params, pwc_params, windows), None

    sec = time_rounds(fp_run)
    results["frame_parallel"] = {
        "sec_per_round": round(sec, 4),
        "windows_per_sec": round(n / sec, 3),
    }

    st_step = make_frame_parallel_stream_step(
        mesh, policy=policy, fisr_grid=fisr_grid, upscale=flow_scale)
    pair_fn = make_pair_fn(policy=policy, upscale=flow_scale)
    carry0 = pair_fn(pwc_params, seq[None, 0], seq[None, 1])

    def st_run(state):
        carry = state if state is not None else carry0
        pred, carry = st_step(fisr_params, pwc_params, windows, carry)
        return pred, carry

    sec = time_rounds(st_run)
    results["stream"] = {
        "sec_per_round": round(sec, 4),
        "windows_per_sec": round(n / sec, 3),
    }

    d = jax.devices()[0]
    return {
        "metric": "fisr_serving_windows_per_sec",
        "value": results["stream"]["windows_per_sec"],
        "unit": f"{height}x{width} windows/s (x2 VFI + x2 SR, steady-state)",
        "detail": {
            **results,
            "n_devices": ndev,
            "per_chip": per_chip,
            "geometry": [height, width],
            "dtype": dtype,
            "flow_scale": flow_scale,
            "fisr_grid": str(fisr_grid),
            "device_kind": getattr(d, "device_kind", d.platform),
        },
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--height", type=int, default=1056)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--per_chip", type=int, default=1)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--fisr_grid", default="auto")
    ap.add_argument("--flow_scale", type=int, default=2, choices=(1, 2))
    args = ap.parse_args()

    from fisr_tpu.cli._common import parse_grid

    rec = measure(args.height, args.width, args.per_chip, args.rounds,
                  fisr_grid=parse_grid(args.fisr_grid), dtype=args.dtype,
                  flow_scale=args.flow_scale)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
