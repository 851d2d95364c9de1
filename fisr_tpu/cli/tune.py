"""One-shot device autotune: measure the best FISRnet tiling grid here.

Usage (on the deployment chip):

    python -m fisr_tpu.cli.tune --height 1024 --width 1920 --dtype bfloat16

Sweeps every 32-multiple-preserving grid for that window size ON the
attached device (medians, scalar-readback fences), persists the table to
the tune cache (~/.cache/fisr_tpu/autotune.json by default), and prints
the winner. Serving paths pick the measurement up via fisr_grid="tuned"
(infer/video) or TuneCache().best(h, w).

Replaces the reference's hand-set `--test_patch` flag (main.py:89) with a
measured, device-keyed value.
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--height", type=int, required=True,
                   help="input window height (32-multiple, e.g. 1024)")
    p.add_argument("--width", type=int, required=True,
                   help="input window width (32-multiple, e.g. 1920)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--boundary", type=int, default=32)
    p.add_argument("--reps", type=int, default=3,
                   help="timed passes per candidate (median)")
    p.add_argument("--cache", default=None,
                   help="tune-cache path (default ~/.cache/fisr_tpu/)")
    p.add_argument("--max_gh", type=int, default=6)
    p.add_argument("--max_gw", type=int, default=8)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fisr_tpu.infer.autotune import DEFAULT_CACHE_PATH, TuneCache
    from fisr_tpu.models import fisrnet
    from fisr_tpu.ops.conv import Policy

    policy = Policy(jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    params = fisrnet.init_params(jax.random.PRNGKey(0))
    if args.dtype == "bfloat16":
        # serving casts once at load (bench.py does the same)
        params = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16), params)

    cache = TuneCache(args.cache or DEFAULT_CACHE_PATH)
    grid = cache.tune(params, args.height, args.width, policy=policy,
                      boundary=args.boundary, reps=args.reps, verbose=True)
    plan = cache.best_plan(args.height, args.width, args.dtype,
                           args.boundary)
    print(json.dumps({
        # None when every pad-free candidate failed (OOM at large frames):
        # the frame is only servable via best_plan's padded winner then
        "best_grid": list(grid) if grid is not None else None,
        # overall winner incl. edge-padded variants (what fisr_grid='tuned'
        # serves via video.resolve_fisr_plan); equals best_grid + pad 0
        # when no padded candidate won
        "best_plan": {"grid": list(plan[0]), "pad": list(plan[1])},
        "frame": [args.height, args.width],
        "dtype": args.dtype,
        "device_kind": TuneCache._device_kind(),
        "cache": cache.path,
    }))


if __name__ == "__main__":
    main()
