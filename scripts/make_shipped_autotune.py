"""Generate fisr_tpu/infer/autotune_shipped.json: measured tiling plans
for the standard serving geometries, tuned ON the attached device.

Round-4 VERDICT item 7: standard video inputs should start on a measured
plan out of the box instead of the `best_grid` heuristic. The shipped
file is keyed by device kind (TuneCache._key), so entries only ever serve
on matching hardware; a local `python -m fisr_tpu.cli.tune` run for the
same key always wins (TuneCache loads shipped first, local on top).

Geometries are the video pipeline's 32-multiple trims of the standard
frame sizes (infer/video trims H, W down to 32-multiples the same way the
reference fixes its patch grid in /root/reference/main.py:89-92):
  720p  1280x720  -> 704x1280
  1080p 1920x1080 -> 1056x1920
  1440p 2560x1440 -> 1440x2560

Run ALONE on the deployment chip (sweep timings are medians but still
dispute the relay with any concurrent run):

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/make_shipped_autotune.py
"""

import argparse
import json
import os

GEOMETRIES = [(704, 1280), (1056, 1920), (1440, 2560)]
OUT = os.path.join(os.path.dirname(__file__), "..", "fisr_tpu", "infer",
                   "autotune_shipped.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.abspath(OUT))
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--boundary", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fisr_tpu.infer.autotune import TuneCache
    from fisr_tpu.models import fisrnet
    from fisr_tpu.ops.conv import Policy

    policy = Policy(jnp.bfloat16 if args.dtype == "bfloat16"
                    else jnp.float32)
    params = fisrnet.init_params(jax.random.PRNGKey(0))
    if args.dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16), params)

    # tune into a scratch cache (shipped_path=None so we only collect what
    # this run measures), then write the scratch as the shipped file
    scratch = args.out + ".scratch"
    if os.path.exists(scratch):
        os.remove(scratch)
    cache = TuneCache(scratch, shipped_path=None)
    for h, w in GEOMETRIES:
        print(f"# tuning {h}x{w} ({args.dtype}) on "
              f"{TuneCache._device_kind()} ...", flush=True)
        grid = cache.tune(params, h, w, policy=policy,
                          boundary=args.boundary, reps=args.reps,
                          verbose=True)
        plan = cache.best_plan(h, w, args.dtype, args.boundary)
        print(json.dumps({"frame": [h, w], "best_grid": grid and list(grid),
                          "best_plan": {"grid": list(plan[0]),
                                        "pad": list(plan[1])}}), flush=True)

    with open(scratch) as f:
        data = json.load(f)
    with open(args.out, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    os.remove(scratch)
    print(f"# wrote {args.out}: {len(data)} entries")


if __name__ == "__main__":
    main()
