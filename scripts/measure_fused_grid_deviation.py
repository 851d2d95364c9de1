"""Quantify the fused video path's tiling deviation: fisr_grid='auto' vs
full-frame (None) on the REAL scene1 frames (round-3 advisor finding: the
CLI's default fused path is 'auto' tiling, whose zero-halo patch seams +
replicated bottom/right pad band deviate from the full-frame program; the
deviation must be measured and recorded in PARITY.md, not silent).

Runs the fused flow->warp->FISRnet window on the reference's 5 real
1080x1920 YUV frames (3 windows) three ways — full-frame, 'auto'
(padded_grid heuristic), and the bench grid — and scores each tiled output
against the full-frame oracle (PSNR/SSIM on the [0,1] prediction, per
window and aggregate, plus max|d| in u8 counts).

Run on the real TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/measure_fused_grid_deviation.py \\
      --fisr_ckpt checkpoint_dir/FISRnet_exp_refsched/best --pwc_ckpt checkpoint_dir/pwcnet_joint
"""

import argparse
import json
import os

import numpy as np

SCENE = "/root/reference/FISR_test_folder/scene1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fisr_ckpt", default=None,
                    help="CheckpointManager dir for FISRnet (fresh init if "
                         "omitted — note PARITY.md: deviation shrinks as "
                         "weights converge, so fresh-init numbers are the "
                         "FLOOR, not the engine's bound)")
    ap.add_argument("--pwc_ckpt", default=None)
    ap.add_argument("--scene", default=SCENE)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fisr_tpu.data.png_io import list_pngs, read_png
    from fisr_tpu.infer.video import make_fused_video_step
    from fisr_tpu.models import fisrnet, pwcnet
    from fisr_tpu.ops.conv import Policy
    from fisr_tpu.ops.metrics import psnr_np, ssim_pil_like
    from fisr_tpu.train.checkpoint import CheckpointManager

    policy = Policy(jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)

    def load(dir_, init_fn, seed):
        if dir_:
            tree = CheckpointManager(dir_).restore()
            p = tree["params"] if isinstance(tree, dict) and "params" in tree else tree
            print(f"# restored {dir_}")
        else:
            p = init_fn(jax.random.PRNGKey(seed))
            print("# fresh init")
        if args.dtype == "bfloat16":
            p = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), p)
        return p

    fisr_params = load(args.fisr_ckpt, fisrnet.init_params, 0)
    pwc_params = load(args.pwc_ckpt, pwcnet.init_params, 1)

    paths = list_pngs(args.scene)[:5]
    frames = np.stack([read_png(p) for p in paths]).astype(np.float32)
    h = frames.shape[1] - frames.shape[1] % 32
    w = frames.shape[2] - frames.shape[2] % 32
    frames = frames[:, :h, :w]
    print(f"# {len(paths)} frames, {h}x{w}")

    grids = {"full": None, "auto": "auto", "bench_4x6": (4, 6)}
    # (4,6) needs 32*4 | h: 1056 % 128 != 0 -> drop explicit grids that
    # don't divide (tiled_apply would raise)
    if h % (32 * 4) or w % (32 * 6):
        grids.pop("bench_4x6")

    outs = {}
    for name, g in grids.items():
        step = make_fused_video_step(policy=policy, fisr_grid=g)
        preds = []
        for k in range(len(paths) - 2):
            win = jnp.asarray(frames[None, k:k + 3])
            preds.append(np.asarray(step(fisr_params, pwc_params, win)[0],
                                    np.float32))
        outs[name] = np.stack(preds)
        print(f"# {name}: {outs[name].shape}")

    rec = {"scene": args.scene, "frame": [h, w], "dtype": args.dtype,
           "weights": {"fisr": args.fisr_ckpt or "fresh-init",
                       "pwc": args.pwc_ckpt or "fresh-init"},
           "vs_full": {}}
    ref = outs.pop("full")
    for name, got in outs.items():
        per = []
        for k in range(ref.shape[0]):
            per.append({
                "psnr": round(float(psnr_np(got[k], ref[k])), 3),
                "ssim": round(float(np.mean([
                    ssim_pil_like(got[k][..., 3 * s : 3 * s + 3],
                                  ref[k][..., 3 * s : 3 * s + 3])
                    for s in range(3)])), 5),
                "max_abs_u8": round(float(np.abs(got[k] - ref[k]).max() * 255),
                                    3),
            })
        rec["vs_full"][name] = {
            "per_window": per,
            "psnr_mean": round(float(np.mean([p["psnr"] for p in per])), 3),
            "ssim_mean": round(float(np.mean([p["ssim"] for p in per])), 5),
        }
    line = json.dumps(rec)
    print(line)
    if args.out_json:
        with open(args.out_json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
