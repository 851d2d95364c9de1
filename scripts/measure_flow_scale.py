"""Quantify the video-phase flow-scale trade: parity (x2) vs fast (x1).

The reference's video phase upscales each frame pair x2 before PWC-Net and
scales the flow back down ("better prediction",
FISR_for_video_pwcnet_predict_from_img_test.py:116-141). `--flow_scale 1`
(the explicit FAST mode, round-3) skips the upscale: the flow stage runs at
native resolution, which bench_video measures at ~1.5x pipeline throughput
at 2K. This script pins the QUALITY side of that trade with the shipped
synthetic-trained PWC checkpoint: forward-flow EPE of both modes through
the production path (`infer.video._flow_core` — YUV input, x2-upscale
trick, bidirectional batch-2B program) on fresh textured val scenes.

Run on the real TPU:
  env PYTHONPATH=/root/repo python scripts/measure_flow_scale.py
Results are recorded in PARITY.md ("flow-scale trade").
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.data.flow_dataset import FlowDataset
from fisr_tpu.infer.video import _flow_core
from fisr_tpu.models import pwcnet
from fisr_tpu.ops.color import rgb2yuv_matlab
from fisr_tpu.ops.conv import Policy
from fisr_tpu.train.checkpoint import CheckpointManager


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoint_dir/pwcnet")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--max_shift", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=123,
                    help="fresh corpus seed (the ckpt was trained on seed 0)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    mgr = CheckpointManager(args.ckpt, best_mode="min")
    step = mgr.best_step()
    tree = mgr.restore(step)
    params = tree["params"] if isinstance(tree, dict) and "params" in tree else tree
    print(f"# PWC-Net checkpoint step {step} from {args.ckpt}", flush=True)

    ds = FlowDataset.synthetic_textured(n=args.n, h=args.hw, w=args.hw,
                                        seed=args.seed,
                                        max_shift=args.max_shift)
    pairs = ds.pairs.astype(np.float32)  # [N, 2, H, W, 3] RGB u8 values
    gt = ds.flows  # [N, H, W, 2]
    zero_epe = float(np.mean(np.sqrt((gt ** 2).sum(-1))))

    cfg = pwcnet.PWCNetConfig()
    policy = Policy(jnp.bfloat16)
    results = {"zero_flow_epe": round(zero_epe, 4), "ckpt_step": step,
               "n": args.n, "hw": args.hw, "max_shift": args.max_shift}
    for name, upscale in (("parity_x2", 2), ("fast_x1", 1)):
        fn = jax.jit(lambda p, y1, y2, u=upscale:
                     _flow_core(p, y1, y2, cfg, policy, u))
        epes = []
        for s in range(0, args.n, args.batch):
            rgb = jnp.asarray(pairs[s : s + args.batch])  # [B,2,H,W,3] in 0..255
            yuv1 = rgb2yuv_matlab(rgb[:, 0])
            yuv2 = rgb2yuv_matlab(rgb[:, 1])
            flows = np.asarray(fn(params, yuv1, yuv2), np.float32)
            err = flows[:, 0] - gt[s : s + args.batch]
            epes.append(np.sqrt((err ** 2).sum(-1)).mean(axis=(1, 2)))
        epe = float(np.concatenate(epes).mean())
        results[name + "_epe"] = round(epe, 4)
        print(f"# {name:10s} EPE {epe:.4f} px "
              f"({zero_epe / max(epe, 1e-9):.1f}x better than zero-flow)",
              flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
