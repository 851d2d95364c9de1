"""End-metric quality gate for the FISR_for_video pipeline (real TPU).

Generates a synthetic LR scene WITH high-frame-rate high-res ground truth
(data.synth.write_synthetic_video_scene), runs the production fused
pipeline in both flow modes (parity x2-upscale flow vs --flow_scale 1
fast), and scores the written frames against GT
(infer.video_eval.evaluate_video_folder: PSNR/SSIM split into SR and
VFI-SR families like the reference's test phase, FISRnet.py:913-933).
This measures the flow-scale trade at the END metric — the number a user
of `--flow_scale 1` actually gives up — complementing the flow-EPE view
of scripts/measure_flow_scale.py. Results recorded in PARITY.md.

Run: env PYTHONPATH=/root/repo python scripts/eval_video_synth.py \
       --fisr_ckpt checkpoint_dir/FISRnet_exp99 --pwc_ckpt checkpoint_dir/pwcnet
"""
import argparse
import json
import os
import tempfile

import numpy as np


def _restore(path, best_mode=None):
    from fisr_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(path, best_mode=best_mode)
    step = mgr.best_step() if best_mode else mgr.latest_step()
    tree = mgr.restore(step)
    params = tree["params"] if isinstance(tree, dict) and "params" in tree else tree
    print(f"# restored {path} step {step}", flush=True)
    return params


def main():
    import jax
    import jax.numpy as jnp

    from fisr_tpu.data.synth import write_synthetic_video_scene
    from fisr_tpu.infer.video import run_video_pipeline
    from fisr_tpu.infer.video_eval import evaluate_video_folder
    from fisr_tpu.models import fisrnet, pwcnet
    from fisr_tpu.ops.conv import Policy

    ap = argparse.ArgumentParser()
    ap.add_argument("--fisr_ckpt", default="checkpoint_dir/FISRnet_exp99")
    ap.add_argument("--pwc_ckpt", default="checkpoint_dir/pwcnet")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 256])
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    if os.path.isdir(args.fisr_ckpt):
        fisr_params = _restore(args.fisr_ckpt)
    else:
        print(f"# WARNING: no FISRnet ckpt at {args.fisr_ckpt} — fresh init "
              "(absolute dB will be meaningless; mode DELTAS still hold)",
              flush=True)
        fisr_params = fisrnet.init_params(jax.random.PRNGKey(0))
    pwc_params = _restore(args.pwc_ckpt, best_mode="min")

    results = {"frames": args.frames, "hw": args.hw, "seed": args.seed}
    policy = Policy(jnp.bfloat16)
    for name, upscale in (("parity_x2", 2), ("fast_x1", 1)):
        root = tempfile.mkdtemp(prefix=f"video_eval_{name}_")
        folder, gt_dir = write_synthetic_video_scene(
            os.path.join(root, "vid"), n_frames=args.frames,
            h=args.hw[0], w=args.hw[1], seed=args.seed)
        run_video_pipeline(fisr_params, pwc_params, folder, fused=True,
                           verbose=False, policy=policy,
                           flow_upscale=upscale)
        r = evaluate_video_folder(os.path.join(folder, "FISR_frames"), gt_dir)
        results[name] = r.as_dict()
        print(f"# {name:10s} PSNR VFI-SR {r.psnr_vfi_sr:6.2f}  "
              f"SR {r.psnr_sr:6.2f}  SSIM {r.ssim_vfi_sr:.4f}/{r.ssim_sr:.4f}",
              flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
