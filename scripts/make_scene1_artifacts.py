"""Regenerate artifacts/real_scene1: the FISR_for_video phase on REAL data.

Drives the fused flow->warp->FISRnet pipeline over the 5 real 1080x1920 YUV
frames the reference ships (FISR_test_folder/scene1 — its only real data),
then records output hashes, shapes, means, and center thumbnails for visual
regression across rounds. Weights are seeded fresh inits (the released TF
checkpoints are an external download not present here); swap in
`python -m fisr_tpu.convert.cli` output when available.

Run on the real TPU: PYTHONPATH=. python scripts/make_scene1_artifacts.py
"""
import hashlib
import json
import os
import sys
import tempfile

import numpy as np

SCENE = "/root/reference/FISR_test_folder/scene1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "real_scene1")


def main():
    import argparse

    from fisr_tpu.cli import main as cli
    from fisr_tpu.data.png_io import read_png

    ap = argparse.ArgumentParser()
    ap.add_argument("--pwc_ckpt", default=None,
                    help="trained/converted PWC checkpoint dir for the flow "
                         "stage (e.g. checkpoint_dir/pwcnet_joint); default "
                         "= fresh init with the CLI's loud warning")
    ap.add_argument("--exp_num", type=int, default=None,
                    help="FISRnet experiment checkpoint to restore (e.g. "
                         "99 for the synthetic-trained tree); default = "
                         "fresh init")
    ap.add_argument("--fisr_ckpt", default=None,
                    help="restore FISRnet from this checkpoint dir directly "
                         "(e.g. checkpoint_dir/FISRnet_joint — the CLI only "
                         "knows FISRnet_exp{N} names, so this is symlinked "
                         "into a scratch experiment dir); overrides "
                         "--exp_num")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="scene1_")
    cli_args = [
        "--phase", "FISR_for_video", "--frame_folder_path", SCENE,
        "--video_out_dir", tmp, "--FISR_input_size", "1080", "1920",
        "--frame_num", "5", "--fused", "--compute_dtype", "bfloat16",
    ]
    if args.pwc_ckpt:
        cli_args += ["--pwc_ckpt", args.pwc_ckpt]
    if args.fisr_ckpt:
        ck = tempfile.mkdtemp(prefix="scene1_ckpt_")
        os.symlink(os.path.abspath(args.fisr_ckpt),
                   os.path.join(ck, "FISRnet_exp1"))
        cli_args += ["--checkpoint_dir", ck, "--exp_num", "1"]
    elif args.exp_num is not None:
        cli_args += ["--exp_num", str(args.exp_num)]
    cli.main(cli_args)

    os.makedirs(OUT, exist_ok=True)
    pwc_desc = (f"PWC-Net restored from {args.pwc_ckpt} (synthetic-corpus "
                "trained, see PERF.md)" if args.pwc_ckpt else
                "PRNGKey(1) fresh init (RANDOM flow)")
    if args.fisr_ckpt:
        fisr_desc = (f"restored from {args.fisr_ckpt} (jointly fine-tuned "
                     "end-to-end, see PERF.md)")
    elif args.exp_num is not None:
        fisr_desc = (f"restored from checkpoint_dir/FISRnet_exp{args.exp_num}"
                     " (synthetic-corpus trained, see PERF.md)")
    else:
        fisr_desc = "seeded fresh init PRNGKey(0)"
    rec = {
        "inputs": "reference FISR_test_folder/scene1 (5 real 1080x1920 YUV PNGs)",
        "pipeline": "FISR_for_video --fused (PWC flow + warp + FISRnet, one XLA program/window)",
        "weights": (f"FISRnet: {fisr_desc}; flow: {pwc_desc}. "
                    "The released TF weights are an external download not "
                    "present in this environment; swap in convert.cli output "
                    "when available"),
        "device": "TPU v5e (axon), bf16 policy",
        "outputs": {},
    }
    for name in sorted(os.listdir(tmp)):
        if not name.endswith(".png"):
            continue
        path = os.path.join(tmp, name)
        img = read_png(path)
        rec["outputs"][name] = {
            "sha256": hashlib.sha256(open(path, "rb").read()).hexdigest(),
            "shape": list(img.shape),
            "mean": round(float(img.mean()), 3),
        }
        # center 64x64 thumbnail for quick eyeballing in-repo
        h, w = img.shape[:2]
        crop = img[h // 2 - 32 : h // 2 + 32, w // 2 - 32 : w // 2 + 32]
        from fisr_tpu.data.png_io import write_png

        write_png(crop, os.path.join(OUT, f"thumb_{name}"))
    with open(os.path.join(OUT, "hashes.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {len(rec['outputs'])} output records to {OUT}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
