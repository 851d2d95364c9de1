"""Train a synthetic-corpus PWC-Net that actually learns matching (round 3).

Round-2's demo proved the machinery (loss 6.7->1.9) but val EPE never beat
the zero-flow baseline: the sinusoid corpus is feature-poor and 1500 steps
is too short for from-scratch matching. This run uses the multi-octave
textured corpus (data/flow_dataset.synthetic_textured) and a longer
schedule; the gate is val EPE <= 1/2 the zero-flow baseline (~2.9 px for
+-4 px uniform shifts -> target <=1.45 px).

The best-k checkpoint it writes is a drop-in for the video phase:
  python -m fisr_tpu.cli.main --phase FISR_for_video \
      --pwc_ckpt checkpoint_dir/pwcnet_synth ...

Run on the real TPU:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_pwc_synth.py
"""

import argparse

import jax.numpy as jnp
import numpy as np

from fisr_tpu.data.flow_dataset import FlowDataset
from fisr_tpu.models import pwcnet
from fisr_tpu.ops.conv import Policy
from fisr_tpu.train import schedule
from fisr_tpu.train.pwc_trainer import pwc_fit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16000)
    ap.add_argument("--n", type=int, default=768)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max_shift", type=float, default=4.0)
    ap.add_argument("--ckpt_dir", type=str, default="checkpoint_dir/pwcnet_synth")
    ap.add_argument("--log_dir", type=str, default="logdir/pwcnet_synth")
    ap.add_argument("--val_every", type=int, default=1000)
    args = ap.parse_args()

    ds = FlowDataset.synthetic_textured(
        n=args.n, h=args.hw, w=args.hw, seed=0, max_shift=args.max_shift)
    zero_epe = float(np.mean(np.sqrt((ds.flows[len(ds._train_idx):] ** 2)
                                     .sum(-1))))
    print(f"corpus: {args.n} samples {args.hw}x{args.hw}, "
          f"zero-flow val EPE baseline {zero_epe:.3f} px "
          f"(gate: <= {zero_epe / 2:.3f})", flush=True)

    sched = schedule.multisteps(
        [1e-4, 5e-5, 2.5e-5, 1.25e-5],
        [int(args.steps * 0.5), int(args.steps * 0.75), int(args.steps * 0.9)])
    state = pwc_fit(ds, args.ckpt_dir, steps=args.steps,
                    batch_size=args.batch, val_every=args.val_every,
                    display_every=200, schedule_fn=sched,
                    policy=Policy(jnp.bfloat16), log_dir=args.log_dir)
    print(f"done at step {int(state.step)}; checkpoints in {args.ckpt_dir}",
          flush=True)


if __name__ == "__main__":
    main()
