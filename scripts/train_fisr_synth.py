"""Train FISRnet on the synthetic corpus to get non-degenerate weights.

Supports two round-3 needs: (a) the fast-vs-exact engine deviation
quantification (random-init weights amplify border perturbations
chaotically — only a trained model gives a meaningful PSNR bound), and
(b) a local FISRnet checkpoint for end-to-end runs. Reuses the full
train loop (windows-in-batch forward, 7-term loss, bf16 policy, Adam) —
the PERF.md on-hardware convergence demo, now as a checkpointed script.

Run on the real TPU:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_fisr_synth.py
"""

import argparse

import jax.numpy as jnp

from fisr_tpu.data.synth import synthetic_store
from fisr_tpu.ops.conv import Policy
from fisr_tpu.train.loop import fit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--n", type=int, default=264)
    ap.add_argument("--hw", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ckpt_dir", type=str, default="checkpoint_dir/FISRnet_exp99")
    ap.add_argument("--log_dir", type=str, default="logdir/FISRnet_exp99")
    args = ap.parse_args()

    store = synthetic_store(n_samples=args.n, h=args.hw, w=args.hw, seed=0,
                            val_size=8)
    fit(store, ckpt_dir=args.ckpt_dir, log_dir=args.log_dir,
        epochs=args.epochs, batch_size=args.batch, val_batch_size=4,
        init_lr=1e-4, lr_type="no_decay", policy=Policy(jnp.bfloat16))


if __name__ == "__main__":
    main()
