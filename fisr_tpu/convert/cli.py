"""Checkpoint conversion CLI: TF checkpoint / .npz dump -> orbax checkpoint.

The reference's released weights (FISRnet-122000, pwcnet.ckpt-595000) are TF1
TensorBundle checkpoints. They import directly, zero TF required — the
container is read by the pure-Python bundle reader (convert/tensor_bundle.py):

  python -m fisr_tpu.convert.cli --model fisrnet \
      --ckpt ./checkpoint_dir/FISRnet_exp1/FISRnet-122000 \
      --out ./checkpoint_dir/FISRnet_exp1 --step 122000

`--npz` remains as an alternative input (a {tf_var_name: array} dump made
anywhere with TF via tf.train.load_checkpoint).

After conversion, `--phase test` / `--phase FISR_for_video` restore it like
any native checkpoint. The name mapping is convert/tf_import.py (round-trip
tested); this CLI adds the container plumbing + structural validation
against a fresh init.
"""

from __future__ import annotations

import argparse

import numpy as np

__all__ = ["main"]


def main(argv=None):
    import jax

    from fisr_tpu.convert import tf_import
    from fisr_tpu.models import fisrnet, pwcnet
    from fisr_tpu.train.checkpoint import CheckpointManager

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["fisrnet", "pwcnet"], required=True)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt", help="TF checkpoint prefix (e.g. .../FISRnet-122000)")
    src.add_argument("--npz", help=".npz of {tf_var_name: array}")
    p.add_argument("--out", required=True, help="orbax checkpoint directory")
    p.add_argument("--step", type=int, default=0,
                   help="global step to key the checkpoint on (e.g. 122000)")
    p.add_argument("--verify-crc", action="store_true",
                   help="check per-tensor/block crc32c while reading --ckpt")
    args = p.parse_args(argv)

    if args.ckpt:
        params = tf_import.load_tf_checkpoint(args.ckpt, args.model,
                                              verify_crc=args.verify_crc)
    else:
        tf_vars = tf_import.normalize_tf_vars(dict(np.load(args.npz)))
        if args.model == "fisrnet":
            params = tf_import.convert_fisrnet(tf_vars)
            ref = fisrnet.init_params(jax.random.PRNGKey(0))
        else:
            params = tf_import.convert_pwcnet(tf_vars)
            ref = pwcnet.init_params(jax.random.PRNGKey(0))
        # structural validation: same treedef, same shapes as a fresh init
        ref_flat, ref_def = jax.tree_util.tree_flatten(ref)
        got_flat, got_def = jax.tree_util.tree_flatten(params)
        assert ref_def == got_def, "converted tree structure mismatch"
        for r, g in zip(ref_flat, got_flat):
            assert r.shape == tuple(g.shape), (r.shape, g.shape)

    got_flat = jax.tree_util.tree_leaves(params)
    CheckpointManager(args.out).save(args.step, {"params": params})
    n = sum(int(np.prod(v.shape)) for v in got_flat)
    print(f"[*] wrote step {args.step} ({n:,} params) to {args.out}")


if __name__ == "__main__":
    main()
