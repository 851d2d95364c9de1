"""Checkpoint conversion CLI: TF variable dump (.npz) -> orbax checkpoint.

The reference's released weights (FISRnet-122000, pwcnet.ckpt-595000) are TF1
TensorBundle checkpoints; reading that container needs a TF install, which
this image (and many TPU serving images) doesn't have. The practical flow:

  # anywhere with TF (one-time, no GPU needed):
  python - <<'PY'
  import numpy as np, tensorflow as tf
  r = tf.train.load_checkpoint("checkpoint_dir/FISRnet_exp1/FISRnet-122000")
  np.savez("fisrnet_122000.npz",
           **{k: r.get_tensor(k) for k in r.get_variable_to_shape_map()})
  PY

  # here:
  python -m fisr_tpu.convert.cli --model fisrnet --npz fisrnet_122000.npz \
      --out ./checkpoint_dir/FISRnet_exp1 --step 122000

After which `--phase test` / `--phase FISR_for_video` restore it like any
native checkpoint. The name mapping itself is convert/tf_import.py (round-
trip tested); this CLI adds the container plumbing + structural validation
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
    p.add_argument("--npz", required=True, help=".npz of {tf_var_name: array}")
    p.add_argument("--out", required=True, help="orbax checkpoint directory")
    p.add_argument("--step", type=int, default=0,
                   help="global step to key the checkpoint on (e.g. 122000)")
    args = p.parse_args(argv)

    tf_vars = dict(np.load(args.npz))
    # TF exports may suffix ':0' or prefix nothing; normalize common forms
    tf_vars = {k.split(":")[0]: v for k, v in tf_vars.items()}

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

    CheckpointManager(args.out).save(args.step, {"params": params})
    n = sum(int(np.prod(v.shape)) for v in got_flat)
    print(f"[*] wrote step {args.step} ({n:,} params) to {args.out}")


if __name__ == "__main__":
    main()
