"""Quantify the fast-engine deviation vs the exact engine (round-3 item 5).

The `exact` TiledRunner reproduces the reference's asymmetric-halo patch
geometry bit-for-bit (utils.py:118-135); the `fast` FastTiledRunner runs
the fully-jitted padded tiling + stale-halo shrink + fast upsample + fused
input glue. Their outputs differ only in the frame-edge band (zero-pad ring
vs one-sided interior halos) plus float reassociation. This script measures
PSNR/SSIM between the two engines' raw outputs on a trained model across
grids, at the reference 4K geometry — the number PARITY.md cites.

Needs a trained checkpoint (random init amplifies border perturbations
chaotically): run scripts/train_fisr_synth.py first.

Run on the real TPU:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_fast_vs_exact.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.infer.device import FastTiledRunner
from fisr_tpu.infer.tiled import TiledRunner
from fisr_tpu.models import fisrnet
from fisr_tpu.ops import metrics as M
from fisr_tpu.ops.conv import Policy
from fisr_tpu.train.checkpoint import CheckpointManager


def build_window(h, w, seed=0):
    """One synthetic 29-ch eval window at (h, w): textured images in [0,1],
    small normalized flows, warp channels = images + noise."""
    rng = np.random.default_rng(seed)
    img = np.clip(rng.uniform(0.3, 0.7, (1, h, w, 9))
                  + 0.3 * np.sin(np.linspace(0, 40, w))[None, None, :, None],
                  0, 1)
    flow = rng.uniform(-0.05, 0.05, (1, h, w, 8))
    warp = np.clip(img[..., :3].repeat(4, axis=-1)
                   + rng.normal(0, 0.02, (1, h, w, 12)), 0, 1)
    return np.concatenate([img, flow, warp], -1).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoint_dir/FISRnet_exp99")
    ap.add_argument("--hw", type=int, nargs=2, default=[1024, 1920])
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    tree = CheckpointManager(args.ckpt).restore()
    params = tree["params"] if "params" in tree else tree
    params = jax.tree_util.tree_map(jnp.asarray, params)
    h, w = args.hw
    pol = Policy(jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    inp = build_window(h, w)

    for grid in ((2, 2), (4, 4), (4, 6)):
        exact = TiledRunner(params, grid=grid, boundary=32, policy=pol)
        fast = FastTiledRunner(params, grid=grid, boundary=32, policy=pol)
        pe = np.clip(exact(inp), 0, 1)
        pf = np.clip(fast(inp), 0, 1)
        d = pe - pf
        mse = float(np.mean(np.square(d)))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        ssim = float(jnp.mean(M.ssim(jnp.asarray(pf[..., :3], jnp.float32) * 255,
                                     jnp.asarray(pe[..., :3], jnp.float32) * 255,
                                     max_val=255.0)))
        # deviation is confined to the frame-edge band: split it out
        b = 64 * 2  # 2x the halo, at output scale
        interior = np.abs(d[:, b:-b, b:-b])
        print(f"grid {grid}: PSNR(fast vs exact) {psnr:6.2f} dB  "
              f"SSIM {ssim:.5f}  max|d| {np.abs(d).max():.4g}  "
              f"interior max|d| {interior.max():.4g}", flush=True)


if __name__ == "__main__":
    main()
