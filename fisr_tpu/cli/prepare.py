"""Offline data preparation: flows + warped frames for train/test corpora.

Rebuild of the three standalone tfoptflow prep scripts (SURVEY components
14-15):
  * FISR_pwcnet_predict_from_img_test.py — test-set flows from scene PNGs
    -> `<out>.flo` [n_scenes, 8, H, W, 2];
  * FISR_pwcnet_predict_from_mat.py      — training flows from the 5-frame
    LR .mat at temporal stride ss in {1, 2} -> [N, 8|4, h, w, 2];
  * FISR_warp_mat_with_flo.py            — flow-warped middle frames from
    .flo + source frames -> `_warp.mat` [N, 8|4, h, w, 3] (YUV, 0-255).

Flow layout parity: pair i contributes (forward, backward) at sequence
positions (2i, 2i+1), so sliding window w consumes flows [4w : 4w+8) merged
channels — exactly what Tensor_slicer_recurrent_flow expects (ops.py:99-106).
All compute (YUV->RGB, x2-upscale flow trick, warping) runs jitted on device.

Usage:
  python -m fisr_tpu.cli.prepare flow-from-pngs --png_dir D --out f.flo
  python -m fisr_tpu.cli.prepare flow-from-mat  --mat M --ss 1 --out f.flo
  python -m fisr_tpu.cli.prepare warp-from-mat  --mat M --flo f.flo --ss 1 --out w.mat
"""

from __future__ import annotations

import argparse

import numpy as np

__all__ = ["main", "flows_for_sequences", "warps_for_sequences"]


def _pairs_for_stride(n_frames: int, ss: int):
    return [(i, i + ss) for i in range(0, n_frames - ss, ss)]


def flows_for_sequences(pwc_params, seqs_yuv255: np.ndarray, ss: int = 1,
                        policy=None) -> np.ndarray:
    """seqs: [N, n_frames, h, w, 3] YUV in [0,255] ->
    [N, 2*n_pairs, h, w, 2] bidirectional flows (pixel units)."""
    import jax.numpy as jnp

    from fisr_tpu.infer.video import make_flow_fn
    from fisr_tpu.models import pwcnet
    from fisr_tpu.ops.conv import F32

    flow_fn = make_flow_fn(pwcnet.PWCNetConfig(), policy or F32)
    n, n_frames = seqs_yuv255.shape[:2]
    pairs = _pairs_for_stride(n_frames, ss)
    out = np.zeros((n, 2 * len(pairs), *seqs_yuv255.shape[2:4], 2), np.float32)
    for i in range(n):
        for k, (a, b) in enumerate(pairs):
            fl = flow_fn(pwc_params,
                         jnp.asarray(seqs_yuv255[i : i + 1, a]),
                         jnp.asarray(seqs_yuv255[i : i + 1, b]))
            out[i, 2 * k] = np.asarray(fl[0, 0], np.float32)
            out[i, 2 * k + 1] = np.asarray(fl[0, 1], np.float32)
    return out


def warps_for_sequences(seqs_yuv255: np.ndarray, flows: np.ndarray,
                        ss: int = 1) -> np.ndarray:
    """Middle-frame warps: [N, 2*n_pairs, h, w, 3] YUV [0,255] (matches the
    reference's `pred` layout, FISR_warp_mat_with_flo.py:95-129)."""
    import jax.numpy as jnp

    from fisr_tpu.infer.video import make_warp_fn

    warp_fn = make_warp_fn()
    n, n_frames = seqs_yuv255.shape[:2]
    pairs = _pairs_for_stride(n_frames, ss)
    out = np.zeros((n, 2 * len(pairs), *seqs_yuv255.shape[2:4], 3), np.float32)
    for i in range(n):
        for k, (a, b) in enumerate(pairs):
            fl = jnp.asarray(flows[i, 2 * k : 2 * k + 2][None])
            wp = warp_fn(jnp.asarray(seqs_yuv255[i : i + 1, a]),
                         jnp.asarray(seqs_yuv255[i : i + 1, b]), fl)
            out[i, 2 * k : 2 * k + 2] = np.asarray(wp[0], np.float32)
    return out


def main(argv=None):
    import jax

    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data import matio
    from fisr_tpu.data.png_io import list_pngs, read_png
    from fisr_tpu.models import pwcnet

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=["flow-from-pngs", "flow-from-mat",
                                   "warp-from-mat"])
    p.add_argument("--png_dir", type=str, help="scene PNG folder (YUV)")
    p.add_argument("--frames_per_scene", type=int, default=5)
    p.add_argument("--mat", type=str, help="5-frame LR .mat (key LR_data)")
    p.add_argument("--flo", type=str, help="input .flo (for warp)")
    p.add_argument("--ss", type=int, default=1, choices=[1, 2])
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--pwc_ckpt", type=str, default=None,
                   help="converted PWC-Net checkpoint dir (orbax); random "
                        "init if absent")
    args = p.parse_args(argv)

    def load_pwc():
        if args.pwc_ckpt:
            from fisr_tpu.train.checkpoint import CheckpointManager

            return CheckpointManager(args.pwc_ckpt).restore()
        print(" [!] no --pwc_ckpt: using randomly initialized PWC-Net")
        return pwcnet.init_params(jax.random.PRNGKey(1))

    if args.cmd == "flow-from-pngs":
        paths = list_pngs(args.png_dir)
        k = args.frames_per_scene
        seqs = np.stack([
            np.stack([read_png(p) for p in paths[i : i + k]])
            for i in range(0, len(paths) - k + 1, k)
        ]).astype(np.float32)
        flows = flows_for_sequences(load_pwc(), seqs, args.ss)
        flo_io.write_flo_5dim(flows, args.out)
    elif args.cmd == "flow-from-mat":
        seqs = matio.read_train_mat(args.mat, "LR_data") * 255.0
        flows = flows_for_sequences(load_pwc(), seqs, args.ss)
        flo_io.write_flo_5dim(flows, args.out)
    else:  # warp-from-mat
        seqs = matio.read_train_mat(args.mat, "LR_data") * 255.0
        flows = flo_io.read_flo_5dim(args.flo)
        warps = warps_for_sequences(seqs, flows, args.ss)
        matio.write_warp_mat(warps, args.out)
    print(f"[*] wrote {args.out}")


if __name__ == "__main__":
    main()
