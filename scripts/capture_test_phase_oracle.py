"""Capture the reference's TEST phase — FISRnet.test() (FISRnet.py:746-935)
— run VERBATIM on deterministic weights and a synthetic test set, as the
oracle for infer/evaluate.evaluate_test_set.

What this pins that the other oracles don't: the test-set data composition
(5-frame scenes, per-window flow channel slices 4i:4i+8 / warp 6i:6i+12),
the VFI-SR vs SR PSNR/SSIM ACCOUNTING (fr1 + last-window fr3 are VFI-SR,
fr2 is SR, FISRnet.py:913-920), utils._compute_psnr, and the saved
RGB-prediction naming/uint8 chain. The patch/stitch math itself is already
pinned (tests/test_video_oracle.py), and the model graph by the forward
oracle.

Verbatim: FISRnet.test() on a shimmed instance, reading a real Saver
checkpoint, consuming .flo/.mat files WRITTEN BY OUR writers (the on-disk
test-artifact contract pin).

SSIM caveat: SSIM_PIL is not installed here, so `compare_ssim` is shimmed
to OUR ssim_pil_like — the SSIM values pin the ACCOUNTING (which frames
enter which list) and the uint8 truncation chain, NOT the SSIM algorithm
itself (that one-time fixture still needs a machine with SSIM_PIL,
PARITY.md). PSNR is fully independent.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_test_phase_oracle.py
"""

import json
import os
import re
import sys
import tempfile
import types

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("MPLBACKEND", "Agg")

import contextlib
import io

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

H, W = 64, 128   # test_input_size (32-multiples; patch grid (1, 2))
PATCH = (1, 2)


def make_test_set(tmp):
    """One synthetic scene in the reference's test-set layout, artifacts
    written by OUR writers."""
    import cv2
    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data import matio
    from PIL import Image

    rng = np.random.default_rng(59)
    base = rng.uniform(16, 235, (H // 8 + 4, W // 8 + 4, 3)).astype(np.float32)
    base = cv2.resize(base, (W * 2, H * 2), interpolation=cv2.INTER_CUBIC)

    lr_dir = os.path.join(tmp, "input")
    gt_dir = os.path.join(tmp, "gt")
    os.makedirs(lr_dir), os.makedirs(gt_dir)
    for i in range(5):
        m = np.float32([[1, 0, -2.0 * i - W // 2], [0, 1, 1.5 * i - H // 2]])
        fr = cv2.warpAffine(base, m, (W, H), flags=cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REFLECT)
        Image.fromarray(np.clip(fr, 0, 255).astype(np.uint8)).save(
            os.path.join(lr_dir, f"LR_{i + 1:05d}.png"))
    for i in range(7):
        m = np.float32([[1, 0, -2.0 * i], [0, 1, 1.5 * i]])
        fr = cv2.warpAffine(base, m, (W * 2, H * 2), flags=cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REFLECT)
        Image.fromarray(np.clip(fr, 0, 255).astype(np.uint8)).save(
            os.path.join(gt_dir, f"HR_{i + 1:05d}.png"))

    flow = rng.uniform(-8, 8, (1, 8, H, W, 2)).astype(np.float32)
    warp = rng.uniform(0, 255, (1, 8, H, W, 3)).astype(np.float32)
    flow_path = os.path.join(tmp, "test.flo")
    warp_path = os.path.join(tmp, "test_warp.mat")
    flo_io.write_flo_5dim(flow, flow_path)
    matio.write_warp_mat(warp, warp_path)
    return lr_dir, gt_dir, flow_path, warp_path, flow, warp


def main():
    import capture_pwc_oracle as cpo
    import capture_video_oracle as cvo
    import tensorflow as tf_real

    v1 = tf_real.compat.v1
    v1.disable_eager_execution()
    cpo.install_shims(v1)
    cvo.install_extra_shims(v1)

    # compare_ssim -> our ssim_pil_like (accounting pin; see docstring)
    from fisr_tpu.ops.metrics import ssim_pil_like

    def compare_ssim(img_a, img_b):
        return ssim_pil_like(np.asarray(img_a, np.float64) / 255.0,
                             np.asarray(img_b, np.float64) / 255.0)

    sys.modules["SSIM_PIL"].compare_ssim = compare_ssim

    import FISRnet as ref_fisrnet  # noqa: E402

    ref_fisrnet.compare_ssim = compare_ssim  # already from-imported at top

    import jax

    jax.config.update("jax_platforms", "cpu")
    from fisr_tpu.convert.oracle import deterministic_tf_vars, tf_vars_digest
    from fisr_tpu.convert.tf_import import export_fisrnet
    from fisr_tpu.models import fisrnet as our_fisrnet

    shapes = {n: a.shape for n, a in export_fisrnet(
        our_fisrnet.init_params(jax.random.PRNGKey(0))).items()}
    tf_vars = deterministic_tf_vars(shapes)
    digest = tf_vars_digest(tf_vars)

    with tempfile.TemporaryDirectory() as tmp:
        lr_dir, gt_dir, flow_path, warp_path, flow, warp = make_test_set(tmp)
        ckpt_root = os.path.join(tmp, "ckpts")
        cvo.save_fisr_ckpt(v1, ref_fisrnet, tf_vars, ckpt_root)

        fake = object.__new__(ref_fisrnet.FISRnet)
        fake.scale_factor = 2
        fake.test_data_path = lr_dir
        fake.test_label_path = gt_dir
        fake.test_flow_data_path = flow_path
        fake.test_warped_data_path = warp_path
        fake.test_input_size = (H, W)
        fake.test_patch = PATCH
        fake.test_img_dir = os.path.join(tmp, "test_img")
        fake.checkpoint_dir = ckpt_root
        fake.exp_num = 0

        g = v1.Graph()
        buf = io.StringIO()
        with g.as_default(), v1.Session() as sess:
            fake.sess = sess
            with sess.as_default(), contextlib.redirect_stdout(buf):
                ref_fisrnet.FISRnet.test(fake)
        out = buf.getvalue()
        sys.stdout.write(out)

        # parse per-sample + epoch-mean lines (fixed reference formats)
        psnr_rows = [tuple(map(float, m)) for m in re.findall(
            r"test_PSNR: fr1 \(FI-SR\) ([\d.+-eE]+)\[dB\], fr2 \(SR\) "
            r"([\d.+-eE]+)\[dB\], fr3 \(FI-SR\) ([\d.+-eE]+)\[dB\]", out)]
        ssim_rows = [tuple(map(float, m)) for m in re.findall(
            r"test_SSIM: fr1 \(FI-SR\) ([\d.+-eE]+), fr2 \(SR\) "
            r"([\d.+-eE]+), fr3 \(FI-SR\) ([\d.+-eE]+)", out)]
        means_psnr = re.search(
            r"test_PSNR: FISR ([\d.+-eE]+)\[dB\], SR ([\d.+-eE]+)\[dB\]", out)
        means_ssim = re.search(
            r"test_SSIM: FISR ([\d.+-eE]+), SR ([\d.+-eE]+)", out)
        assert len(psnr_rows) == 3 and len(ssim_rows) == 3
        assert means_psnr and means_ssim

        from PIL import Image

        pred_dir = os.path.join(fake.test_img_dir, "FISRnet_exp0")
        pred_names = sorted(os.listdir(pred_dir))
        preds_rgb = np.stack([np.array(Image.open(os.path.join(pred_dir, n)))
                              for n in pred_names])
        # input frames for the our-side replay
        lr = np.stack([np.array(Image.open(os.path.join(lr_dir, n)))
                       for n in sorted(os.listdir(lr_dir))])
        gt = np.stack([np.array(Image.open(os.path.join(gt_dir, n)))
                       for n in sorted(os.listdir(gt_dir))])

        os.makedirs(OUT_DIR, exist_ok=True)
        np.savez_compressed(
            os.path.join(OUT_DIR, "test_phase.npz"),
            lr=lr, gt=gt, flow=flow, warp=warp,
            psnr_rows=np.asarray(psnr_rows, np.float64),
            ssim_rows=np.asarray(ssim_rows, np.float64),
            mean_psnr=np.asarray([float(means_psnr.group(1)),
                                  float(means_psnr.group(2))]),
            mean_ssim=np.asarray([float(means_ssim.group(1)),
                                  float(means_ssim.group(2))]),
            preds_rgb=preds_rgb)
        manifest = {
            "tf_version": tf_real.__version__,
            "weights_digest": digest,
            "scene": {"h": H, "w": W, "patch": list(PATCH)},
            "pred_names": pred_names,
            "ssim_note": "compare_ssim shimmed to fisr_tpu ssim_pil_like "
                         "(SSIM_PIL not installed): pins accounting + u8 "
                         "chain, NOT the SSIM algorithm (PARITY.md)",
            "source": "FISRnet.test (FISRnet.py:746-935) verbatim incl. "
                      "real Saver restore; .flo/.mat written by "
                      "fisr_tpu.data writers",
        }
        with open(os.path.join(OUT_DIR, "test_phase_manifest.json"),
                  "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"# means: PSNR {means_psnr.groups()} SSIM {means_ssim.groups()}")
        print(f"# preds: {preds_rgb.shape} {pred_names}")
        print(f"# wrote {OUT_DIR}/test_phase.npz")


if __name__ == "__main__":
    main()
