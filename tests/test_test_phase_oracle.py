"""Test-phase (eval engine) parity vs the reference's OWN run.

Fixtures from scripts/capture_test_phase_oracle.py: FISRnet.test()
(FISRnet.py:746-935) run VERBATIM on deterministic weights and a synthetic
scene, consuming .flo/.mat files written by OUR writers. Pins the test-set
data composition (flow slices 4i:4i+8 / warp 6i:6i+12), the VFI-SR vs SR
accounting (FISRnet.py:913-920), utils._compute_psnr, and the saved
RGB-prediction chain. SSIM values pin the ACCOUNTING only (compare_ssim
was shimmed to our ssim_pil_like in the capture — SSIM_PIL itself is the
one remaining external oracle, PARITY.md).

Measured at capture: means equal to the reference's printed 8-decimal
precision (~5e-9), prediction PNGs BIT-EXACT.
"""

import json
import os
import tempfile

import numpy as np
import pytest

import jax

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tf_oracle")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "test_phase_manifest.json")),
    reason="test-phase oracle fixtures not captured")


def test_eval_engine_matches_reference_test_phase():
    from PIL import Image

    from fisr_tpu.convert.oracle import deterministic_tf_vars, tf_vars_digest
    from fisr_tpu.convert.tf_import import convert_fisrnet, export_fisrnet
    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data import matio
    from fisr_tpu.infer.evaluate import evaluate_test_set
    from fisr_tpu.infer.tiled import TiledRunner
    from fisr_tpu.models import fisrnet
    from fisr_tpu.ops.conv import F32

    with open(os.path.join(FIX, "test_phase_manifest.json")) as f:
        man = json.load(f)
    z = np.load(os.path.join(FIX, "test_phase.npz"))
    h, w = man["scene"]["h"], man["scene"]["w"]

    shapes = {n: a.shape for n, a in export_fisrnet(
        fisrnet.init_params(jax.random.PRNGKey(0))).items()}
    tf_vars = deterministic_tf_vars(shapes)
    assert tf_vars_digest(tf_vars) == man["weights_digest"]
    params = convert_fisrnet(tf_vars)

    with tempfile.TemporaryDirectory() as td:
        lr_dir = os.path.join(td, "input")
        gt_dir = os.path.join(td, "gt")
        out_dir = os.path.join(td, "out")
        for d in (lr_dir, gt_dir, out_dir):
            os.makedirs(d)
        for i, fr in enumerate(z["lr"]):
            Image.fromarray(fr).save(os.path.join(lr_dir, f"LR_{i + 1:05d}.png"))
        for i, fr in enumerate(z["gt"]):
            Image.fromarray(fr).save(os.path.join(gt_dir, f"HR_{i + 1:05d}.png"))
        flow_path = os.path.join(td, "test.flo")
        warp_path = os.path.join(td, "test_warp.mat")
        flo_io.write_flo_5dim(z["flow"], flow_path)
        matio.write_warp_mat(z["warp"], warp_path)

        runner = TiledRunner(params, grid=tuple(man["scene"]["patch"]),
                             boundary=32, policy=F32, mode="exact")
        res = evaluate_test_set(runner, lr_dir, gt_dir, flow_path, warp_path,
                                out_dir=out_dir, input_size=(h, w),
                                verbose=False, ssim_impl="pil")

        # means: the capture parsed the reference's printed 8-decimal values
        assert abs(res.psnr_vfi_sr - z["mean_psnr"][0]) < 1e-6
        assert abs(res.psnr_sr - z["mean_psnr"][1]) < 1e-6
        assert abs(res.ssim_vfi_sr - z["mean_ssim"][0]) < 1e-6
        assert abs(res.ssim_sr - z["mean_ssim"][1]) < 1e-6

        # saved RGB predictions: bit-exact at capture; XLA program variants
        # (compile-cache machine-feature preferences) can flip isolated
        # f32 values at a u8 truncation boundary, so allow ±1 on a trace
        # fraction of pixels
        ours = np.stack([
            np.array(Image.open(os.path.join(out_dir, f"pred_{i + 1:05d}.png")))
            for i in range(len(z["preds_rgb"]))])
        d = np.abs(ours.astype(np.int32) - z["preds_rgb"].astype(np.int32))
        assert d.max() <= 1, d.max()
        assert (d == 0).mean() > 0.999, (d == 0).mean()
