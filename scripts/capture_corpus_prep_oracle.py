"""Capture the reference's TRAIN-DATA-PREP chain — the two standalone
scripts that manufacture the training corpus's flow/warp artifacts —
by running their functions verbatim on deterministic PWC weights, as the
oracle for cli/prepare.py (flows_for_sequences / warps_for_sequences) and
cli/build_corpus.py.

What runs VERBATIM from /root/reference/FISR_tfoptflow:
  * FISR_pwcnet_predict_from_mat.py — read_mat_file (h5py, [N,N_seq,C,W,H]
    swap), YUV2RGB, write_flow (5-dim .flo), and ModelPWCNet's real
    predict_from_img_pairs; the __main__ loop (it is not a function) is
    replicated line-for-line for ss in {1, 2}: YUV2RGB -> x2 resize ->
    uint8 -> predict -> AA-downscale -> /2 -> pred[num].
  * FISR_warp_mat_with_flo.py — read_mat_file, read_flo_file_5dim,
    YUV2RGB_matlab, warp_flow (cv2.remap BORDER_REPLICATE at flow*0.5),
    RGB2YUV_matlab; __main__ loop replicated for ss in {1, 2}.

The .mat consumed by the reference's own readers is written by OUR
matio.write_train_mat (pinning the writer<->reader axis/scale contract),
and the .flo files written by the reference's write_flow are read back by
OUR flo_io.read_flo_5dim (the reverse direction of the train-loss
capture's pin). Shims (skimage resize via cv2, h5py .value, v1 layers)
are the documented set from capture_pwc_oracle/capture_video_oracle.

The script also runs OUR prep on the same inputs and prints measured
deviations so the test bounds are calibrated:
  * flows: loose bound (the x2-up/AA-down resize chain differs: skimage-
    semantics cv2 here vs TF1-legacy bilinear on device — same documented
    deviation as the video oracle's flow stage);
  * warps ON the reference's flows: tight bound (same math both sides).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_corpus_prep_oracle.py
"""

import importlib
import json
import os
import sys
import tempfile

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("MPLBACKEND", "Agg")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

N, N_SEQ, H, W = 2, 5, 32, 32  # x2 -> 64x64: 64-multiple, no adapt_x pad
SCALE = 2


def make_lr_sequences():
    """[N, N_SEQ, H, W, 3] float32 YUV in [0,255]: smooth moving content
    (keeps the loose-bound resize-chain deviation small, like the video
    oracle's scene)."""
    import cv2

    rng = np.random.default_rng(823)
    seqs = np.zeros((N, N_SEQ, H, W, 3), np.float32)
    for n in range(N):
        base = rng.uniform(16, 235, (H // 4 + 4, W // 4 + 4, 3)).astype(
            np.float32)
        base = cv2.resize(base, (W * 3, H * 3), interpolation=cv2.INTER_CUBIC)
        for t in range(N_SEQ):
            dx, dy = 1.3 * t + 0.4 * n, -0.9 * t
            m = np.float32([[1, 0, -dx - W], [0, 1, -dy - H]])
            fr = cv2.warpAffine(base, m, (W, H), flags=cv2.INTER_LINEAR,
                                borderMode=cv2.BORDER_REFLECT)
            seqs[n, t] = np.clip(fr, 0, 255).astype(np.uint8)
    return seqs


def build_pwc_model(v1, ModelPWCNet, defaults, pwc_vars, assign_all):
    """mode-'test' ModelPWCNet at static x2 geometry with the
    deterministic weights assigned (the capture_video_oracle pad-case
    pattern — predict_from_img_pairs then runs verbatim)."""
    from copy import deepcopy

    mdl = object.__new__(ModelPWCNet)
    mdl.opts = deepcopy(defaults)
    mdl.opts.update({"batch_size": 1, "pyr_lvls": 6, "flow_pred_lvl": 2,
                     "use_dense_cx": True, "use_res_cx": True,
                     "gpu_devices": ["/device:CPU:0"],
                     "controller": "/device:CPU:0",
                     # the reference script's crop hint, at our geometry
                     # (FISR_pwcnet_predict_from_mat.py:101)
                     "adapt_info": (1, H * SCALE, W * SCALE, 2)})
    mdl.dbg = False
    mdl.mode = "test"
    mdl.graph = v1.Graph()
    with mdl.graph.as_default():
        mdl.x_tnsr = v1.placeholder(
            v1.float32, (1, 2, H * SCALE, W * SCALE, 3), "x")
        mdl.flow_pred_tnsr, mdl.flow_pyr_tnsr = mdl.nn(mdl.x_tnsr)
        mdl.y_hat_test_tnsr = [mdl.flow_pred_tnsr, mdl.flow_pyr_tnsr]
        mdl.sess = v1.Session()
        with mdl.sess.as_default():
            assign_all(v1, mdl.sess, pwc_vars)
    return mdl


def main():
    import capture_pwc_oracle as cpo
    import capture_video_oracle as cvo
    import tensorflow as tf_real

    v1 = tf_real.compat.v1
    v1.disable_eager_execution()
    cpo.install_shims(v1)
    cvo.install_extra_shims(v1)

    # the prep scripts use BARE intra-package imports (`from model_pwcnet
    # import ...`) unlike the video scripts' relative ones — alias the
    # already-imported package modules so they resolve unmodified
    import FISR_tfoptflow.model_pwcnet as ref_mp
    import FISR_tfoptflow.visualize as ref_viz

    sys.modules.setdefault("model_pwcnet", ref_mp)
    sys.modules.setdefault("visualize", ref_viz)

    prep = importlib.import_module(
        "FISR_tfoptflow.FISR_pwcnet_predict_from_mat")
    wprep = importlib.import_module("FISR_tfoptflow.FISR_warp_mat_with_flo")

    pwc_vars, pwc_digest, _, _ = cvo.deterministic_weights()

    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data import matio

    seqs = make_lr_sequences()
    tmp = tempfile.mkdtemp(prefix="corpus_prep_oracle_")
    mat_path = os.path.join(tmp, "LR_tiny_5seq.mat")
    matio.write_train_mat(mat_path, "LR_data", seqs)

    # --- verbatim reader on OUR .mat (axis/scale contract pin) ----------
    data = prep.read_mat_file(mat_path, "LR_data")
    np.testing.assert_allclose(data, seqs, atol=1e-5)
    sz = data.shape
    print(f"# reference read_mat_file == our write_train_mat input {sz}")

    mdl = build_pwc_model(v1, ref_mp.ModelPWCNet,
                          ref_mp._DEFAULT_PWCNET_TEST_OPTIONS,
                          pwc_vars, cvo.assign_all)

    out, flo_paths = {}, {}
    out["data_yuv"] = seqs
    for ss in (1, 2):
        # --- FISR_pwcnet_predict_from_mat.py:112-132, line for line -----
        img_pairs = []
        pred = np.zeros((sz[0], 8 // ss, sz[2], sz[3], 2), dtype=np.float32)
        for num in range(sz[0]):
            for seq in range(sz[1] - (ss * 2 - 1)):
                rgb_1 = prep.YUV2RGB(data[num, ss * seq, :, :, :])
                rgb_2 = prep.YUV2RGB(data[num, ss * (seq + 1), :, :, :])
                rgb_1 = prep.resize(rgb_1, (sz[2] * SCALE, sz[3] * SCALE))
                rgb_2 = prep.resize(rgb_2, (sz[2] * SCALE, sz[3] * SCALE))
                img_pairs.append((np.array(rgb_1, dtype=np.uint8),
                                  np.array(rgb_2, dtype=np.uint8)))
                img_pairs.append((np.array(rgb_2, dtype=np.uint8),
                                  np.array(rgb_1, dtype=np.uint8)))
            flow = np.array(mdl.predict_from_img_pairs(img_pairs,
                                                       batch_size=1))
            flow_rs = prep.resize(flow, (flow.shape[0], sz[2], sz[3], 2),
                                  anti_aliasing=True) / SCALE
            pred[num, :, :, :, :] = flow_rs
            img_pairs = []

        flo_paths[ss] = os.path.join(tmp, f"tiny_ss{ss}.flo")
        prep.write_flow(pred, flo_paths[ss])  # verbatim 5-dim writer
        ours_read = flo_io.read_flo_5dim(flo_paths[ss])
        np.testing.assert_array_equal(ours_read, pred)
        out[f"flow_ss{ss}"] = pred
        print(f"# ss{ss} flows {pred.shape} |max| {np.abs(pred).max():.3f} "
              f"(our reader == reference writer)")

        # --- FISR_warp_mat_with_flo.py:99-129, line for line -------------
        flow = wprep.read_flo_file_5dim(flo_paths[ss])
        pred_warp = np.zeros((sz[0], 8 // ss, sz[2], sz[3], 3), np.float32)
        for num in range(sz[0]):
            for seq in range(sz[1] - (ss * 2 - 1)):
                rgb_1 = wprep.YUV2RGB_matlab(data[num, ss * seq, :, :, :])
                rgb_2 = wprep.YUV2RGB_matlab(
                    data[num, ss * (seq + 1), :, :, :])
                flow_sample = flow[num, 2 * seq, :, :, :]
                warped_img_1 = wprep.warp_flow(rgb_2, flow_sample * 0.5)
                pred_warp[num, 2 * seq] = wprep.RGB2YUV_matlab(warped_img_1)
                flow_sample = flow[num, 2 * seq + 1, :, :, :]
                warped_img_2 = wprep.warp_flow(rgb_1, flow_sample * 0.5)
                pred_warp[num, 2 * seq + 1] = wprep.RGB2YUV_matlab(
                    warped_img_2)
        out[f"warp_ss{ss}"] = pred_warp
        print(f"# ss{ss} warps {pred_warp.shape} "
              f"range [{pred_warp.min():.1f}, {pred_warp.max():.1f}]")
    # --- FISR_pwcnet_predict_from_img_test.py:117-146, line for line -----
    # the THIRD prep script (test-phase flows from YUV PNGs): same per-pair
    # chain but PIL-read frames and per-seq predict calls. The PNGs are
    # written by OUR write_png from sample 0's frames, so the result must
    # be BIT-IDENTICAL to the from_mat ss1 flows for sample 0 — pinning
    # the PNG round-trip and the per-seq pred[num, 2seq:2seq+2] layout.
    import glob as _glob

    from PIL import Image

    from fisr_tpu.data.png_io import write_png

    tprep = importlib.import_module(
        "FISR_tfoptflow.FISR_pwcnet_predict_from_img_test")
    png_dir = os.path.join(tmp, "test_pngs")
    os.makedirs(png_dir)
    for t in range(N_SEQ):
        write_png(seqs[0, t].astype(np.uint8),
                  os.path.join(png_dir, f"fr_{t:03d}.png"))
    data_list = _glob.glob(os.path.join(png_dir, "*.png"))
    h, w, N_seq, ss = H, W, N_SEQ, 1
    img_pairs = []
    pred_t = np.zeros((len(data_list) // N_seq, 8 // ss, h, w, 2),
                      dtype=np.float32)
    for num in range(len(data_list) // N_seq):
        for seq in range(N_seq - (ss * 2 - 1)):
            rgb_1 = Image.open(data_list[num * N_seq + ss * seq])
            rgb_1 = np.array(rgb_1, dtype=np.float32)
            rgb_1 = tprep.YUV2RGB(rgb_1)
            rgb_2 = Image.open(data_list[num * N_seq + ss * (seq + 1)])
            rgb_2 = np.array(rgb_2, dtype=np.float32)
            rgb_2 = tprep.YUV2RGB(rgb_2)
            rgb_1 = tprep.resize(rgb_1, (h * SCALE, w * SCALE))
            rgb_2 = tprep.resize(rgb_2, (h * SCALE, w * SCALE))
            img_pairs.append((np.array(rgb_1, dtype=np.uint8),
                              np.array(rgb_2, dtype=np.uint8)))
            img_pairs.append((np.array(rgb_2, dtype=np.uint8),
                              np.array(rgb_1, dtype=np.uint8)))
            flow = tprep.np.array(mdl.predict_from_img_pairs(img_pairs,
                                                             batch_size=1))
            img_pairs = []
            flow_rs = tprep.resize(flow, (flow.shape[0], h, w, 2),
                                   anti_aliasing=True) / SCALE
            pred_t[num, 2 * seq:2 * (seq + 1), :, :, :] = flow_rs
    np.testing.assert_array_equal(pred_t[0], out["flow_ss1"][0])
    print("# from_img_test (PNG chain) == from_mat ss1 flows bit-exact "
          "(sample 0, our write_png -> PIL read)")
    mdl.sess.close()

    # --- amplified-flow warp chain ---------------------------------------
    # the deterministic-weight flows are near-zero (|max| ~0.04 px), which
    # cannot distinguish layout/sign bugs in the warp stage; hand-made ~4 px
    # flows with a DISTINCT direction per (num, position) make any
    # fwd/bwd-position swap or axis-convention bug show at full scale
    # (the video oracle's amplified-chain trick)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    amp = np.zeros((N, 8, H, W, 2), np.float32)
    for num in range(N):
        for k in range(8):
            ang = 2.0 * np.pi * (k + 3 * num) / 11.0
            mag = 2.5 + 1.5 * np.sin(2 * np.pi * (xx / W + yy / H) + k)
            amp[num, k, :, :, 0] = mag * np.cos(ang)
            amp[num, k, :, :, 1] = mag * np.sin(ang)
    amp_flo = os.path.join(tmp, "tiny_amp.flo")
    prep.write_flow(amp, amp_flo)
    flow = wprep.read_flo_file_5dim(amp_flo)
    ss = 1
    warp_amp = np.zeros((sz[0], 8, sz[2], sz[3], 3), np.float32)
    for num in range(sz[0]):
        for seq in range(sz[1] - (ss * 2 - 1)):
            rgb_1 = wprep.YUV2RGB_matlab(data[num, ss * seq, :, :, :])
            rgb_2 = wprep.YUV2RGB_matlab(data[num, ss * (seq + 1), :, :, :])
            flow_sample = flow[num, 2 * seq, :, :, :]
            warp_amp[num, 2 * seq] = wprep.RGB2YUV_matlab(
                wprep.warp_flow(rgb_2, flow_sample * 0.5))
            flow_sample = flow[num, 2 * seq + 1, :, :, :]
            warp_amp[num, 2 * seq + 1] = wprep.RGB2YUV_matlab(
                wprep.warp_flow(rgb_1, flow_sample * 0.5))
    out["flow_amp"] = amp
    out["warp_amp"] = warp_amp
    print(f"# amplified warps {warp_amp.shape} "
          f"range [{warp_amp.min():.1f}, {warp_amp.max():.1f}]")

    # --- calibration: OUR prep on the same inputs ------------------------
    import jax

    jax.config.update("jax_platforms", "cpu")
    from fisr_tpu.cli.prepare import flows_for_sequences, warps_for_sequences
    from fisr_tpu.convert.tf_import import convert_pwcnet

    params = convert_pwcnet(pwc_vars)
    report = {}
    for ss in (1, 2):
        ref_f = out[f"flow_ss{ss}"]
        our_f = flows_for_sequences(params, seqs, ss)
        rms = float(np.sqrt(np.mean(ref_f**2)))
        dev = float(np.sqrt(np.mean((our_f - ref_f) ** 2)))
        swapped = ref_f.reshape(sz[0], -1, 2, *ref_f.shape[2:])[
            :, :, ::-1].reshape(ref_f.shape)
        dev_sw = float(np.sqrt(np.mean((our_f - swapped) ** 2)))
        our_w = warps_for_sequences(seqs, ref_f, ss)
        wmax = float(np.abs(our_w - out[f"warp_ss{ss}"]).max())
        report[f"ss{ss}"] = {"flow_rms_ref": rms, "flow_rms_dev": dev,
                             "flow_rms_dev_swapped_layout": dev_sw,
                             "warp_maxabs_dev_on_ref_flows": wmax}
        print(f"# ss{ss} calibration: {report[f'ss{ss}']}")

    our_wamp = warps_for_sequences(seqs, amp, 1)
    wdev = float(np.abs(our_wamp - warp_amp).max())
    swapped = warp_amp.reshape(N, 4, 2, H, W, 3)[:, :, ::-1].reshape(
        warp_amp.shape)
    wdev_sw = float(np.abs(our_wamp - swapped).max())
    report["amp"] = {"warp_maxabs_dev": wdev,
                     "warp_maxabs_dev_swapped_layout": wdev_sw}
    assert wdev * 10 < wdev_sw, report["amp"]
    print(f"# amp calibration: {report['amp']}")

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(os.path.join(OUT_DIR, "corpus_prep.npz"), **out)
    for ss in (1, 2):
        with open(flo_paths[ss], "rb") as f, open(
                os.path.join(OUT_DIR, f"corpus_ss{ss}.flo"), "wb") as g:
            g.write(f.read())
    manifest = {
        "tf_version": tf_real.__version__,
        "weights_digest": pwc_digest,
        "n": N, "n_seq": N_SEQ, "h": H, "w": W, "scale": SCALE,
        "measured": report,
        "from_img_test": "verified at capture: the PNG-chain prep script "
                         "(FISR_pwcnet_predict_from_img_test.py) on our "
                         "write_png frames == from_mat ss1 flows "
                         "bit-exact (sample 0)",
        "source": "FISR_tfoptflow/FISR_pwcnet_predict_from_mat.py + "
                  "FISR_warp_mat_with_flo.py + "
                  "FISR_pwcnet_predict_from_img_test.py: helper functions "
                  "+ real predict_from_img_pairs verbatim, __main__ loops "
                  "replicated line-for-line (they are not functions); "
                  "shims per capture_pwc_oracle/capture_video_oracle",
    }
    with open(os.path.join(OUT_DIR, "corpus_prep_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"# wrote {OUT_DIR}/corpus_prep.npz + corpus_ss{{1,2}}.flo")


if __name__ == "__main__":
    main()
