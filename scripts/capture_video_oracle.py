"""Capture the reference's FULL FISR_for_video pipeline — flow -> .flo ->
warp -> .mat -> FISRnet -> PNG frames — by running the REFERENCE'S OWN code
end-to-end on deterministic weights, as the committed e2e oracle for our
infer/video.py.

Why: the three stages are each individually pinned (pwc graph, cv2 warp,
FISRnet graph, legacy resize — tests/test_tf_oracle.py), but the GLUE
between them — YUV<->RGB conversions, the x2-upscale flow trick, /2 flow
halving, bidirectional pair ordering, the 29-channel window assembly with
its /96/2 and /255 normalizations, the patch/stitch loop, and the on-disk
.flo/.mat contracts — was pinned only by our reading of the source. The
round-5 PWC capture proved exactly this class of bug (a warp convention
quirk) survives every self-consistent test; this capture closes the same
hole for the whole user-facing video pipeline.

What runs VERBATIM from /root/reference:
  * FISR_for_video_pwcnet_predict_from_img_test.FISR_for_video_Compute_Flow
    (the function itself: YUV2RGB -> x2 resize -> uint8 -> ModelPWCNet
    mode='test' predict_from_img_pairs -> AA downscale -> /2 -> write_flow)
  * FISR_for_video_warp_img_with_flo.FISR_for_video_Warp_Img (YUV2RGB,
    cv2.remap warp_flow at flow*0.5, RGB2YUV, .mat write)
  * FISRnet.FISR_for_video (FISRnet.py:937-1084 run unbound on a shimmed
    instance: .flo/.mat readers, window assembly, /96/2 + /255 + clips,
    get_HW_boundary/trim_patch_boundary patch loop, real Saver restore,
    YUV2RGB_matlab PNG save)
  * ModelPWCNet's full test-mode lifecycle (build_graph, init_saver,
    load_ckpt restore of a REAL Saver checkpoint, adapt_x pad, postproc)

What is shimmed (documented deviations, all away from the compared math):
  * skimage.transform.resize — not installed here; substituted with a
    cv2-based resize (INTER_LINEAR; gaussian pre-blur sigma=(f-1)/2 when
    anti_aliasing=True, skimage's documented AA). Only the flow stage's
    up/down resizes run through it; our implementation uses TF1-legacy
    bilinear there (a documented parity deviation either way), so the
    flow-stage comparison bound is loose and the shim choice is recorded
    in the manifest.
  * hdf5storage.write — not installed; substituted with our
    fisr_tpu.data.matio.write_warp_mat, which claims the same contract.
    The reference's OWN read_mat_file_warp (h5py) then reads the file
    back inside FISR_for_video — pinning our writer against their reader.
  * h5py.Dataset.value — removed in h5py 3.x; re-added as a property so
    the reference's readers run unmodified.
  * device strings -> CPU; ModelPWCNet x_shape made static (our conv/warp
    shims need static shapes; padding still exercised by the pad case).
  * tf.compat.v1 layer/costvol/warp shims: scripts/capture_pwc_oracle.py.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_video_oracle.py
"""

import importlib
import json
import os
import shutil
import sys
import tempfile
import types

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("MPLBACKEND", "Agg")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

H, W = 64, 128           # scene size: 32-multiples; x2 -> 64-multiples (no pad)
NUM_FR = 4               # -> 3 adjacent pairs, 2 FISR windows
PATCH = (1, 2)           # FISR_test_patch: exercises the stitch loop
PAD_H, PAD_W = 80, 112   # pad case: x2 -> 160x224, adapt_x pads to 192x256


def _skimage_resize_shim():
    """cv2 substitute for skimage.transform.resize (see module docstring)."""
    import cv2

    def resize(image, output_shape, anti_aliasing=None, **kw):
        image = np.asarray(image, np.float64)
        if image.ndim == 3 and len(output_shape) in (2, 3):
            oh, ow = int(output_shape[0]), int(output_shape[1])
            src = image
            if anti_aliasing:
                fy = image.shape[0] / oh
                fx = image.shape[1] / ow
                sy, sx = max(0.0, (fy - 1) / 2), max(0.0, (fx - 1) / 2)
                if sy > 0 or sx > 0:
                    src = cv2.GaussianBlur(src, (0, 0), sigmaX=max(sx, 1e-6),
                                           sigmaY=max(sy, 1e-6))
            return cv2.resize(src, (ow, oh), interpolation=cv2.INTER_LINEAR)
        if image.ndim == 4 and len(output_shape) == 4:
            assert output_shape[0] == image.shape[0]
            assert output_shape[3] == image.shape[3]
            return np.stack([resize(im, output_shape[1:], anti_aliasing)
                             for im in image])
        raise NotImplementedError((image.shape, output_shape))

    return resize


def install_extra_shims(v1):
    """Shims beyond capture_pwc_oracle.install_shims, for the video chain."""
    # FISRnet.py / ops.py surface
    ssim_pil = types.ModuleType("SSIM_PIL")
    ssim_pil.compare_ssim = lambda *a, **k: float("nan")
    sys.modules["SSIM_PIL"] = ssim_pil
    layers = types.ModuleType("tensorflow.contrib.layers")
    layers.xavier_initializer = lambda uniform=True: (
        v1.glorot_normal_initializer())
    sys.modules["tensorflow.contrib.layers"] = layers
    sys.modules["tensorflow"].contrib.layers = layers

    # flow script surface
    skimage = types.ModuleType("skimage")
    transform = types.ModuleType("skimage.transform")
    transform.resize = _skimage_resize_shim()
    skimage.transform = transform
    sys.modules.update({"skimage": skimage, "skimage.transform": transform})

    # warp script surface: route hdf5storage.write through OUR .mat writer;
    # the reference's own h5py reader then consumes the file (the pin).
    from fisr_tpu.data.matio import write_warp_mat

    h5s = types.ModuleType("hdf5storage")

    def write(data, path, filename, matlab_compatible=True):
        assert set(data) == {u"pred"}, sorted(data)
        write_warp_mat(np.asarray(data[u"pred"], np.float32),
                       os.path.join(path, filename) if path not in (".", "")
                       else filename)

    h5s.write = write
    sys.modules["hdf5storage"] = h5s

    # h5py 3.x removed Dataset.value (the reference readers use it)
    import h5py

    if not hasattr(h5py.Dataset, "value"):
        h5py.Dataset.value = property(lambda self: self[()])

    # the reference reads frame folders with bare glob.glob and relies on
    # the OS returning name order (true on its original platform, not on
    # this filesystem) — pin the sorted contract our list_pngs implements
    import glob as _glob

    if not getattr(_glob, "_sorted_shim", False):
        _orig = _glob.glob

        def _sorted_glob(*a, **k):
            return sorted(_orig(*a, **k))

        _glob.glob = _sorted_glob
        _glob._sorted_shim = True


def make_scene():
    """Smooth, moving YUV uint8 frames (smooth content keeps interpolator
    noise — the loose-bound part of the comparison — small)."""
    import cv2

    rng = np.random.default_rng(41)
    base = rng.uniform(16, 235, (H // 8 + 4, W // 8 + 4, 3)).astype(np.float32)
    base = cv2.resize(base, (W * 2, H * 2), interpolation=cv2.INTER_CUBIC)
    frames = []
    for t in range(NUM_FR):
        # global translation ~1.5 px/frame + slight brightness drift
        m = np.float32([[1, 0, -1.5 * t - W // 2], [0, 1, 1.0 * t - H // 2]])
        fr = cv2.warpAffine(base, m, (W, H), flags=cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REFLECT)
        frames.append(np.clip(fr + 2.0 * t, 0, 255).astype(np.uint8))
    return np.stack(frames)  # [NUM_FR, H, W, 3] uint8 YUV


def deterministic_weights():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from fisr_tpu.convert.oracle import deterministic_tf_vars, tf_vars_digest
    from fisr_tpu.convert.tf_import import export_fisrnet, export_pwcnet
    from fisr_tpu.models import fisrnet, pwcnet

    pwc_shapes = {n: a.shape for n, a in export_pwcnet(
        pwcnet.init_params(jax.random.PRNGKey(0))).items()}
    fisr_shapes = {n: a.shape for n, a in export_fisrnet(
        fisrnet.init_params(jax.random.PRNGKey(0))).items()}
    pwc_vars = deterministic_tf_vars(pwc_shapes)
    fisr_vars = deterministic_tf_vars(fisr_shapes)
    return (pwc_vars, tf_vars_digest(pwc_vars),
            fisr_vars, tf_vars_digest(fisr_vars))


def assign_all(v1, sess, tf_vars):
    gvars = v1.global_variables()
    missing = [v.op.name for v in gvars if v.op.name not in tf_vars]
    assert not missing, missing[:5]
    phs = {v.op.name: v1.placeholder(v1.float32, v.shape) for v in gvars}
    assigns = [v.assign(phs[v.op.name]) for v in gvars]
    sess.run(assigns, {phs[v.op.name]: tf_vars[v.op.name] for v in gvars})


def save_pwc_ckpt(v1, pwc_vars, prefix):
    from FISR_tfoptflow.model_pwcnet import ModelPWCNet

    mdl = object.__new__(ModelPWCNet)
    mdl.opts = {"pyr_lvls": 6, "flow_pred_lvl": 2, "search_range": 4,
                "use_dense_cx": True, "use_res_cx": True}
    mdl.dbg = False
    g = v1.Graph()
    with g.as_default():
        x_ph = v1.placeholder(v1.float32, (1, 2, 64, 64, 3))
        mdl.nn(x_ph)
        saver = v1.train.Saver()
        with v1.Session() as sess:
            assign_all(v1, sess, pwc_vars)
            saver.save(sess, prefix, write_meta_graph=False)


def save_fisr_ckpt(v1, ref_fisrnet, fisr_vars, ckpt_root):
    ck_dir = os.path.join(ckpt_root, "FISRnet_exp0")
    os.makedirs(ck_dir, exist_ok=True)
    g = v1.Graph()
    with g.as_default():
        ph = v1.placeholder(v1.float32, (8, 192, 192, 29))
        ref_fisrnet.FISRnet.model(None, ph, 2, reuse=False, scope="FISRnet")
        saver = v1.train.Saver()
        with v1.Session() as sess:
            assign_all(v1, sess, fisr_vars)
            saver.save(sess, os.path.join(ck_dir, "FISRnet"),
                       global_step=122, write_meta_graph=False)


def capture_pad_case(v1, pwc_vars):
    """predict_from_img_pairs on a non-64-multiple uint8 RGB pair: pins the
    /255 + zero-pad-to-64 + crop-back glue (adapt_x/postproc_y_hat_test) at
    TIGHT tolerance (same math both sides, no resize in the loop)."""
    from FISR_tfoptflow.model_pwcnet import (ModelPWCNet,
                                             _DEFAULT_PWCNET_TEST_OPTIONS)
    from copy import deepcopy
    import cv2

    rng = np.random.default_rng(43)
    small = rng.uniform(0, 255, (PAD_H // 8, PAD_W // 8, 3)).astype(np.float32)
    img1 = cv2.resize(small, (PAD_W, PAD_H), interpolation=cv2.INTER_CUBIC)
    img1 = np.clip(img1, 0, 255).astype(np.uint8)
    m = np.float32([[1, 0, 2.0], [0, 1, -1.5]])
    img2 = cv2.warpAffine(img1.astype(np.float32), m, (PAD_W, PAD_H),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)
    img2 = np.clip(img2, 0, 255).astype(np.uint8)

    mdl = object.__new__(ModelPWCNet)
    mdl.opts = deepcopy(_DEFAULT_PWCNET_TEST_OPTIONS)
    mdl.opts.update({"batch_size": 1, "pyr_lvls": 6, "flow_pred_lvl": 2,
                     "use_dense_cx": True, "use_res_cx": True,
                     "gpu_devices": ["/device:CPU:0"],
                     "controller": "/device:CPU:0"})
    mdl.dbg = False
    mdl.mode = "test"
    mdl.graph = v1.Graph()
    with mdl.graph.as_default():
        # static placeholder at the PADDED size (192x256 <- 160x224 after x1;
        # here the pair is fed at native res, padded 80x112 -> 128x128)
        ph_h = -(-PAD_H // 64) * 64
        ph_w = -(-PAD_W // 64) * 64
        mdl.x_tnsr = v1.placeholder(v1.float32, (1, 2, ph_h, ph_w, 3), "x")
        mdl.flow_pred_tnsr, mdl.flow_pyr_tnsr = mdl.nn(mdl.x_tnsr)
        mdl.y_hat_test_tnsr = [mdl.flow_pred_tnsr, mdl.flow_pyr_tnsr]
        mdl.sess = v1.Session()
        with mdl.sess.as_default():
            assign_all(v1, mdl.sess, pwc_vars)
    flows = mdl.predict_from_img_pairs([(img1, img2)], batch_size=1)
    mdl.sess.close()
    flow = np.asarray(flows[0], np.float32)
    assert flow.shape == (PAD_H, PAD_W, 2), flow.shape
    return img1, img2, flow


def capture_float_stitched(v1, ref_fisrnet, fisr_vars, ref_utils,
                           frames, flows, warps_norm):
    """The FISR stage's per-window stitched FLOAT prediction (the verbatim
    method only saves uint8 PNGs): same assembly + patch loop, via the
    reference's own utils functions and model graph."""
    num_patch = PATCH
    boundary = 32
    h = H - H % (32 * num_patch[0])
    w = W - W % (32 * num_patch[1])
    sf = 2

    flow_win = np.concatenate((flows[0:NUM_FR - 2], flows[1:NUM_FR - 1]),
                              axis=1)
    flow_win = ref_utils.merge_seq_dim(flow_win)
    warp_win = np.concatenate((warps_norm[0:NUM_FR - 2],
                               warps_norm[1:NUM_FR - 1]), axis=1)
    warp_win = ref_utils.merge_seq_dim(warp_win)

    g = v1.Graph()
    preds = []
    with g.as_default():
        ph0 = v1.placeholder(v1.float32, (8, 192, 192, 29))
        ref_fisrnet.FISRnet.model(None, ph0, sf, reuse=False, scope="FISRnet")
        with v1.Session() as sess:
            assign_all(v1, sess, fisr_vars)
            patch_phs = {}
            for fr in range(NUM_FR - 2):
                img = np.concatenate([frames[fr + i] for i in range(3)],
                                     axis=2)[:h, :w, :]
                img = np.expand_dims(
                    np.clip(np.array(img, np.double) / 255., 0, 1), 0)
                fl = np.expand_dims(
                    np.clip(flow_win[fr, :h, :w, :] / 96. / 2., -1, 1), 0)
                wp = np.expand_dims(
                    np.clip(warp_win[fr, :h, :w, :], 0, 1), 0)
                inp = np.concatenate([img, fl, wp], axis=3)
                full = np.zeros((h * sf, w * sf, 9))
                for p in range(num_patch[0] * num_patch[1]):
                    pH, pW = p // num_patch[1], p % num_patch[1]
                    sH, sW = h // num_patch[0], w // num_patch[1]
                    (H_lo, H_hi, W_lo, W_hi, add_H, add_W) = \
                        ref_utils.get_HW_boundary(boundary, h, w, pH, sH,
                                                  pW, sW)
                    shape = (1, sH + add_H, sW + add_W, 29)
                    if shape not in patch_phs:
                        ph = v1.placeholder(v1.float32, shape)
                        pred_t = ref_fisrnet.FISRnet.model(
                            None, ph, sf, reuse=True, scope="FISRnet")[2]
                        patch_phs[shape] = (ph, pred_t)
                    ph, pred_t = patch_phs[shape]
                    patch = sess.run(pred_t,
                                     {ph: inp[:, H_lo:H_hi, W_lo:W_hi, :]})
                    patch = ref_utils.trim_patch_boundary(
                        patch, boundary, h, w, pH, sH, pW, sW, sf)
                    full[pH * sH * sf:(pH + 1) * sH * sf,
                         pW * sW * sf:(pW + 1) * sW * sf, :] = \
                        np.squeeze(patch)
                preds.append(np.clip(full, 0, 1).astype(np.float32))
    return np.stack(preds)  # [NUM_FR-2, h*2, w*2, 9] float32 in [0,1]


def main():
    import capture_pwc_oracle as cpo
    import tensorflow as tf_real

    v1 = tf_real.compat.v1
    v1.disable_eager_execution()
    cpo.install_shims(v1)
    install_extra_shims(v1)

    import cv2
    import FISRnet as ref_fisrnet  # noqa: E402
    import utils as ref_utils      # noqa: E402
    import FISR_tfoptflow.model_pwcnet as ref_mp  # noqa: E402

    pwc_vars, pwc_digest, fisr_vars, fisr_digest = deterministic_weights()

    frames = make_scene()
    tmp = tempfile.mkdtemp(prefix="video_oracle_")
    old_cwd = os.getcwd()
    try:
        scene_dir = os.path.join(tmp, "scene1")
        os.makedirs(scene_dir)
        import glob as _glob
        from PIL import Image

        names = []
        for i, fr in enumerate(frames):
            p = os.path.join(scene_dir, f"fr_{i:05d}.png")
            Image.fromarray(fr).save(p)
            names.append(p)
        got = _glob.glob(os.path.join(scene_dir, "*.png"))
        assert got == names, "sorted-glob shim not effective"

        # --- real Saver ckpts for both models ---------------------------
        os.makedirs(os.path.join(tmp, "FISR_tfoptflow"))
        save_pwc_ckpt(v1, pwc_vars,
                      os.path.join(tmp, "FISR_tfoptflow", "pwc.ckpt"))
        ckpt_root = os.path.join(tmp, "ckpts")
        save_fisr_ckpt(v1, ref_fisrnet, fisr_vars, ckpt_root)

        # --- stage 1: flow (reference function, verbatim) ---------------
        flow_mod = importlib.import_module(
            "FISR_tfoptflow.FISR_for_video_pwcnet_predict_from_img_test")
        flow_mod.ckpt_path = "/pwc.ckpt"  # load_ckpt prepends ./FISR_tfoptflow
        flow_mod.gpu_devices = ["/device:CPU:0"]
        flow_mod.controller = "/device:CPU:0"
        # our conv/costvol/warp shims need static shapes (the reference
        # runs these placeholders dynamic; the math is shape-independent)
        ref_mp._DEFAULT_PWCNET_TEST_OPTIONS["x_shape"] = [2, H * 2, W * 2, 3]
        ref_mp._DEFAULT_PWCNET_TEST_OPTIONS["y_shape"] = [H * 2, W * 2, 2]
        args = types.SimpleNamespace(frame_folder_path=scene_dir,
                                     FISR_input_size=(H, W),
                                     frame_num=NUM_FR)
        os.chdir(tmp)
        flow_file = flow_mod.FISR_for_video_Compute_Flow(args)
        flows = ref_utils.read_flo_file_5dim(flow_file)
        assert flows.shape == (NUM_FR - 1, 2, H, W, 2), flows.shape
        print(f"# flows: {flows.shape} |max| {np.abs(flows).max():.3f}")

        # --- stage 2: warp (reference function; .mat via our writer) ----
        warp_mod = importlib.import_module(
            "FISR_tfoptflow.FISR_for_video_warp_img_with_flo")
        warp_file = warp_mod.FISR_for_video_Warp_Img(args, flow_file)
        warps_norm = ref_utils.read_mat_file_warp(warp_file, "pred")
        assert warps_norm.shape == (NUM_FR - 1, 2, H, W, 3), warps_norm.shape
        print(f"# warps(norm): {warps_norm.shape} "
              f"range [{warps_norm.min():.3f}, {warps_norm.max():.3f}]")

        # --- stage 3: FISRnet video phase (reference method, verbatim) --
        fake = object.__new__(ref_fisrnet.FISRnet)
        fake.scale_factor = 2
        fake.frame_folder_path = scene_dir
        fake.frame_num = NUM_FR
        fake.FISR_test_patch = PATCH
        fake.test_patch = PATCH
        fake.FISR_input_size = (H, W)
        fake.test_img_dir = os.path.join(tmp, "test_img")
        fake.checkpoint_dir = ckpt_root
        fake.exp_num = 0
        g = v1.Graph()
        with g.as_default(), v1.Session() as sess:
            fake.sess = sess
            with sess.as_default():
                ref_fisrnet.FISRnet.FISR_for_video(fake, flow_file, warp_file)
        out_dir = os.path.join(scene_dir, "FISR_frames")
        n_out = 2 * (NUM_FR - 2) + 1  # overlap frames overwritten (ref :1064)
        digits = int(np.ceil(np.log10(2 * (NUM_FR - 1))))
        final_yuv = np.stack([
            np.array(Image.open(os.path.join(
                out_dir, f"pred_YUV_{str(i).zfill(digits)}.png")))
            for i in range(n_out)])
        final_rgb = np.stack([
            np.array(Image.open(os.path.join(
                out_dir, f"pred_{str(i).zfill(digits)}.png")))
            for i in range(n_out)])
        print(f"# final frames: {final_yuv.shape} uint8")

        # --- stage 3b: float stitched preds (same graph + utils) --------
        stitched = capture_float_stitched(v1, ref_fisrnet, fisr_vars,
                                          ref_utils, frames, flows,
                                          warps_norm)
        # sanity: float preds must reproduce the verbatim method's PNGs
        # (the later window overwrites the overlap, FISRnet.py:1064)
        redo = np.zeros_like(final_yuv)
        for fr in range(NUM_FR - 2):
            u8 = np.uint8(stitched[fr] * 255)
            for s in range(3):
                redo[fr * 2 + s] = u8[:, :, 3 * s:3 * s + 3]
        np.testing.assert_array_equal(redo, final_yuv)
        print("# float stitched preds reproduce the verbatim method's PNGs")

        # --- amplified-flow chain ----------------------------------------
        # with random deterministic weights the predicted flows are tiny
        # (|max| ~0.04 px), so the +0.5-flow warps are near-identity and a
        # sign/axis-convention bug in OUR warp/assembly glue could hide
        # inside the comparison bound. Re-run the warp+FISR stages (same
        # verbatim readers/functions) on the same flows amplified to ~6 px
        # — the stage-level pins use THIS chain; the unamplified chain
        # remains the true e2e flow->warp->FISRnet comparison.
        amp = float(np.round(6.0 / np.abs(flows).max(), 2))
        flows_amp = (flows * amp).astype(np.float32)
        flow_amp_file = os.path.join(scene_dir, "scene1_amp.flo")
        flow_mod.write_flow(flows_amp, flow_amp_file)
        os.remove(warp_file)  # the warp function re-derives the same name
        warp_amp_file = warp_mod.FISR_for_video_Warp_Img(args, flow_amp_file)
        warps_amp_norm = ref_utils.read_mat_file_warp(warp_amp_file, "pred")
        stitched_amp = capture_float_stitched(v1, ref_fisrnet, fisr_vars,
                                              ref_utils, frames, flows_amp,
                                              warps_amp_norm)
        print(f"# amplified chain: amp={amp} "
              f"|max flow| {np.abs(flows_amp).max():.3f} px")

        # --- pad case ----------------------------------------------------
        os.chdir(old_cwd)
        pad1, pad2, pad_flow = capture_pad_case(v1, pwc_vars)
        print(f"# pad-case flow: {pad_flow.shape} "
              f"|max| {np.abs(pad_flow).max():.3f}")

        # --- persist ------------------------------------------------------
        os.makedirs(OUT_DIR, exist_ok=True)
        shutil.copy(flow_file, os.path.join(OUT_DIR, "video_ref.flo"))
        np.savez_compressed(
            os.path.join(OUT_DIR, "video_pipeline.npz"),
            frames=frames, flows=flows.astype(np.float32),
            warps_norm=warps_norm.astype(np.float32),
            stitched=stitched, final_yuv=final_yuv, final_rgb=final_rgb,
            flows_amp=flows_amp,
            warps_amp_norm=warps_amp_norm.astype(np.float32),
            stitched_amp=stitched_amp,
            pad_img1=pad1, pad_img2=pad2, pad_flow=pad_flow)
        manifest = {
            "tf_version": tf_real.__version__,
            "cv2_version": cv2.__version__,
            "pwc_weights_digest": pwc_digest,
            "fisr_weights_digest": fisr_digest,
            "scene": {"h": H, "w": W, "num_fr": NUM_FR, "patch": list(PATCH)},
            "flow_amp": amp,
            "pad_case": {"h": PAD_H, "w": PAD_W},
            "verbatim": [
                "FISR_for_video_pwcnet_predict_from_img_test."
                "FISR_for_video_Compute_Flow (:84-147)",
                "FISR_for_video_warp_img_with_flo.FISR_for_video_Warp_Img "
                "(:97-151)",
                "FISRnet.FISR_for_video (FISRnet.py:937-1084)",
                "ModelPWCNet mode='test' lifecycle incl. real Saver restore",
            ],
            "shims": [
                "skimage.transform.resize -> cv2 INTER_LINEAR (+gaussian "
                "sigma=(f-1)/2 when anti_aliasing) — skimage not installed; "
                "affects only the flow stage's resizes (loose-bound part)",
                "hdf5storage.write -> fisr_tpu.data.matio.write_warp_mat "
                "(read back by the reference's own read_mat_file_warp)",
                "h5py.Dataset.value property (removed in h5py 3.x)",
                "glob.glob -> sorted(glob.glob) (the reference relies on "
                "OS name-order directory listing)",
                "static x_shape, CPU devices",
                "tf.compat.v1 layer/costvol/warp shims "
                "(scripts/capture_pwc_oracle.py)",
            ],
        }
        with open(os.path.join(OUT_DIR, "video_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"# wrote {OUT_DIR}/video_pipeline.npz + video_ref.flo")
    finally:
        os.chdir(old_cwd)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
