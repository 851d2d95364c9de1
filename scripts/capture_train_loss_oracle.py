"""Capture the reference's TRAINING-LOSS graph — the 7-term multi-scale
temporal loss, train PSNR, the val metrics, and backward gradients — by
running FISRnet.build_model (FISRnet.py:176-546) VERBATIM on deterministic
weights and a tiny synthetic corpus.

Why: train/losses.py + train/trainer.forward_windows were pinned against a
numpy port written from the same reading of the source (the exact failure
mode the round-5 PWC warp capture exposed). Here the truth is the
reference's own graph: its recurrent 3-window forward, the ss2 branch fed
by Tensor_slicer / tf_merge_seq_dim, the GT bicubic pyramid, all seven
L2 terms with their 1/2/4 scale weights and lambdas, tf.image.psnr, the
val-branch recnLoss/PSNR, and tf.gradients of total_loss through the
whole thing.

What runs VERBATIM: FISRnet.build_model on a shimmed instance — including
its corpus READING path (utils.read_mat_file / read_flo_file_5dim /
read_mat_file_warp + merge_seq_dim + the /H/2 flow normalization), fed
with corpus files WRITTEN BY OUR writers (fisr_tpu.data.matio/flo) — so
the on-disk training-data contract is pinned writer->reader across
implementations at the same time.

Shims: the standard capture set (scripts/capture_pwc_oracle.install_shims
+ SSIM_PIL/xavier/h5py.Dataset.value, scripts/capture_video_oracle.py).
The Adam/global_step variables created by the optimizer keep their
initializers (we only sess.run loss/gradient tensors, never the train op).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_train_loss_oracle.py
"""

import json
import os
import sys
import tempfile
import types

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("MPLBACKEND", "Agg")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

N, H, W = 4, 32, 32      # corpus: 4 samples of 32x32 LR (64x64 HR)
BATCH = 2                # train batch fed to the loss graph
VAL = 2                  # val_data_size == val_batch_size

LOSS_TERMS = ["recnLoss", "tmLoss", "tmmLoss", "tdLoss", "totalLoss_s1",
              "recnLoss_ss2", "tdLoss_ss2", "tmLoss_ss2", "totalLoss_ss2",
              "total_loss", "train_PSNR"]

GRAD_VARS = [  # representative leaves across depth + heads
    "FISRnet/level_1/enc/level_0/conv/0/w",
    "FISRnet/level_2/bottleneck/res_block/0/conv/1/w",
    "FISRnet/level_3/SR/conv/2/b",
]


def make_corpus(tmp):
    """Synthetic corpus in the reference's on-disk formats, written by OUR
    writers (fisr_tpu.data.matio / flo) — build_model's own readers then
    consume them (the contract pin)."""
    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data import matio

    rng = np.random.default_rng(53)
    data = rng.uniform(0, 255, (N, 5, H, W, 3)).astype(np.float32)
    label = rng.uniform(0, 255, (N, 7, 2 * H, 2 * W, 3)).astype(np.float32)
    flow = rng.uniform(-8, 8, (N, 8, H, W, 2)).astype(np.float32)
    flow_ss2 = rng.uniform(-12, 12, (N, 4, H, W, 2)).astype(np.float32)
    warp = rng.uniform(0, 255, (N, 8, H, W, 3)).astype(np.float32)
    warp_ss2 = rng.uniform(0, 255, (N, 4, H, W, 3)).astype(np.float32)

    paths = {
        "train_data_path": os.path.join(tmp, "LR.mat"),
        "train_label_path": os.path.join(tmp, "HR.mat"),
        "train_flow_data_path": os.path.join(tmp, "flow.flo"),
        "train_flow_ss2_data_path": os.path.join(tmp, "flow_ss2.flo"),
        "train_warped_data_path": os.path.join(tmp, "warp.mat"),
        "train_wapred_ss2_data_path": os.path.join(tmp, "warp_ss2.mat"),
    }
    matio.write_train_mat(paths["train_data_path"], "LR_data", data)
    matio.write_train_mat(paths["train_label_path"], "HR_data", label)
    flo_io.write_flo_5dim(flow, paths["train_flow_data_path"])
    flo_io.write_flo_5dim(flow_ss2, paths["train_flow_ss2_data_path"])
    matio.write_warp_mat(warp, paths["train_warped_data_path"])
    matio.write_warp_mat(warp_ss2, paths["train_wapred_ss2_data_path"])
    raw = {"data": data, "label": label, "flow": flow,
           "flow_ss2": flow_ss2, "warp": warp, "warp_ss2": warp_ss2}
    return paths, raw


def main():
    import capture_pwc_oracle as cpo
    import capture_video_oracle as cvo
    import tensorflow as tf_real

    v1 = tf_real.compat.v1
    v1.disable_eager_execution()
    cpo.install_shims(v1)
    cvo.install_extra_shims(v1)

    import FISRnet as ref_fisrnet  # noqa: E402

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
        paths, raw = make_corpus(tmp)

        fake = object.__new__(ref_fisrnet.FISRnet)
        for k, v in paths.items():
            setattr(fake, k, v)
        fake.scale_factor = 2
        fake.batch_size = BATCH
        fake.val_batch_size = VAL
        fake.val_data_size = VAL
        fake.init_lr = 1e-4
        fake.lr_type = "stair_decay"
        fake.lr_stair_decay_points = [80, 90]
        fake.lr_decreasing_factor = 0.1
        fake.lr_linear_decay_point = 80
        # reference-default lambdas (main.py:80-85)
        fake.recn_lambda = 1.0
        fake.tm1_lambda = 1.0
        fake.tm2_lambda = 0.1
        fake.tmm_lambda = 1.0
        fake.td_lambda = 0.1
        fake.ss2_lambda = 1.0
        fake.n_train_img_showed = 1  # image summaries (built, never run)

        g = v1.Graph()
        with g.as_default(), v1.Session() as sess:
            fake.sess = sess
            with sess.as_default():
                ref_fisrnet.FISRnet.build_model(fake)

            # deterministic model weights; Adam slots / global_step keep
            # their initializers (never run here)
            sess.run(v1.global_variables_initializer())
            gvars = [v for v in v1.global_variables()
                     if v.op.name in tf_vars]
            assert len(gvars) == len(tf_vars), (len(gvars), len(tf_vars))
            phs = {v.op.name: v1.placeholder(v1.float32, v.shape)
                   for v in gvars}
            sess.run([v.assign(phs[v.op.name]) for v in gvars],
                     {phs[v.op.name]: tf_vars[v.op.name] for v in gvars})

            # the exact processed arrays build_model derived from the
            # corpus files (merge_seq_dim + /255 + /H/2): feed + save
            feed = {
                fake.data_ph: fake.data[:BATCH],
                fake.label_ph: fake.label[:BATCH],
                fake.flow_ph: fake.flow[:BATCH],
                fake.flow_ss2_ph: fake.flow_ss2[:BATCH],
                fake.warp_ph: fake.warp[:BATCH],
                fake.warp_ss2_ph: fake.warp_ss2[:BATCH],
            }
            terms = sess.run([getattr(fake, t) for t in LOSS_TERMS], feed)

            grad_vars = []
            for frag in GRAD_VARS:
                match = [v for v in gvars if v.op.name == frag]
                assert match, frag
                grad_vars.append(match[0])
            grads = sess.run(v1.gradients(fake.total_loss, grad_vars), feed)

            val_feed = {
                fake.val_input_ph: fake.data_val[:VAL],
                fake.val_output_ph: fake.label_val[:VAL],
                fake.val_flow_ph: fake.flow_val[:VAL],
                fake.val_warp_ph: fake.warp_val[:VAL],
            }
            val_recn, val_psnr = sess.run(
                [fake.val_recnLoss, fake.val_PSNR], val_feed)

        arrays = {
            # processed batch (what the placeholders were fed)
            "data": fake.data[:BATCH], "label": fake.label[:BATCH],
            "flow": fake.flow[:BATCH], "flow_ss2": fake.flow_ss2[:BATCH],
            "warp": fake.warp[:BATCH], "warp_ss2": fake.warp_ss2[:BATCH],
            "val_data": fake.data_val[:VAL], "val_label": fake.label_val[:VAL],
            "val_flow": fake.flow_val[:VAL], "val_warp": fake.warp_val[:VAL],
            # raw corpus arrays (pre-write), for reader-glue tests
            **{f"raw_{k}": v for k, v in raw.items()},
            "loss_terms": np.asarray(terms, np.float64),
            "val_recnLoss": np.float64(val_recn),
            "val_PSNR": np.float64(val_psnr),
        }
        arrays.update({f"grad_{i}": gr for i, gr in enumerate(grads)})
        os.makedirs(OUT_DIR, exist_ok=True)
        np.savez_compressed(os.path.join(OUT_DIR, "train_loss.npz"), **arrays)
        manifest = {
            "tf_version": tf_real.__version__,
            "weights_digest": digest,
            "corpus": {"n": N, "h": H, "w": W, "batch": BATCH, "val": VAL},
            "loss_terms": LOSS_TERMS,
            "grad_vars": GRAD_VARS,
            "lambdas": "reference defaults (main.py:80-85): recn 1.0, "
                       "tm1 1.0, tm2 0.1, tmm 1.0, td 0.1, ss2 1.0 — "
                       "hard-coded in FISRnet.py's total-loss lines via "
                       "the instance attrs set here",
            "source": "FISRnet.build_model (FISRnet.py:176-546) verbatim; "
                      "corpus files written by fisr_tpu.data.matio/flo, "
                      "read by the reference's own utils readers",
        }
        with open(os.path.join(OUT_DIR, "train_loss_manifest.json"),
                  "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.write("\n")
        for t, v in zip(LOSS_TERMS, terms):
            print(f"# {t}: {v:.8f}")
        print(f"# val_recnLoss {val_recn:.8f}  val_PSNR {val_psnr:.5f}")
        print(f"# wrote {OUT_DIR}/train_loss.npz")


if __name__ == "__main__":
    main()
