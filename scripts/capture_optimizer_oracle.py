"""Capture the reference's OPTIMIZER — tf.train.AdamOptimizer(lr).minimize
(FISRnet.py:489-491) driven by the stair-decay piecewise_constant lr
(FISRnet.py:232-240) — by running 3 real train steps of the verbatim
build_model graph and recording the updated variables.

Why: the training-loss oracle (scripts/capture_train_loss_oracle.py) pins
loss terms and tf.gradients, but the UPDATE itself was unpinned — and TF1
Adam is NOT optax.adam: TF applies  lr * sqrt(1-b2^t)/(1-b1^t) *
m/(sqrt(v)+eps)  with eps on the UNcorrected sqrt(v) (effective eps
31.6x smaller at t=1), while optax.adam uses m_hat/(sqrt(v_hat)+eps).
fisr_tpu.train.trainer.tf_adam implements the TF form; this capture is
its ground truth.

What runs VERBATIM: FISRnet.build_model (same shimmed instance as the
train-loss capture, identical deterministic weights + corpus) and then
3x sess.run(self.optim) on the single train batch — Adam slot variables,
beta-power accumulators, global_step, and the lr schedule all evolve
inside the reference's own graph.

Stored: full updated arrays for every leaf <= 25k elements (all biases +
the level-1 input conv) after step 1 and step 3, plus per-leaf float64
delta digests (l2 / maxabs / abssum vs the deterministic init) for ALL
leaves after step 3.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_optimizer_oracle.py
"""

import json
import os
import sys
import tempfile

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("MPLBACKEND", "Agg")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from capture_train_loss_oracle import BATCH, VAL, make_corpus  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

N_STEPS = 3
SMALL = 25_000  # full-array threshold (elements)


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
        paths, _ = make_corpus(tmp)

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
        fake.recn_lambda = 1.0
        fake.tm1_lambda = 1.0
        fake.tm2_lambda = 0.1
        fake.tmm_lambda = 1.0
        fake.td_lambda = 0.1
        fake.ss2_lambda = 1.0
        fake.n_train_img_showed = 1

        g = v1.Graph()
        with g.as_default(), v1.Session() as sess:
            fake.sess = sess
            with sess.as_default():
                ref_fisrnet.FISRnet.build_model(fake)

            sess.run(v1.global_variables_initializer())
            gvars = [v for v in v1.global_variables() if v.op.name in tf_vars]
            assert len(gvars) == len(tf_vars), (len(gvars), len(tf_vars))
            phs = {v.op.name: v1.placeholder(v1.float32, v.shape)
                   for v in gvars}
            sess.run([v.assign(phs[v.op.name]) for v in gvars],
                     {phs[v.op.name]: tf_vars[v.op.name] for v in gvars})

            feed = {
                fake.data_ph: fake.data[:BATCH],
                fake.label_ph: fake.label[:BATCH],
                fake.flow_ph: fake.flow[:BATCH],
                fake.flow_ss2_ph: fake.flow_ss2[:BATCH],
                fake.warp_ph: fake.warp[:BATCH],
                fake.warp_ss2_ph: fake.warp_ss2[:BATCH],
            }

            names = sorted(tf_vars)
            by_name = {v.op.name: v for v in gvars}
            lr_steps, snapshots = [], {}
            for step in range(1, N_STEPS + 1):
                # separate runs: fetches inside one sess.run are unordered
                # vs the optimizer's global_step increment
                lr_steps.append(float(sess.run(fake.lr)))
                sess.run(fake.optim, feed)
                gs = sess.run(fake.global_step)
                assert gs == step, (gs, step)
                if step in (1, N_STEPS):
                    snapshots[step] = sess.run([by_name[n] for n in names])

        arrays = {}
        small_names = [n for n in names if tf_vars[n].size <= SMALL]
        for step, vals in snapshots.items():
            vals = dict(zip(names, vals))
            for n in small_names:
                arrays[f"s{step}__{n}"] = vals[n]
            if step == N_STEPS:
                digs = np.zeros((len(names), 3), np.float64)
                for i, n in enumerate(names):
                    d = vals[n].astype(np.float64) - tf_vars[n]
                    digs[i] = [np.sqrt((d * d).sum()), np.abs(d).max(),
                               np.abs(d).sum()]
                arrays["delta_digests"] = digs

        os.makedirs(OUT_DIR, exist_ok=True)
        np.savez_compressed(os.path.join(OUT_DIR, "optimizer.npz"), **arrays)
        manifest = {
            "tf_version": tf_real.__version__,
            "weights_digest": digest,
            "n_steps": N_STEPS,
            "lr_steps": lr_steps,
            "names": names,
            "small_names": small_names,
            "digest_cols": ["l2", "maxabs", "abssum"],
            "source": "tf.train.AdamOptimizer(lr).minimize inside the "
                      "verbatim FISRnet.build_model graph (FISRnet.py:"
                      "489-491), stair_decay piecewise_constant lr "
                      "(:232-240), 3 sess.run(optim) steps on one batch",
        }
        with open(os.path.join(OUT_DIR, "optimizer_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"# lr per step: {lr_steps}")
        print(f"# {len(small_names)} small leaves stored full, "
              f"{len(names)} digests")
        print(f"# wrote {OUT_DIR}/optimizer.npz")


if __name__ == "__main__":
    main()
