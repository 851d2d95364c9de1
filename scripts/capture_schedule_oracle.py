"""Capture tf.train.piecewise_constant — the reference's stair_decay lr
(FISRnet.py:232-240) and the PWC multisteps schedules (model_base.py:
307-334 via the non-vendored lr.py) — evaluated at every step across the
boundaries, as the oracle for train/schedule.stair_decay/multisteps.

Why: the boundary semantics are a classic off-by-one. TF keeps the LEFT
value AT a boundary step (switches at step > boundary); `step >= bounds`
drops one step early. This capture caught exactly that bug in our
schedules (fixed in the same commit).

The stair case uses the reference's own construction shape: boundaries =
[epoch * train_iter ...], values = [init * factor**k ...]. The multisteps
case uses the PWC values/boundaries (scaled down so the capture is dense).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_schedule_oracle.py
"""

import json
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

# stair: the reference's exact construction at train_iter=7, points [5, 9]
TRAIN_ITER = 7
STAIR_POINTS = [5, 9]
INIT_LR, FACTOR = 1e-4, 0.1
# multisteps: the PWC value ladder on /10000-scaled boundaries
MS_VALUES = [1e-4, 5e-5, 2.5e-5, 1.25e-5, 6.25e-6, 3.125e-6]
MS_BOUNDS = [40, 60, 80, 100, 120]
N_STEPS = 140


def main():
    import tensorflow as tf

    v1 = tf.compat.v1
    v1.disable_eager_execution()

    stair_bounds = [y * TRAIN_ITER for y in STAIR_POINTS]
    stair_values = [INIT_LR * FACTOR**k
                    for k in range(len(STAIR_POINTS) + 1)]

    g = v1.Graph()
    with g.as_default(), v1.Session() as sess:
        gs = v1.placeholder(v1.int32, [])
        stair = v1.train.piecewise_constant(gs, stair_bounds, stair_values)
        ms = v1.train.piecewise_constant(gs, MS_BOUNDS, MS_VALUES)
        stair_lr = np.array(
            [sess.run(stair, {gs: i}) for i in range(N_STEPS)], np.float64)
        ms_lr = np.array(
            [sess.run(ms, {gs: i}) for i in range(N_STEPS)], np.float64)

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(os.path.join(OUT_DIR, "schedule.npz"),
                        stair_lr=stair_lr, ms_lr=ms_lr)
    manifest = {
        "tf_version": tf.__version__,
        "n_steps": N_STEPS,
        "train_iter": TRAIN_ITER,
        "stair_points": STAIR_POINTS,
        "init_lr": INIT_LR, "factor": FACTOR,
        "ms_values": MS_VALUES, "ms_bounds": MS_BOUNDS,
        "source": "tf.train.piecewise_constant evaluated per step — the "
                  "reference's stair_decay construction (FISRnet.py:"
                  "232-240) and the PWC multisteps ladder",
    }
    with open(os.path.join(OUT_DIR, "schedule_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    sw = [i for i in range(1, N_STEPS) if stair_lr[i] != stair_lr[i - 1]]
    print(f"# stair switches at steps {sw} "
          f"(boundaries {stair_bounds} -> switch AFTER the boundary)")


if __name__ == "__main__":
    main()
