"""Training subsystem: loss parity vs a straight numpy port, schedules,
checkpoint manager, and an end-to-end loss-decreases smoke run."""

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.data.synth import synthetic_store
from fisr_tpu.train import schedule
from fisr_tpu.train.checkpoint import CheckpointManager, derive_epoch_batch
from fisr_tpu.train.losses import LossWeights, temporal_loss
import pytest

from fisr_tpu.train.trainer import (adam_with_schedule, create_state,
                                    make_train_step, make_val_step)


# ---- numpy twin of FISRnet.py:312-486 --------------------------------------

def ref_l2(a, b):
    return np.mean(np.square(a - b))


def ref_groups2ovlp(g):
    return np.concatenate(
        [g[:, 0:1], g[:, 1:2], (g[:, 2:3] + g[:, 3:4]) / 2, g[:, 4:5],
         (g[:, 5:6] + g[:, 6:7]) / 2, g[:, 7:8], g[:, 8:9]], axis=1)


def ref_temporal_loss(pred3, pred_ss2_3, gt3, lam):
    recn = tm = tmm = td = 0.0
    for w, p, g in zip((1, 2, 4), pred3, gt3):
        for i in range(3):
            recn += w * ref_l2(p[:, 3 * i : 3 * i + 3], g[:, 2 * i : 2 * i + 3])
        for i in range(2):
            tm += w * ref_l2(p[:, 3 * i + 2], p[:, 3 * i + 3])
            tmm += w * ref_l2((p[:, 3 * i + 2] + p[:, 3 * i + 3]) / 2,
                              g[:, 2 * (i + 1)])
        ov = ref_groups2ovlp(p)
        for i in range(6):
            td += w * ref_l2(ov[:, i + 1] - ov[:, i], g[:, i + 1] - g[:, i])
    total_s1 = lam["recn"] * recn + lam["tm1"] * tm + lam["tmm"] * tmm + lam["td"] * td

    recn2 = td2 = tm2 = 0.0
    for w, p, pg, g in zip((1, 2, 4), pred_ss2_3, pred3, gt3):
        gss2 = np.concatenate([g[:, 1:2], g[:, 3:4], g[:, 5:6]], 1)
        recn2 += w * ref_l2(p, gss2)
        for i in range(2):
            td2 += w * ref_l2(p[:, i + 1] - p[:, i], gss2[:, i + 1] - gss2[:, i])
        ov = ref_groups2ovlp(pg)
        oss1 = np.concatenate([ov[:, 1:2], ov[:, 3:4], ov[:, 5:6]], 1)
        tm2 += w * ref_l2(p, oss1)
    total_ss2 = lam["recn"] * recn2 + lam["td"] * td2 + lam["tm2"] * tm2
    return total_s1 + lam["ss2"] * total_ss2


def test_temporal_loss_matches_numpy_reference():
    rng = np.random.default_rng(0)
    shapes = [(2, 9, 16, 16, 3), (2, 9, 8, 8, 3), (2, 9, 4, 4, 3)]
    pred3 = [rng.uniform(size=s).astype(np.float32) for s in shapes]
    pred_ss2 = [rng.uniform(size=(2, 3, *s[2:])).astype(np.float32) for s in shapes]
    gt3 = [rng.uniform(size=(2, 7, *s[2:])).astype(np.float32) for s in shapes]
    lam = dict(recn=1.0, tm1=1.0, tm2=0.1, tmm=1.0, td=0.1, ss2=1.0)
    want = ref_temporal_loss(pred3, pred_ss2, gt3, lam)
    got, metrics = temporal_loss(pred3, pred_ss2, gt3, LossWeights(**lam))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    assert set(metrics) >= {"recnLoss", "tmLoss", "tmmLoss", "tdLoss",
                            "recnLoss_ss2", "tdLoss_ss2", "tmLoss_ss2",
                            "totalLoss_s1", "totalLoss_ss2", "total_loss"}


def test_schedules():
    s = schedule.stair_decay(1e-4, [800, 900], 0.1)
    np.testing.assert_allclose(float(s(jnp.asarray(0))), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(jnp.asarray(850))), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(s(jnp.asarray(950))), 1e-6, rtol=1e-5)

    lin = schedule.linear_decay(1e-4, 100, 50, 10)
    np.testing.assert_allclose(float(lin(jnp.asarray(10 * 30))), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(lin(jnp.asarray(10 * 75))), 5e-5, rtol=1e-5)

    ms = schedule.multisteps([1e-4, 5e-5, 2.5e-5], [400, 600])
    np.testing.assert_allclose(float(ms(jnp.asarray(500))), 5e-5, rtol=1e-5)

    cyc = schedule.cyclic(1e-5, 5e-4, 100)
    np.testing.assert_allclose(float(cyc(jnp.asarray(100))), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(cyc(jnp.asarray(0))), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(cyc(jnp.asarray(200))), 1e-5, rtol=1e-5)


def test_derive_epoch_batch():
    assert derive_epoch_batch(1220 * 3 + 17, 1220) == (3, 17)


def test_checkpoint_manager(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2, best_mode="min")
    tree = {"a": np.arange(4.0), "b": {"c": np.float32(3.0)}}
    mgr.save(1, tree, metric=5.0)
    mgr.save(2, {**tree, "a": np.arange(4.0) + 1}, metric=3.0)
    mgr.save(3, {**tree, "a": np.arange(4.0) + 2}, metric=9.0)  # worst, evicted
    assert mgr.best_step() == 2
    got = mgr.restore(mgr.best_step())
    np.testing.assert_allclose(got["a"], np.arange(4.0) + 1)
    import os
    assert not os.path.exists(str(tmp_path / "ck" / "step_3"))


@pytest.mark.slow
def test_train_step_decreases_loss_and_val_runs():
    store = synthetic_store(n_samples=6, h=32, w=32, seed=0, val_size=2)
    opt = adam_with_schedule(schedule.no_decay(2e-4))
    state = create_state(jax.random.PRNGKey(0), opt)
    step = make_train_step(opt)

    batch = next(store.batches(batch_size=2, epoch_seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    first = None
    for i in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    assert int(state.step) == 8

    val = make_val_step()
    vb = next(store.val_batches(batch_size=2))
    out = val(state.params, {k: jnp.asarray(v) for k, v in vb.items()})
    assert np.isfinite(float(out["val_PSNR"]))
    assert float(out["val_recnLoss"]) >= 0


@pytest.mark.slow
def test_fit_resumes_mid_epoch(tmp_path):
    """Mid-epoch resume parity with FISRnet.py:596-606: a checkpoint whose
    step is NOT an epoch multiple must resume at (epoch, batch) and run only
    the epoch's remaining batches — ending exactly on the full-schedule
    step count, with the epoch's own seeded permutation continued."""
    from fisr_tpu.train.loop import fit
    from fisr_tpu.train.trainer import TrainState

    store = synthetic_store(n_samples=10, h=32, w=32, seed=0, val_size=2)
    iters = store.num_batches(2)  # 8 train samples, batch 2
    assert iters == 4
    ckpt = str(tmp_path / "ckpt")

    state = fit(store, ckpt_dir=ckpt, epochs=1, batch_size=2,
                val_batch_size=2, lr_type="no_decay", freq_display=100)
    assert int(state.step) == iters

    # simulate an interruption at epoch 1, batch 2 (step 6): overwrite the
    # per-epoch checkpoint with a mid-epoch one
    mid = TrainState(state.params, state.opt_state,
                     jnp.asarray(iters + 2, jnp.int32))
    CheckpointManager(ckpt).save(iters + 2, {"params": mid.params,
                                             "opt_state": mid.opt_state,
                                             "step": mid.step})
    # step_timeout_s arms the utils.watchdog heartbeat through a real run
    # (generous window: this slow lane shares the host with compiles)
    resumed = fit(store, ckpt_dir=ckpt, epochs=2, batch_size=2,
                  val_batch_size=2, lr_type="no_decay", freq_display=100,
                  step_timeout_s=600)
    # epoch 1 had 2 batches left: 6 + 2 = 8 = the full 2-epoch schedule
    assert int(resumed.step) == 2 * iters
