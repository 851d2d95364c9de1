"""Epoch-level training driver (console format + checkpoints + metrics log).

Drives fisr_tpu.train.trainer the way FISRnet.train() drives its session
loop (FISRnet.py:580-744): per-epoch shuffle, periodic console status, epoch
averages, per-epoch validation, per-epoch checkpoint keyed on global step,
and resume that derives (epoch, batch) from the restored step. Metrics go to
a JSONL file per experiment (TB event-file writing needs TF; the JSONL is
trivially convertible).
"""

from __future__ import annotations

import itertools
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.data.dataset import TrainStore
from fisr_tpu.ops.conv import F32, Policy
from fisr_tpu.train import schedule as sched
from fisr_tpu.train.checkpoint import CheckpointManager, derive_epoch_batch
from fisr_tpu.train.losses import LossWeights
from fisr_tpu.train.trainer import (TrainState, adam_with_schedule,
                                    create_state, make_train_step, make_val_step)

__all__ = ["fit", "prefetch_to_device"]


def prefetch_to_device(batch_iter, size: int = 2, sharding=None):
    """Async host->device batch prefetch.

    `jax.device_put` is asynchronous: enqueueing the NEXT batch's transfer
    before the current step consumes it overlaps the copy with compute.
    Through slow host links (this environment's relay moves ~40 MB/s — see
    PERF.md) this is the difference between I/O-bound and compute-bound
    training.
    """
    import collections

    q = collections.deque()

    def put(b):
        if sharding is not None:
            return {k: jax.device_put(v, sharding(v.ndim)) for k, v in b.items()}
        return {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()}

    for b in batch_iter:
        q.append(put(b))
        if len(q) >= size:
            yield q.popleft()
    while q:
        yield q.popleft()


def build_schedule(lr_type: str, init_lr: float, iters_per_epoch: int,
                   epochs: int, stair_points, stair_factor: float,
                   linear_decay_point: int):
    if lr_type == "stair_decay":
        bounds = [p * iters_per_epoch for p in stair_points]
        return sched.stair_decay(init_lr, bounds, stair_factor)
    if lr_type == "linear_decay":
        return sched.linear_decay(init_lr, epochs, linear_decay_point,
                                  iters_per_epoch)
    return sched.no_decay(init_lr)


def fit(
    store: TrainStore,
    ckpt_dir: str,
    log_dir: Optional[str] = None,
    epochs: int = 100,
    batch_size: int = 8,
    val_batch_size: int = 2,
    init_lr: float = 1e-4,
    lr_type: str = "stair_decay",
    lr_stair_decay_points=(80, 90),
    lr_decreasing_factor: float = 0.1,
    lr_linear_decay_point: int = 50,
    loss_weights: LossWeights = LossWeights(),
    freq_display: int = 100,
    policy: Policy = F32,
    seed: int = 0,
    resume: bool = True,
    mesh=None,
    step_timeout_s: Optional[float] = None,
) -> TrainState:
    """If `mesh` is given, batches are sharded over its 'data' axis and
    params replicated — multi-chip DP with zero further changes (XLA inserts
    the gradient psum over ICI).

    `step_timeout_s` arms a utils.watchdog.Heartbeat: if no train step /
    val batch completes within that window the process dumps all thread
    stacks and exits with status 86, so a supervisor restarts it and this
    same function resumes from the last per-epoch checkpoint. Size it to
    cover first-call compile (10-70 s on the TPU relay) plus margin;
    None (default) disarms it."""
    iters = store.num_batches(batch_size)
    schedule_fn = build_schedule(lr_type, init_lr, iters, epochs,
                                 lr_stair_decay_points, lr_decreasing_factor,
                                 lr_linear_decay_point)
    opt = adam_with_schedule(schedule_fn)
    state = create_state(jax.random.PRNGKey(seed), opt)
    step_fn = make_train_step(opt, loss_weights, policy)
    val_fn = make_val_step(policy)

    mgr = CheckpointManager(ckpt_dir, max_to_keep=1)
    start_epoch = 0
    start_batch = 0
    if resume and mgr.latest_step() is not None:
        tree = mgr.restore(item={"params": state.params,
                                 "opt_state": state.opt_state,
                                 "step": state.step})
        state = TrainState(tree["params"], tree["opt_state"], tree["step"])
        start_epoch, start_batch = derive_epoch_batch(int(state.step), iters)
        print(f" [*] resumed from step {int(state.step)} "
              f"(epoch {start_epoch}, batch {start_batch})")

    metrics_path = None
    tb = None
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        metrics_path = os.path.join(log_dir, "metrics.jsonl")
        from fisr_tpu.utils.tb_writer import TBLogger

        tb = TBLogger(log_dir)

    if mesh is not None:
        from fisr_tpu.core.mesh import replicated

        state = jax.device_put(state, replicated(mesh))

    from fisr_tpu.utils.watchdog import Heartbeat

    hb = (Heartbeat(step_timeout_s, name="fit").start()
          if step_timeout_s else None)
    t_start = time.time()
    # finally: even an escaping exception (OOM, bad batch) must disarm
    # the watchdog, or the armed monitor os._exit(86)s a process that is
    # no longer hung and masks the real error (ADVICE r4).
    try:
        for epoch in range(start_epoch, epochs):
            sums, count = {}, 0
            batches = store.batches(batch_size, epoch_seed=seed + epoch)
            # mid-epoch resume (FISRnet.py:596-606): the epoch permutation is
            # epoch-seeded, so skipping the first `start_batch` draws continues
            # the interrupted epoch on exactly the batches it had left
            skip = start_batch if epoch == start_epoch else 0
            if skip:
                batches = itertools.islice(batches, skip, None)
            if mesh is not None:
                from fisr_tpu.core.mesh import data_sharding

                batches = prefetch_to_device(
                    batches, sharding=lambda nd: data_sharding(mesh, nd))
            else:
                batches = prefetch_to_device(batches)
            for idx, batch in enumerate(batches, start=skip):
                state, m = step_fn(state, batch)
                count += 1
                for k, v in m.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                if hb is not None:
                    hb.beat()  # after float() readback = real device progress
                if idx % freq_display == 0:
                    print(f"Epoch: [{epoch:3d}], [{idx:4d}/{iters:4d}], "
                          f"time: {(time.time() - t_start) / 60:4.2f}(min), "
                          f"train_PSNR: {float(m['train_PSNR']):.3f}, "
                          f"total_loss: {float(m['total_loss']):.6f}", flush=True)
            epoch_means = {k: v / max(count, 1) for k, v in sums.items()}

            val_sums, val_count = {}, 0
            for vb in store.val_batches(val_batch_size):
                vm = val_fn(state.params, {k: jnp.asarray(v) for k, v in vb.items()})
                val_count += 1
                for k, v in vm.items():
                    val_sums[k] = val_sums.get(k, 0.0) + float(v)
                if hb is not None:
                    hb.beat()
            val_means = {k: v / max(val_count, 1) for k, v in val_sums.items()}
            print(f"######### Validation epoch [{epoch}/{epochs}]: "
                  f"val_PSNR {val_means.get('val_PSNR', float('nan')):.3f} dB, "
                  f"recnLoss {val_means.get('val_recnLoss', float('nan')):.6f} #########",
                  flush=True)

            if metrics_path:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps({"epoch": epoch, "step": int(state.step),
                                        **epoch_means, **val_means}) + "\n")
            if tb is not None:
                tb.log_scalars({**epoch_means, **val_means}, int(state.step))
                # image summaries (YUV, like FISRnet.py:555-565): first val
                # sample's merged prediction vs GT
                try:
                    from fisr_tpu.ops.seq import groups_to_overlap, split_seq_dim
                    from fisr_tpu.train.trainer import forward_windows

                    vb = next(store.val_batches(1))
                    vb = {k: jnp.asarray(v) for k, v in vb.items()}
                    groups, _ = forward_windows(state.params, vb, policy,
                                                with_ss2=False)
                    pred = groups_to_overlap(groups[0])[0, 3]
                    gt = split_seq_dim(vb["label"])[0, 3]
                    to_u8 = lambda a: np.uint8(np.clip(np.asarray(a, np.float32),
                                                       0, 1) * 255)
                    tb.log_image("Seq3_Pred", to_u8(pred), int(state.step))
                    tb.log_image("Seq3_GT", to_u8(gt), int(state.step))
                except StopIteration:
                    pass
            mgr.save(int(state.step),
                     {"params": state.params, "opt_state": state.opt_state,
                      "step": state.step},
                     metric=val_means.get("val_recnLoss"))
    finally:
        if hb is not None:
            hb.stop()
    return state
