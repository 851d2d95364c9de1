"""PWC-Net training/eval engine.

TPU-native rebuild of the tfoptflow training stack (model_pwcnet.py:587-885
train/eval loops, model_base.py lifecycle, missing `multi_gpus` module):

* one jitted train step — multiscale or robust pyramid loss (train/pwc_loss)
  + Adam; the reference's multi-GPU tower replication + host gradient
  averaging becomes batch sharding over the mesh 'data' axis (XLA psum);
* EPE validation step (the reference's ranking metric for
  BestCheckpointSaver);
* mixed precision: bf16 activations / f32 params via the Policy — replacing
  the reference's fp16 + fp32-master-weights + static loss scaling
  (model_base.py:232-233, model_pwcnet.py:539-547): bf16's exponent range
  makes the loss scaler unnecessary on TPU.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from fisr_tpu.models import pwcnet
from fisr_tpu.ops.conv import F32, Policy
from fisr_tpu.train.pwc_loss import epe, pwcnet_loss
from fisr_tpu.train.trainer import TrainState

__all__ = ["create_pwc_state", "make_pwc_train_step", "make_pwc_eval_step",
           "pwc_eval_report", "pwc_fit"]


def create_pwc_state(rng, optimizer: optax.GradientTransformation,
                     cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig()) -> TrainState:
    params = pwcnet.init_params(rng, cfg)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_pwc_train_step(optimizer: optax.GradientTransformation,
                        cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig(),
                        policy: Policy = F32, loss_mode: str = "multiscale",
                        gamma: float = 0.0004, q: float = 0.4,
                        epsilon: float = 0.01, donate: bool = True):
    """batch: {'x': [B, 2, H, W, 3] in [0,1], 'y': [B, H, W, 2] GT flow}."""

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            _, pyr = pwcnet.apply(params, batch["x"][:, 0], batch["x"][:, 1],
                                  cfg, policy)
            loss = pwcnet_loss(batch["y"], pyr, params, mode=loss_mode,
                               gamma=gamma, q=q, epsilon=epsilon)
            return loss, {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_pwc_eval_step(cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig(),
                       policy: Policy = F32):
    def eval_fn(params, batch) -> Dict[str, jnp.ndarray]:
        flow_pred, _ = pwcnet.apply(params, batch["x"][:, 0], batch["x"][:, 1],
                                    cfg, policy)
        return {"epe": epe(flow_pred, batch["y"])}

    return jax.jit(eval_fn)


def pwc_eval_report(params, dataset, batch_size: int = 8,
                    cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig(),
                    policy: Policy = F32, save_preds_dir: str | None = None,
                    report_path: str | None = None):
    """Per-sample validation report — model_pwcnet.py:817-885 parity.

    The reference's eval() returns (avg metric, avg duration, pandas df with
    ID / EPE / Duration / Avg_Flow_Mag / Max_Flow_Mag rows, optionally
    writing .flo + flow-viz png predictions). Same here, with the rows as a
    list of dicts (JSONL on disk instead of a dataframe — no pandas dep),
    and the whole val batch scored in one jitted call per round.

    Returns (avg_epe, avg_duration_sec, rows).
    """
    import json
    import os
    import time

    @jax.jit
    def batch_eval(params, x0, x1, y):
        flow_pred, _ = pwcnet.apply(params, x0, x1, cfg, policy)
        d = flow_pred.astype(jnp.float32) - y.astype(jnp.float32)
        per_sample_epe = jnp.mean(jnp.sqrt(jnp.sum(d * d, -1)), axis=(1, 2))
        mag = jnp.sqrt(jnp.sum(jnp.square(flow_pred.astype(jnp.float32)), -1))
        return (flow_pred, per_sample_epe,
                jnp.mean(mag, axis=(1, 2)), jnp.max(mag, axis=(1, 2)))

    ids = getattr(dataset, "ids", None)
    rows = []
    idx = 0
    if save_preds_dir:
        os.makedirs(save_preds_dir, exist_ok=True)
    for vb in dataset.batches(batch_size, train=False):
        t0 = time.time()
        flows, epes, avg_mag, max_mag = batch_eval(
            params, jnp.asarray(vb["x"][:, 0]), jnp.asarray(vb["x"][:, 1]),
            jnp.asarray(vb["y"]))
        epes = jax.device_get(epes)  # fences the device work
        duration = (time.time() - t0) / len(epes)
        avg_mag, max_mag = jax.device_get((avg_mag, max_mag))
        for k in range(len(epes)):
            sample_id = (ids[dataset.train_size + idx]
                         if ids is not None else f"val_{idx:05d}")
            rows.append({"ID": sample_id, "EPE": float(epes[k]),
                         "Duration": float(duration),
                         "Avg_Flow_Mag": float(avg_mag[k]),
                         "Max_Flow_Mag": float(max_mag[k])})
            if save_preds_dir:
                from fisr_tpu.data.flo import write_flo
                from fisr_tpu.data.png_io import write_png
                from fisr_tpu.utils.flow_viz import flow_to_img

                pred = jax.device_get(flows[k])
                write_flo(pred, os.path.join(save_preds_dir,
                                             f"{sample_id}_flow_pred.flo"))
                write_png(flow_to_img(pred),
                          os.path.join(save_preds_dir,
                                       f"{sample_id}_flow_pred.png"))
            idx += 1
    avg_epe = sum(r["EPE"] for r in rows) / max(len(rows), 1)
    avg_dur = sum(r["Duration"] for r in rows) / max(len(rows), 1)
    if report_path:
        with open(report_path, "w") as f:
            f.writelines(json.dumps(r) + "\n" for r in rows)
    return avg_epe, avg_dur, rows


def pwc_fit(dataset, ckpt_dir: str, steps: int, batch_size: int = 8,
            val_every: int = 1000, display_every: int = 100,
            schedule_fn=None, cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig(),
            policy: Policy = F32, loss_mode: str = "multiscale",
            max_to_keep: int = 10, seed: int = 0,
            log_dir: str | None = None, panel_samples: int = 4) -> TrainState:
    """Step-driven training loop (model_pwcnet.py:587-788 parity: periodic
    display/val, BestCheckpointSaver-style top-k retention ranked by EPE).

    log_dir: when set, writes TF-free TensorBoard events — train loss /
    val EPE scalars, plus an img1|img2|flow_pred|warped|flow_gt panel of the
    first `panel_samples` val samples every val round (the reference's
    OptFlowTBLogger.log_imgs_w_flows observability, logger.py:132-177).
    """
    import itertools
    import time

    from fisr_tpu.train import schedule as sched
    from fisr_tpu.train.checkpoint import CheckpointManager

    schedule_fn = schedule_fn or sched.multisteps(
        [1e-4, 5e-5, 2.5e-5, 1.25e-5, 6.25e-6, 3.125e-6],
        [400000, 600000, 800000, 1000000, 1200000])
    # tf.train.AdamOptimizer(lr, epsilon=1e-8) parity — the reference's
    # non-mixed-precision path (model_pwcnet.py:266-270); exact eps
    # placement via trainer.tf_adam (see tests/test_optimizer_oracle.py)
    from fisr_tpu.train.trainer import tf_adam

    opt = tf_adam(schedule_fn)
    state = create_pwc_state(jax.random.PRNGKey(seed), opt, cfg)
    step_fn = make_pwc_train_step(opt, cfg, policy, loss_mode)
    eval_fn = make_pwc_eval_step(cfg, policy)
    mgr = CheckpointManager(ckpt_dir, max_to_keep=max_to_keep, best_mode="min")
    tb = None
    if log_dir:
        from fisr_tpu.utils.tb_writer import TBLogger

        tb = TBLogger(log_dir)

    # jitted once per fit() call — re-jitting inside log_val_panel would
    # recompile (10-70 s through the remote-compile relay) every val round
    panel_apply = jax.jit(lambda p, a, b: pwcnet.apply(p, a, b, cfg, policy))

    def log_val_panel(params, step):
        """One flow-panel image summary from the first val batch."""
        import numpy as np

        from fisr_tpu.ops.warp import dense_image_warp
        from fisr_tpu.utils.flow_viz import flow_panels

        vb = next(iter(dataset.batches(batch_size, train=False)), None)
        if vb is None:
            return
        n = min(panel_samples, len(vb["x"]))
        x = jnp.asarray(vb["x"][:n])
        flow_pred, _ = panel_apply(params, x[:, 0], x[:, 1])
        warped = dense_image_warp(x[:, 1], flow_pred.astype(jnp.float32))
        panel = flow_panels(np.asarray(vb["x"][:n]),
                            np.asarray(flow_pred, np.float32),
                            np.asarray(warped, np.float32),
                            np.asarray(vb["y"][:n]))
        tb.log_image("val/flow_panel", panel, step)

    def epochs():
        for ep in itertools.count():
            yield from dataset.batches(batch_size, train=True, epoch_seed=seed + ep)

    from fisr_tpu.train.loop import prefetch_to_device

    t0 = time.time()
    for i, batch in enumerate(prefetch_to_device(epochs())):
        if i >= steps:
            break
        state, m = step_fn(state, batch)
        if i % display_every == 0:
            print(f"step {i}/{steps} loss {float(m['loss']):.4f} "
                  f"({(time.time() - t0) / 60:.1f} min)", flush=True)
            if tb:
                tb.log_scalar("train/loss", float(m["loss"]), i)
        if (i + 1) % val_every == 0 or i + 1 == steps:
            # sample-weighted mean: batches() yields a final partial batch
            # so every val sample counts exactly once
            vals = [(float(eval_fn(state.params,
                                   {k: jnp.asarray(v) for k, v in vb.items()})["epe"]),
                     len(vb["x"]))
                    for vb in dataset.batches(batch_size, train=False)]
            n_val = sum(n for _, n in vals)
            val_epe = (sum(e * n for e, n in vals) / n_val) if n_val else None
            print(f"step {i + 1}: val EPE "
                  f"{'n/a (empty val split)' if val_epe is None else f'{val_epe:.4f}'}",
                  flush=True)
            if tb and val_epe is not None:
                tb.log_scalar("val/EPE", val_epe, i + 1)
                log_val_panel(state.params, i + 1)
            mgr.save(int(state.step),
                     {"params": state.params, "opt_state": state.opt_state,
                      "step": state.step}, metric=val_epe)
    return state
