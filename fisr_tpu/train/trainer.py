"""FISRnet training engine: one fused jitted step, DP-shardable.

Replaces the reference's feed_dict train loop (FISRnet.py:580-744). The
reference builds 4 weight-shared forward graphs per step (3 stride-1 window
replicas + 1 stride-2, :281-306/:403-406) and a separate val graph; we build
ONE forward apply over [4B] batch rows — windows and the stride-2 input are
folded into the batch axis (identical math, far better MXU utilization) —
then split rows for the loss terms.

Optimizer parity: Adam(beta1=0.9, beta2=0.999, eps=1e-8) == tf.train.
AdamOptimizer defaults (FISRnet.py:489-491); lr schedules in
fisr_tpu.train.schedule.

Data-parallel scaling: `make_train_step(..., mesh=...)` shards the batch
over the mesh's 'data' axis with replicated params; XLA inserts the gradient
all-reduce (psum) over ICI. No NCCL/MPI analog needed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import F32, Policy
from fisr_tpu.ops.resize import downsample_int
from fisr_tpu.ops.seq import groups_to_overlap, split_seq_dim, stack_windows
from fisr_tpu.train.losses import LossWeights, l2_loss, temporal_loss
from fisr_tpu.ops.metrics import psnr_image

Batch = Dict[str, jnp.ndarray]

__all__ = ["TrainState", "create_state", "make_train_step", "make_val_step",
           "forward_windows"]


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda aux, children: TrainState(*children),
)


def create_state(rng, optimizer: optax.GradientTransformation,
                 in_ch: int = fisrnet.IN_CH,
                 ch: int = fisrnet.BASE_CH) -> TrainState:
    """ch: model width (see fisrnet.init_params) — 64 is the reference model;
    narrow widths serve CPU-mesh sharding checks."""
    params = fisrnet.init_params(rng, in_ch, ch=ch)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def _ss2_input(data: jnp.ndarray, flow_ss2: jnp.ndarray, warp_ss2: jnp.ndarray):
    """Stride-2 window: frames {0, 2, 4} of the merged 5-frame input
    (FISRnet.py:394-399)."""
    frames = jnp.concatenate(
        [data[..., 0:3], data[..., 6:9], data[..., 12:15]], axis=-1
    )
    return jnp.concatenate([frames, flow_ss2, warp_ss2], axis=-1)


def forward_windows(params, batch: Batch, policy: Policy = F32,
                    with_ss2: bool = True):
    """One model apply over all window rows.

    batch keys: data [B,H,W,15], flow [B,H,W,16], warp [B,H,W,24], and (if
    with_ss2) flow_ss2 [B,H,W,8], warp_ss2 [B,H,W,12].
    Returns (pred_groups, pred_ss2): 3-tuples over scales (l3, l2, l1) of
    [B, 9, ...] / [B, 3, ...] 5-dim predictions (pred_ss2 None w/o ss2).
    """
    b = batch["data"].shape[0]
    rows = stack_windows(batch["data"], batch["flow"], batch["warp"])  # [3B,...]
    n_rows = 3
    if with_ss2:
        rows = jnp.concatenate(
            [rows, _ss2_input(batch["data"], batch["flow_ss2"], batch["warp_ss2"])], 0
        )
        n_rows = 4

    preds = fisrnet.apply(params, rows, policy=policy)  # (l1, l2, l3)
    groups, ss2 = [], []
    for scale in (2, 1, 0):  # reorder to (l3, l2, l1)
        p5 = split_seq_dim(preds[scale])  # [n_rows*B, 3, h, w, 3]
        wins = [p5[i * b : (i + 1) * b] for i in range(n_rows)]
        groups.append(jnp.concatenate(wins[:3], axis=1))  # [B, 9, ...]
        if with_ss2:
            ss2.append(wins[3])  # [B, 3, ...]
    return tuple(groups), (tuple(ss2) if with_ss2 else None)


def _gt_pyramid(label: jnp.ndarray):
    """label: merged [B, 2H, 2W, 21] -> 5-dim GT at (l3, l2, l1).

    The reference builds the GT pyramid with TF1 bicubic /2 and /4
    (FISRnet.py:263-264) — exact subsampling for integer factors.
    """
    return (
        split_seq_dim(label),
        split_seq_dim(downsample_int(label, 2)),
        split_seq_dim(downsample_int(label, 4)),
    )


def make_train_step(
    optimizer: optax.GradientTransformation,
    loss_weights: LossWeights = LossWeights(),
    policy: Policy = F32,
    donate: bool = True,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    def step_fn(state: TrainState, batch: Batch):
        def loss_fn(params):
            pred_groups, pred_ss2 = forward_windows(params, batch, policy)
            gt = _gt_pyramid(batch["label"])
            total, metrics = temporal_loss(pred_groups, pred_ss2, gt, loss_weights)
            ovlp = groups_to_overlap(pred_groups[0])
            metrics["train_PSNR"] = jnp.mean(psnr_image(ovlp, gt[0]))
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_val_step(policy: Policy = F32):
    """Validation: stride-1 windows only, recn-L2 + PSNR on the merged
    sequence (FISRnet.py:493-533)."""

    def val_fn(params, batch: Batch):
        pred_groups, _ = forward_windows(params, batch, policy, with_ss2=False)
        gt = split_seq_dim(batch["label"])
        ovlp = groups_to_overlap(pred_groups[0]).astype(jnp.float32)
        return {
            "val_recnLoss": l2_loss(ovlp, gt.astype(jnp.float32)),
            "val_PSNR": jnp.mean(psnr_image(ovlp, gt)),
        }

    return jax.jit(val_fn)


def tf_scale_by_adam(b1: float = 0.9, b2: float = 0.999,
                     eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with tf.train.AdamOptimizer semantics (FISRnet.py:489-491,
    model_pwcnet.py:266-270) — NOT optax.scale_by_adam.

    TF1 applies  lr * sqrt(1-b2^t)/(1-b1^t) * m_t / (sqrt(v_t) + eps):
    eps is added to the UNcorrected sqrt(v), so the effective eps on the
    bias-corrected quotient is eps*sqrt(1-b2^t) — 31.6x smaller than
    optax.adam's at t=1, converging to eps as t grows. Negligible for
    well-scaled gradients (|g| >> eps) but visible on near-zero-gradient
    leaves; the optimizer-step oracle (tests/test_optimizer_oracle.py)
    pins this form against the reference's own AdamOptimizer.

    State is optax.ScaleByAdamState (same pytree as optax.scale_by_adam)
    so existing checkpointed opt_states keep loading.
    """

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        count = state.count + 1
        t = count.astype(jnp.float32)
        # TF keeps b1^t/b2^t as f32 accumulator variables (beta*_power)
        corr = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        scaled = jax.tree.map(
            lambda m, v: corr * m / (jnp.sqrt(v) + eps), mu, nu)
        return scaled, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def tf_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
            eps: float = 1e-8) -> optax.GradientTransformation:
    """tf.train.AdamOptimizer(lr) — see tf_scale_by_adam. `learning_rate`
    may be a float or a schedule over the pre-increment step count
    (matching TF's lr-tensor-on-global_step evaluation order)."""
    return optax.chain(tf_scale_by_adam(b1, b2, eps),
                       optax.scale_by_learning_rate(learning_rate))


def adam_with_schedule(schedule_fn) -> optax.GradientTransformation:
    """tf.train.AdamOptimizer parity (defaults b1=.9, b2=.999, eps=1e-8),
    exact to the reference's eps placement (see tf_scale_by_adam)."""
    return tf_adam(schedule_fn)
