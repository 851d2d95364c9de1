"""PWC-Net training losses + EPE metric.

TPU-native equivalent of the missing upstream `losses.pwcnet_loss`
(model_pwcnet.py:23,296,518 call sites; option hyper-params at :75-79):

* multiscale — per pyramid level l (top level 6 first, matching the model's
  flow_pyr order), alpha_l * mean-over-batch of the summed L2 norm between
  the level's predicted flow and the GT flow bilinearly resized to the
  level's resolution and divided by the SPATIAL DOWNSCALE RATIO (2^l) —
  i.e. pyramid flows are supervised in level-pixel units. Evidence for the
  convention: the reference converts its level-2 flow to full-res pixels
  with `* 2**flow_pred_lvl` (model_pwcnet.py:1586-1590), which is only
  unit-correct under per-level-pixel supervision (upstream tfoptflow
  losses.py scales gt by gt_height/lvl_height the same way). Round-3 bug
  fix: dividing by the original paper's 20 instead made every trained
  prediction 20/2^flow_pred_lvl = 5x too small after the reference's x4
  upsample — val EPE could never beat ~0.8x the zero-flow baseline;
* robust     — same structure with (|dx|+|dy| + epsilon)^q instead of the
  L2 norm (used for fine-tuning);
* plus the gamma * L2 weight-decay term the reference adds via
  tf.losses.get_regularization_loss.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from fisr_tpu.ops.resize import resize_tf1

ALPHAS = (0.32, 0.08, 0.02, 0.01, 0.005, 0.0025)  # levels 6..1 (paper)

__all__ = ["pwcnet_loss", "epe"]


def _level_gt(y: jnp.ndarray, hw) -> jnp.ndarray:
    # gt in level-pixel units: downscale values by the spatial ratio
    # (upstream losses.py: scaled_flow_gt /= gt_height / lvl_height)
    return resize_tf1(y, hw, "bilinear") * (float(hw[0]) / float(y.shape[1]))


def pwcnet_loss(
    y: jnp.ndarray,
    flow_pyr: Sequence[jnp.ndarray],
    params=None,
    mode: str = "multiscale",
    alphas: Sequence[float] = ALPHAS,
    epsilon: float = 0.01,
    q: float = 0.4,
    gamma: float = 0.0004,
) -> jnp.ndarray:
    """y: GT flow [B, H, W, 2] (full res); flow_pyr: model outputs, coarsest
    (level 6) first."""
    total = jnp.asarray(0.0, jnp.float32)
    for alpha, flow in zip(alphas, flow_pyr):
        gt = _level_gt(y.astype(jnp.float32), flow.shape[1:3])
        diff = flow.astype(jnp.float32) - gt
        if mode == "multiscale":
            norm = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-16)
        elif mode == "robust":
            norm = jnp.power(jnp.sum(jnp.abs(diff), axis=-1) + epsilon, q)
        else:
            raise ValueError(mode)
        total = total + alpha * jnp.mean(jnp.sum(norm, axis=(1, 2)))
    if params is not None and gamma:
        # reference: gamma * sum(tf.nn.l2_loss(var)) and l2_loss = sum(v^2)/2
        # (model_pwcnet.py:524) — keep the /2 so gamma means the same thing
        wsum = sum(
            jnp.sum(jnp.square(p)) for p in jax.tree_util.tree_leaves(params)
        )
        total = total + gamma * 0.5 * wsum
    return total


def epe(flow_pred: jnp.ndarray, flow_gt: jnp.ndarray) -> jnp.ndarray:
    """Average end-point error (the reference's val ranking metric)."""
    d = flow_pred.astype(jnp.float32) - flow_gt.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(jnp.sum(jnp.square(d), axis=-1)))
