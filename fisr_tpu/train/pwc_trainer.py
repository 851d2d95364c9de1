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

__all__ = ["create_pwc_state", "make_pwc_train_step", "make_pwc_eval_step"]


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
