"""End-to-end joint fine-tuning: gradients through flow -> warp -> FISRnet.

A capability the reference CANNOT express: its video path is three separate
TF sessions handing off .flo/.mat files through disk (main.py:207-235), so
the flow model can never receive gradients from the interpolation loss.
Here the serving path IS one differentiable program
(infer/video._fisr_window_core over _flow_core/_warp_core), so we can
fine-tune FISRnet and PWC-Net jointly against the final frame quality —
optimizing the flows for what the interpolator actually needs rather than
for EPE against ground-truth motion.

Differentiability receipts: the Pallas cost volume has a custom VJP
(kernels/cost_volume_pallas, gradient equality pinned in test_kernels);
dense_image_warp is differentiable in both args (ops/warp); the bilinear
x2-upscale and color transforms are linear.

Train on the deployment window contract: frames [B, 3, h, w, 3] YUV in
[0, 255], target [B, sf*h, sf*w, 9] in [0, 1] ([fr1, SR, fr2] — the video
phase's exact output). Loss is Charbonnier (sqrt(x^2+eps^2), the robust L1
standard for VFI fine-tuning) or plain L2.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fisr_tpu.infer.video import _fisr_window_core, _flow_core, _warp_core
from fisr_tpu.models import pwcnet
from fisr_tpu.ops.conv import F32, Policy
from fisr_tpu.ops.metrics import psnr_image

__all__ = ["JointState", "create_joint_state", "make_joint_train_step"]


@dataclasses.dataclass
class JointState:
    fisr_params: Any
    pwc_params: Any
    fisr_opt: Any
    pwc_opt: Any
    step: jnp.ndarray


jax.tree_util.register_pytree_node(
    JointState,
    lambda s: ((s.fisr_params, s.pwc_params, s.fisr_opt, s.pwc_opt, s.step),
               None),
    lambda aux, children: JointState(*children),
)


def create_joint_state(fisr_params, pwc_params,
                       fisr_optimizer: optax.GradientTransformation,
                       pwc_optimizer: Optional[optax.GradientTransformation]
                       ) -> JointState:
    return JointState(
        fisr_params, pwc_params,
        fisr_optimizer.init(fisr_params),
        pwc_optimizer.init(pwc_params) if pwc_optimizer is not None else None,
        jnp.zeros((), jnp.int32),
    )


def _charbonnier(err: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    return jnp.mean(jnp.sqrt(err * err + eps * eps))


def make_joint_train_step(
    fisr_optimizer: optax.GradientTransformation,
    pwc_optimizer: Optional[optax.GradientTransformation] = None,
    cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig(),
    policy: Policy = F32,
    upscale: int = 2,
    sf: int = 2,
    loss: str = "charbonnier",
    donate: bool = True,
) -> Callable[[JointState, Dict[str, jnp.ndarray]],
              Tuple[JointState, Dict[str, jnp.ndarray]]]:
    """One jitted joint step over the FULL serving path.

    pwc_optimizer=None freezes the flow model (FISRnet-only fine-tune on
    in-graph flows — still useful: the interpolator adapts to the flow
    model's actual error distribution instead of the corpus's offline
    flows). batch: {"frames": [B,3,h,w,3] YUV [0,255],
    "target": [B, sf*h, sf*w, 9] in [0,1]}.
    """
    loss_fn_px = _charbonnier if loss == "charbonnier" else (
        lambda e: jnp.mean(e * e))
    train_pwc = pwc_optimizer is not None

    def forward(fisr_params, pwc_params, frames):
        f0, f1, f2 = frames[:, 0], frames[:, 1], frames[:, 2]
        flows01 = _flow_core(pwc_params, f0, f1, cfg, policy, upscale)
        flows12 = _flow_core(pwc_params, f1, f2, cfg, policy, upscale)
        warps01 = _warp_core(f0, f1, flows01)
        warps12 = _warp_core(f1, f2, flows12)
        return _fisr_window_core(fisr_params, f0, f1, f2, flows01, warps01,
                                 flows12, warps12, policy, sf, None,
                                 clip_output=False)

    def step_fn(state: JointState, batch):
        def loss_of(fisr_params, pwc_params):
            if not train_pwc:
                pwc_params = jax.lax.stop_gradient(pwc_params)
            pred = forward(fisr_params, pwc_params, batch["frames"])
            err = pred - batch["target"]
            total = loss_fn_px(err)
            metrics = {
                "joint_loss": total,
                "joint_PSNR": jnp.mean(psnr_image(
                    jnp.clip(pred, 0.0, 1.0), batch["target"])),
            }
            return total, metrics

        grad_fn = jax.value_and_grad(loss_of, argnums=(0, 1), has_aux=True)
        (_, metrics), (g_fisr, g_pwc) = grad_fn(state.fisr_params,
                                                state.pwc_params)
        up_f, opt_f = fisr_optimizer.update(g_fisr, state.fisr_opt,
                                            state.fisr_params)
        fisr_params = optax.apply_updates(state.fisr_params, up_f)
        if train_pwc:
            up_p, opt_p = pwc_optimizer.update(g_pwc, state.pwc_opt,
                                               state.pwc_params)
            pwc_params = optax.apply_updates(state.pwc_params, up_p)
        else:
            opt_p, pwc_params = state.pwc_opt, state.pwc_params
        new_state = JointState(fisr_params, pwc_params, opt_f, opt_p,
                               state.step + 1)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
