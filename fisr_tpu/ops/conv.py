"""Convolution vocabulary of FISRnet, as pure JAX functions over param pytrees.

Re-implements the reference block library (ops.py:7-76) with exact math:

* `conv2d`       — 3x3 (or kxk) conv, stride 1, SAME zero padding, + bias
                   (ops.py:7-11; NHWC/HWIO layouts, MXU-friendly)
* `res_block`    — pre-activation two-conv residual block (ops.py:39-44)
* `enc_level`    — conv + 2 res blocks + relu, skip out, 2x2 maxpool (ops.py:48-55)
* `bottleneck`   — conv + relu(res block) (ops.py:59-63)
* `dec_level`    — bilinear x2 upsample + conv + skip concat + 2 res blocks
                   (ops.py:67-76; upsample uses the TF1-legacy transform)
* `depth_to_space` — TF DCR-order pixel shuffle (FISRnet.py:99 etc.)

Precision policy: params are stored f32; compute runs in a configurable
dtype (bf16 on TPU for speed — the MXU accumulates bf16 matmuls in f32
natively, so no loss scaling is needed; f32 for parity tests).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

__all__ = [
    "Policy",
    "conv2d",
    "res_block",
    "enc_level",
    "bottleneck",
    "dec_level",
    "depth_to_space",
    "init_conv",
    "init_res_block",
]


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy: f32 master params, configurable compute dtype."""

    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def cast(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.astype(self.compute_dtype)


F32 = Policy(jnp.float32)
BF16 = Policy(jnp.bfloat16)


def init_conv(rng, k: int, c_in: int, c_out: int, dtype=jnp.float32) -> Params:
    """Xavier/Glorot normal weights + zero bias (parity: ops.py:8-9)."""
    w = jax.nn.initializers.glorot_normal(in_axis=(0, 1, 2), out_axis=3)(
        rng, (k, k, c_in, c_out), dtype
    )
    return {"w": w, "b": jnp.zeros((c_out,), dtype)}


def init_res_block(rng, c: int, dtype=jnp.float32) -> Params:
    r0, r1 = jax.random.split(rng)
    return {"conv0": init_conv(r0, 3, c, c, dtype), "conv1": init_conv(r1, 3, c, c, dtype)}


def conv2d(p: Params, x: jnp.ndarray, policy: Policy = F32, *, stride: int = 1,
           dilation: int = 1) -> jnp.ndarray:
    """SAME conv, NHWC x HWIO -> NHWC.

    The conv's preferred_element_type matches the compute dtype: the TPU MXU
    accumulates bf16 products in f32 internally either way, and requesting a
    wider output dtype would make reverse-mode feed an f32 cotangent to a
    bf16-kernel transpose conv (mixed-dtype error).
    """
    w = p["w"].astype(policy.compute_dtype)
    out = jax.lax.conv_general_dilated(
        policy.cast(x),
        w,
        window_strides=(stride, stride),
        padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=policy.compute_dtype,
    )
    return out + p["b"].astype(policy.compute_dtype)


def res_block(p: Params, x: jnp.ndarray, policy: Policy = F32) -> jnp.ndarray:
    n = conv2d(p["conv0"], jax.nn.relu(x), policy)
    n = conv2d(p["conv1"], jax.nn.relu(n), policy)
    return x + n


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool, SAME padding (parity: ops.py:54).

    Init must be exactly -inf (the max monoid identity) — XLA only provides
    the reverse-mode rule for that form, and bf16 represents inf fine.
    """
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME",
    )


def enc_level(p: Params, x: jnp.ndarray, policy: Policy = F32):
    n = conv2d(p["conv_in"], x, policy)
    n = res_block(p["res0"], n, policy)
    n = jax.nn.relu(res_block(p["res1"], n, policy))
    skip = n
    return max_pool_2x2(n), skip


def bottleneck(p: Params, x: jnp.ndarray, policy: Policy = F32) -> jnp.ndarray:
    n = conv2d(p["conv_in"], x, policy)
    return jax.nn.relu(res_block(p["res0"], n, policy))


def dec_level(p: Params, x: jnp.ndarray, skip: jnp.ndarray, size,
              policy: Policy = F32) -> jnp.ndarray:
    from fisr_tpu.ops.resize import resize_tf1, upsample2x_bilinear

    if (size[0], size[1]) == (x.shape[1] * 2, x.shape[2] * 2):
        n = upsample2x_bilinear(x)
    else:
        n = resize_tf1(x, size, "bilinear")
    n = jax.nn.relu(conv2d(p["resize"], n, policy))
    n = jnp.concatenate([n, policy.cast(skip)], axis=-1)
    n = conv2d(p["conv_in"], n, policy)
    n = res_block(p["res0"], n, policy)
    return jax.nn.relu(res_block(p["res1"], n, policy))


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """TF `tf.depth_to_space` (DCR order), NHWC."""
    n, h, w, c = x.shape
    c_out = c // (block * block)
    x = x.reshape(n, h, w, block, block, c_out)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h * block, w * block, c_out)
