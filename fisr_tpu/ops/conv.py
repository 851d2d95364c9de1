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
    "conv_in_fused",
    "res_block",
    "enc_level",
    "bottleneck",
    "dec_level",
    "depth_to_space",
    "head_tail_conv",
    "up_conv2x",
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


def conv_in_fused(p: Params, img: jnp.ndarray, extra: jnp.ndarray | None,
                  policy: Policy = F32, img_stride: int = 1) -> jnp.ndarray:
    """`conv2d(p, concat([downsample_int(img, img_stride), extra], -1))`
    with neither the channel concat nor the strided-slice downsample ever
    materialized — the round-3 input-glue rewrite of the tiled 4K pass.

    Two math-identical transforms (deviations are summation-order only):

    * split conv: conv is linear in input channels, so the K=(Ci+Ce) conv
      over the concat equals conv(img, w[:, :, :Ci]) + conv(extra,
      w[:, :, Ci:]). Skipping the 38-ch concat measured -8 ms/4K pass on
      v5e (the K=38 conv also tiles better as K=29 + K=9 — PERF.md r3).
    * fused downsample: a 3x3 SAME conv on img[::k, ::k] equals the same
      conv on full-res img with window_strides=k, rhs_dilation=k and
      explicit padding (k, k): output i reads taps x[ki-k], x[ki], x[ki+k]
      == the subsampled grid's taps, and the k-zero pad reproduces the
      SAME-pad zeros. Skipping the strided-slice intermediates measured
      another -9 ms (lane-dim stride-4 slices are relayout-heavy).

    Inference-path only (infer/device.tiled_apply & co); the training
    graph keeps the composed ops so autodiff and checkpoints see the
    reference formulation (FISRnet.py:116,147 concats).
    """
    ci = img.shape[-1]
    w = p["w"]
    dn = ("NHWC", "HWIO", "NHWC")
    wa = w[:, :, :ci].astype(policy.compute_dtype)
    img = policy.cast(img)
    if img_stride == 1:
        out = jax.lax.conv_general_dilated(
            img, wa, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=policy.compute_dtype)
    else:
        k = img_stride
        out = jax.lax.conv_general_dilated(
            img, wa, (k, k), [(k, k), (k, k)], rhs_dilation=(k, k),
            dimension_numbers=dn,
            preferred_element_type=policy.compute_dtype)
    if extra is not None:
        wb = w[:, :, ci:].astype(policy.compute_dtype)
        out = out + jax.lax.conv_general_dilated(
            policy.cast(extra), wb, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=policy.compute_dtype)
    return out + p["b"].astype(policy.compute_dtype)


def bottleneck(p: Params, x: jnp.ndarray, policy: Policy = F32) -> jnp.ndarray:
    n = conv2d(p["conv_in"], x, policy)
    return jax.nn.relu(res_block(p["res0"], n, policy))


def dec_level(p: Params, x: jnp.ndarray, skip: jnp.ndarray, size,
              policy: Policy = F32, fast_upsample: bool = False) -> jnp.ndarray:
    from fisr_tpu.ops.resize import resize_tf1, upsample2x_bilinear

    if fast_upsample and (size[0], size[1]) == (x.shape[1] * 2, x.shape[2] * 2):
        n = jax.nn.relu(up_conv2x(p["resize"], x, policy))
    else:
        if (size[0], size[1]) == (x.shape[1] * 2, x.shape[2] * 2):
            n = upsample2x_bilinear(x)
        else:
            n = resize_tf1(x, size, "bilinear")
        n = jax.nn.relu(conv2d(p["resize"], n, policy))
    n = jnp.concatenate([n, policy.cast(skip)], axis=-1)
    n = conv2d(p["conv_in"], n, policy)
    n = res_block(p["res0"], n, policy)
    return jax.nn.relu(res_block(p["res1"], n, policy))


def _fold_up_conv_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Fold `conv3x3(upsample2x_bilinear(x), w)` into a subpixel kernel.

    [3,3,C,Co] -> [3,3,C,4Co]: output slot (a,b) of the x2-upsampled conv
    result is itself a 3x3 conv over the HALF-res input whose taps are the
    original taps composed with the TF1-legacy bilinear stencil
    (up[2k]=x[k], up[2k+1]=(x[k]+x[k+1])/2):

        W'[t,u,c,(a,b,f)] = sum_{d,e} F[a,t,d] * F[b,u,e] * w[d,e,c,f]

    with the 1-D fold F[a][tap t][kernel tap d] below. Slot blocks are in
    TF depth_to_space (DCR) order, so `depth_to_space(conv(x, W'), 2)`
    reproduces the composition.
    """
    f = jnp.asarray(
        [[[0.5, 0.0, 0.0],   # a=0: up rows 2i-1, 2i, 2i+1
          [0.5, 1.0, 0.5],
          [0.0, 0.0, 0.5]],
         [[0.0, 0.0, 0.0],   # a=1: up rows 2i, 2i+1, 2i+2
          [1.0, 0.5, 0.0],
          [0.0, 0.5, 1.0]]], w.dtype)
    wp = jnp.einsum("atd,bue,decf->tucabf", f, f, w)
    k0, k1, c = wp.shape[0], wp.shape[1], wp.shape[2]
    return wp.reshape(k0, k1, c, 4 * w.shape[3])


def up_conv2x(p: Params, x: jnp.ndarray, policy: Policy = F32) -> jnp.ndarray:
    """`conv2d(p, upsample2x_bilinear(x))` as ONE subpixel conv at input res.

    Math-identical to the composition except a thin frame border: the first
    output row/col (the conv's zero pad sits between two upsample stencil
    taps, which the fold can't represent) and the last two (the legacy
    upsample CLAMPS its final interpolated row, the fold reads zero pad).
    Patch-tiled inference trims >=2 px everywhere but the true canvas
    border, so infer paths opt in (fast_upsample) while training/eval keep
    the exact composition.

    Why: the decoder's upsample-then-conv runs the conv at DOUBLE resolution
    with its output lanes only c_out/128 full (dec0: N=64 = half-empty MXU);
    the folded form does the same FLOPs at input resolution with 4*c_out
    output channels — full lanes (measured ~1.5-2x on the dec0 resize conv).
    """
    wp = _fold_up_conv_weights(p["w"]).astype(policy.compute_dtype)
    out = jax.lax.conv_general_dilated(
        policy.cast(x), wp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=policy.compute_dtype)
    return depth_to_space(out, 2) + p["b"].astype(policy.compute_dtype)


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """TF `tf.depth_to_space` (DCR order), NHWC."""
    n, h, w, c = x.shape
    c_out = c // (block * block)
    x = x.reshape(n, h, w, block, block, c_out)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h * block, w * block, c_out)


def _fold_d2s_conv_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a [3,3,C,Co] kernel into the packed-domain tap bank.

    Identity used: `conv3x3_SAME(depth_to_space(z, 2), w)` equals a 2x2-tap
    conv on the packed tensor z [.., 4C] whose (ti, tj) tap weight scatters
    w's entries by (input slot, output slot). Derivation: output pixel
    (2i+a, 2j+b) reads full-res rows 2i+a+dy, i.e. packed row i + (a+dy)//2
    at slot parity (a+dy)%2 — for each `a` those land on exactly the two
    packed rows {i+a-1, i+a}, so a 2-tap VALID conv over the 1-padded packed
    tensor covers them (tap ti = (a+dy)//2 - a + 1). Same for columns.

    Returns wall [4C, 4, 4Co]: contraction dim, tap (ti*2+tj), then output
    slot-major channels (slot (a,b) -> block (a*2+b)*Co, matching TF DCR
    depth_to_space order).
    """
    C, Co = w.shape[2], w.shape[3]
    wall = jnp.zeros((4 * C, 4, 4 * Co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            so = a * 2 + b
            for dy in (-1, 0, 1):
                ti = (a + dy) // 2 - a + 1
                si_r = (a + dy) % 2
                for dx in (-1, 0, 1):
                    tj = (b + dx) // 2 - b + 1
                    si_c = (b + dx) % 2
                    si = si_r * 2 + si_c
                    wall = wall.at[si * C:(si + 1) * C, ti * 2 + tj,
                                   so * Co:(so + 1) * Co].set(w[dy + 1, dx + 1])
    return wall


def head_tail_conv(p: Params, m: jnp.ndarray, policy: Policy = F32) -> jnp.ndarray:
    """relu -> depth_to_space(2) -> 3x3 SAME conv, as one packed tap-GEMM.

    Math-identical to `conv2d(p, depth_to_space(relu(m), 2))` (the reference
    head tail, FISRnet.py:99-101) but computed at 1/4 the spatial resolution
    with a 4C-wide contraction: the naive conv's tiny output-channel count
    (6 or 3) runs the MXU at <5% lane occupancy and was the single hottest
    op of the 4K pass (22 ms/head); this form measures 1.6-2.4x faster.

    m: [n, h, w, 4C] (pre-relu conv1 output); p: the head's conv2 params
    ([3,3,C,Co] + [Co]). Returns [n, 2h, 2w, Co].
    """
    n, h, wd, c4 = m.shape
    C = c4 // 4
    Co = p["w"].shape[3]
    wall = _fold_d2s_conv_weights(p["w"].astype(policy.compute_dtype))
    wall = wall.reshape(c4, 4 * 4 * Co)
    z = jax.nn.relu(policy.cast(m))
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    big = jnp.einsum("nhwc,cd->nhwd", zp, wall,
                     preferred_element_type=policy.compute_dtype)
    # big: [n, h+2, w+2, 16Co] = 4 taps x 4 output slots; sum the taps at
    # their shifted positions, then interleave the slots (depth_to_space)
    out = None
    for k, (ti, tj) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        o = big[:, ti:ti + h + 1, tj:tj + wd + 1, k * 4 * Co:(k + 1) * 4 * Co]
        out = o if out is None else out + o
    parts = [out[:, a:a + h, b:b + wd, (a * 2 + b) * Co:(a * 2 + b + 1) * Co]
             for a in (0, 1) for b in (0, 1)]
    y = depth_to_space(jnp.concatenate(parts, axis=-1), 2)
    return y + p["b"].astype(policy.compute_dtype)
