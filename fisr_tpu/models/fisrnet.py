"""FISRnet: 3-level coarse-to-fine joint VFI+SR U-Net stack (pure JAX).

Architecture parity with the reference `FISRnet.model()` (FISRnet.py:73-173):

* input: [B, H, W, 29] = 3 YUV frames (9ch) + 4 bidirectional flows (8ch)
  + 4 flow-warped frames (12ch), H/W multiples of 32;
* level_1 runs the U-Net on the bicubic x1/4 input (exact subsampling under
  the TF1 legacy transform — see ops/resize.py), level_2 on the x1/2 input
  concat level-1's 9ch prediction, level_3 on full-res concat level-2's;
* each level: 3 encoder stages (64/128/256ch, maxpool /2), 512ch bottleneck,
  3 decoder stages (bilinear x2 + conv + skip concat + 2 res blocks), then
  two heads — `FI-SR` (2 interpolated frames, 6ch) and `SR` (1 frame, 3ch)
  — each conv -> res block -> conv(ch*sf^2) -> depth_to_space(sf) -> conv;
* per-level output = concat [fr1, SR, fr2] = 9ch = 3 YUV frames at 2x the
  level's input resolution; weights are separate per level (~16.1M each,
  ~48.3M total).

Params are a plain nested-dict pytree whose key paths mirror the TF variable
scopes (level_1/enc/level_0/conv_in <-> FISRnet/level_1/enc/level_0/conv/0)
so a TF checkpoint converter is a pure name map.

TPU-first deviations from the reference engine (math-identical):
* the reference built 3 weight-shared stride-1 window replicas + 1 stride-2
  replica of this graph (FISRnet.py:281-306,403-406); we instead fold the
  windows into the batch axis (ops/seq.stack_windows) and apply once;
* activations compute in a configurable dtype (bf16 on TPU), params in f32.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from fisr_tpu.ops.conv import (
    F32,
    Policy,
    bottleneck,
    conv2d,
    conv_in_fused,
    dec_level,
    depth_to_space,
    enc_level,
    head_tail_conv,
    init_conv,
    init_res_block,
    max_pool_2x2,
    res_block,
)
from fisr_tpu.ops.resize import downsample_int

Params = Dict[str, Any]

BASE_CH = 64
IN_CH = 29  # 9 img + 8 flow + 12 warp
PRED_CH = 9  # [fr1(3), SR(3), fr2(3)]

__all__ = ["init_params", "apply", "apply_level", "apply_heads", "param_count"]


def _init_level(rng, in_ch: int, ch: int = BASE_CH, sf: int = 2) -> Params:
    ks = jax.random.split(rng, 32)
    k = iter(ks)

    def enc(c_in, c):
        return {
            "conv_in": init_conv(next(k), 3, c_in, c),
            "res0": init_res_block(next(k), c),
            "res1": init_res_block(next(k), c),
        }

    def dec(c_in, c):
        return {
            "resize": init_conv(next(k), 3, c_in, c),
            "conv_in": init_conv(next(k), 3, c * 2, c),
            "res0": init_res_block(next(k), c),
            "res1": init_res_block(next(k), c),
        }

    def head(out_ch):
        r = jax.random.split(next(k), 4)
        return {
            "conv0": init_conv(r[0], 3, ch, ch),
            "res0": init_res_block(r[1], ch),
            "conv1": init_conv(r[2], 3, ch, ch * sf * sf),
            "conv2": init_conv(r[3], 3, ch, out_ch),
        }

    return {
        "enc": {
            "level_0": enc(in_ch, ch),
            "level_1": enc(ch, ch * 2),
            "level_2": enc(ch * 2, ch * 4),
        },
        "bottleneck": {
            "conv_in": init_conv(next(k), 3, ch * 4, ch * 8),
            "res0": init_res_block(next(k), ch * 8),
        },
        "dec": {
            "level_2": dec(ch * 8, ch * 4),
            "level_1": dec(ch * 4, ch * 2),
            "level_0": dec(ch * 2, ch),
        },
        "fisr": head(6),
        "sr": head(3),
    }


def init_params(rng, in_ch: int = IN_CH, sf: int = 2, ch: int = BASE_CH) -> Params:
    """3 separately-weighted levels; level 2/3 additionally see the previous
    level's 9ch prediction (FISRnet.py:116,147).

    ch: encoder base width. The reference model is ch=64 (the default and the
    only width with checkpoint parity); every apply path reads widths from the
    param shapes, so narrow models (e.g. ch=8) run the identical program
    structure — used by the multi-chip dryrun and sharding tests to keep
    XLA-CPU runtimes in the milliseconds while exercising the same
    collectives/partitioning as the full model.
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "level_1": _init_level(k1, in_ch, ch=ch, sf=sf),
        "level_2": _init_level(k2, in_ch + PRED_CH, ch=ch, sf=sf),
        "level_3": _init_level(k3, in_ch + PRED_CH, ch=ch, sf=sf),
    }


def apply_heads(p: Params, n: jnp.ndarray, sf: int = 2, policy: Policy = F32) -> jnp.ndarray:
    """Both output heads on the final decoder features `n` [B, h, w, ch].

    Returns the level prediction [B, h*sf, w*sf, 9] = concat [fr1, SR, fr2]
    (FISRnet.py:95-108). Receptive radius: 6 px in `n`'s scale
    (conv0 1 + res0 2 + conv1 1 + 2 px for the x2-scale tail conv —
    the single derivation behind _TAIL_HEADS below).
    """
    # Both heads' conv0 read the same `n`: one [3,3,ch,2ch] conv fills the
    # MXU's output lanes (N=128) where two N=64 convs would each waste half.
    # (Merging res0/conv1 as block-diagonal convs was tried and REVERTED:
    # in-context C=64 convs already run ~65-70 TFLOP/s, so doubling their
    # MACs at the C=128 rate is a net loss — measured +12 ms/4K pass.)
    ch = p["fisr"]["conv0"]["w"].shape[3]
    wm = jnp.concatenate([p["fisr"]["conv0"]["w"], p["sr"]["conv0"]["w"]],
                         axis=3).astype(policy.compute_dtype)
    bm = jnp.concatenate([p["fisr"]["conv0"]["b"], p["sr"]["conv0"]["b"]]
                         ).astype(policy.compute_dtype)
    m0 = jax.lax.conv_general_dilated(
        n, wm, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=policy.compute_dtype) + bm

    def run_head(hp, m):
        m = res_block(hp["res0"], m, policy)
        m = conv2d(hp["conv1"], jax.nn.relu(m), policy)
        if sf == 2:
            # exact packed rewrite of relu -> d2s -> conv2 (see head_tail_conv)
            return head_tail_conv(hp["conv2"], m, policy)
        m = depth_to_space(jax.nn.relu(m), sf)
        return conv2d(hp["conv2"], m, policy)

    pred_fisr = run_head(p["fisr"], m0[..., :ch])  # [fr1, fr2]
    pred_sr = run_head(p["sr"], m0[..., ch:])
    fr1, fr2 = pred_fisr[..., :3], pred_fisr[..., 3:]
    return jnp.concatenate([fr1, pred_sr, fr2], axis=-1)


# Tail receptive radii (input px) of the pipeline suffix from each cut point:
# dec0 consumes 8 (x2 upsample 2 + resize conv 1 + conv_in 1 + 2 res blocks 4)
# and the heads 6 (conv0 1 + res0 2 + conv1 1 + x2-scale tail conv 1). Both
# are rounded UP to 8-multiples: slices at 8-aligned offsets keep the TPU
# (8,128) tile layout intact (odd offsets force relayouts and pathological
# compiles), and a larger-than-needed tail only preserves MORE of the ring.
_TAIL_DEC0 = 16
_TAIL_HEADS = 8


def apply_level(p: Params, x: jnp.ndarray, sf: int = 2, policy: Policy = F32,
                stale_halo: int = 0, fast_upsample: bool = False,
                extra: jnp.ndarray = None, in_stride: int = 1) -> jnp.ndarray:
    """One U-Net level: x [B, h, w, C] -> prediction [B, h*sf, w*sf, 9].

    stale_halo: if the caller tiled the frame and x carries a `stale_halo`-px
    ring that will be DISCARDED from the output (patch-tiled inference,
    infer/device.tiled_apply), the ring only has to survive as far as the
    pipeline suffix still reads it: it is trimmed to 14 px before dec0 and
    6 px before the heads (the suffix receptive radii above). The retained
    output is BIT-IDENTICAL to carrying the full ring through — the removed
    cells influence only removed cells — but skips ~18% of dec0/head FLOPs.
    The returned prediction then carries only a _TAIL_HEADS*sf-px stale ring.
    Requires stale_halo == 0 or >= _TAIL_DEC0 with the cut a multiple of 8.

    fast_upsample: run the decoder's x2 upsample+conv as one folded subpixel
    conv (ops/conv.up_conv2x) — exact except the last two output rows/cols
    at the frame border; inference paths opt in, training keeps the exact
    composition.

    extra / in_stride: inference-path input-glue fusion (ops/conv.
    conv_in_fused). The level's TRUE input is
    concat([downsample_int(x, in_stride), extra], -1); the fused form
    computes the same conv_in without materializing either intermediate
    (math-identical, summation order aside — measured -17 ms/4K pass on
    v5e). Default (extra=None, in_stride=1) keeps the exact composed path.
    """
    x = policy.cast(x)
    h, w = x.shape[1] // in_stride, x.shape[2] // in_stride
    if extra is not None or in_stride != 1:
        e0 = p["enc"]["level_0"]
        n = conv_in_fused(e0["conv_in"], x, extra, policy, in_stride)
        n = res_block(e0["res0"], n, policy)
        skip0 = jax.nn.relu(res_block(e0["res1"], n, policy))
        n = max_pool_2x2(skip0)
    else:
        n, skip0 = enc_level(p["enc"]["level_0"], x, policy)
    n, skip1 = enc_level(p["enc"]["level_1"], n, policy)
    n, skip2 = enc_level(p["enc"]["level_2"], n, policy)
    n = bottleneck(p["bottleneck"], n, policy)
    # dec2 keeps the exact composition even in fast mode: its 1-px border
    # deviation lives at 1/4 scale (4 full px) and the ~30-px downstream
    # receptive tail would carry it past a 32-px halo ring into patch cores;
    # dec1/dec0 deviations (2/2+6 px tails) stay strictly inside the ring.
    n = dec_level(p["dec"]["level_2"], n, skip2, (h // 4, w // 4), policy)
    n = dec_level(p["dec"]["level_1"], n, skip1, (h // 2, w // 2), policy,
                  fast_upsample)

    if stale_halo:
        assert stale_halo >= _TAIL_DEC0 and (stale_halo - _TAIL_DEC0) % 8 == 0, stale_halo
        cut = stale_halo - _TAIL_DEC0
        ch2 = cut // 2
        n = n[:, ch2 : n.shape[1] - ch2, ch2 : n.shape[2] - ch2, :]
        skip0 = skip0[:, cut : skip0.shape[1] - cut, cut : skip0.shape[2] - cut, :]
        h, w = h - 2 * cut, w - 2 * cut

    n = dec_level(p["dec"]["level_0"], n, skip0, (h, w), policy, fast_upsample)

    if stale_halo:
        c2 = _TAIL_DEC0 - _TAIL_HEADS
        n = n[:, c2 : n.shape[1] - c2, c2 : n.shape[2] - c2, :]

    return apply_heads(p, n, sf, policy)


def apply(params: Params, img: jnp.ndarray, sf: int = 2, policy: Policy = F32,
          final_stale_halo: int = 0, fast_upsample: bool = False,
          fuse_input_glue: bool = False):
    """Full 3-level stack. img: [B, H, W, 29] (H, W multiples of 32).

    Returns (pred_l1, pred_l2, pred_l3) at resolutions (H/2, H, 2H) — parity
    with FISRnet.model()'s three-scale outputs. The x1/4 and x1/2 inputs use
    the TF1-legacy bicubic, which for integer factors is exact subsampling.

    final_stale_halo: see apply_level — a discardable halo on img that level
    3 may shrink mid-pipeline (levels 1/2 keep it: their predictions feed the
    next level's input concat and must stay full-size). pred_l3 then carries
    a 6*sf-px stale ring instead of final_stale_halo*sf.

    fuse_input_glue: inference-path rewrite of ALL the inter-level input
    glue (ops/conv.conv_in_fused): the x1/4 and x1/2 strided-slice
    downsamples become strided dilated input convs reading img directly,
    and the level-2/3 [img | prev-pred] channel concats become split
    convs. Math-identical (summation order aside); measured 208 -> 189 ms
    on the (4,6)-tiled 4K pass (PERF.md round 3). Training keeps the
    composed reference formulation.
    """
    # fast_upsample stays OFF for levels 1/2: their internal scales are 1/4
    # to 1/16 of the window, so the folded upconv's 1-px border deviation
    # spans 16+ window px there and diffuses through pred_l1/pred_l2 into
    # every level-3 pixel. Level 3's dec1/dec0 deviations stay inside the
    # discardable halo ring (see apply_level).
    img = policy.cast(img)
    if fuse_input_glue:
        pred_l1 = apply_level(params["level_1"], img, sf, policy, in_stride=4)
        pred_l2 = apply_level(params["level_2"], img, sf, policy,
                              extra=pred_l1, in_stride=2)
        pred_l3 = apply_level(params["level_3"], img, sf, policy,
                              stale_halo=final_stale_halo,
                              fast_upsample=fast_upsample, extra=pred_l2)
        return pred_l1, pred_l2, pred_l3

    img_l1 = downsample_int(img, 4)
    pred_l1 = apply_level(params["level_1"], img_l1, sf, policy)

    img_l2 = jnp.concatenate([downsample_int(img, 2), pred_l1], axis=-1)
    pred_l2 = apply_level(params["level_2"], img_l2, sf, policy)

    img_l3 = jnp.concatenate([img, pred_l2], axis=-1)
    pred_l3 = apply_level(params["level_3"], img_l3, sf, policy,
                          stale_halo=final_stale_halo,
                          fast_upsample=fast_upsample)
    return pred_l1, pred_l2, pred_l3


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
