"""Round-3 follow-up: land-quality A/B of the split input-conv rewrite.

profile_glue.py found: patchify/unpatchify are ~free in-context, but
replacing level-3's [img(29) | pred_l2(9)] channel concat + K=38 conv_in
with conv(img, w[:29]) + conv(pred, w[29:]) measures -8.4 ms. This script
measures the full tiled pass with the rewrite in its landable forms:

  A0  current tiled_apply (baseline)
  A1  split conv_in level 3, bf16 partial sums
  A2  split conv_in level 3, f32 accumulate + one cast (numerics ~= fused)
  A3  A2 + split conv_in level 2 as well

Each with max-dev parity vs A0. Run on the real TPU.
"""

import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.device import tiled_apply
from fisr_tpu.infer.halo import unpatchify
from fisr_tpu.models import fisrnet
from fisr_tpu.ops import conv as C
from fisr_tpu.ops.conv import Policy
from fisr_tpu.ops.resize import downsample_int

POL = Policy(jnp.bfloat16)
H, W = 1024, 1920
GRID = (4, 6)
BOUNDARY = 32
DN = ("NHWC", "HWIO", "NHWC")


def timeit(f, *args, n=10, reps=5, warm=2):
    fn = jax.jit(f)
    for _ in range(warm):
        out = fn(*args)
    float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / n * 1e3)
    return sorted(ts)[reps // 2]


def conv_in_pair(p, a, b, acc_f32: bool):
    """conv(concat([a, b], -1), w) without materializing the concat."""
    ca = a.shape[-1]
    w = p["w"]
    acc = jnp.float32 if acc_f32 else POL.compute_dtype
    wa = w[:, :, :ca].astype(POL.compute_dtype)
    wb = w[:, :, ca:].astype(POL.compute_dtype)
    out = (jax.lax.conv_general_dilated(a, wa, (1, 1), "SAME",
                                        dimension_numbers=DN,
                                        preferred_element_type=acc)
           + jax.lax.conv_general_dilated(b, wb, (1, 1), "SAME",
                                          dimension_numbers=DN,
                                          preferred_element_type=acc))
    return (out + p["b"].astype(acc)).astype(POL.compute_dtype)


def level_split(p, img, pred, sf, stale_halo, fast_upsample, acc_f32):
    """fisrnet.apply_level with the input concat replaced by conv_in_pair."""
    n = conv_in_pair(p["enc"]["level_0"]["conv_in"], img, pred, acc_f32)
    ep = p["enc"]["level_0"]
    n = C.res_block(ep["res0"], n, POL)
    skip0 = jax.nn.relu(C.res_block(ep["res1"], n, POL))
    n = C.max_pool_2x2(skip0)
    n, skip1 = C.enc_level(p["enc"]["level_1"], n, POL)
    n, skip2 = C.enc_level(p["enc"]["level_2"], n, POL)
    n = C.bottleneck(p["bottleneck"], n, POL)
    h, w = img.shape[1], img.shape[2]
    n = C.dec_level(p["dec"]["level_2"], n, skip2, (h // 4, w // 4), POL)
    n = C.dec_level(p["dec"]["level_1"], n, skip1, (h // 2, w // 2), POL,
                    fast_upsample)
    if stale_halo:
        cut = stale_halo - 16
        ch2 = cut // 2
        n = n[:, ch2 : n.shape[1] - ch2, ch2 : n.shape[2] - ch2, :]
        skip0 = skip0[:, cut : skip0.shape[1] - cut, cut : skip0.shape[2] - cut, :]
        h, w = h - 2 * cut, w - 2 * cut
    n = C.dec_level(p["dec"]["level_0"], n, skip0, (h, w), POL, fast_upsample)
    if stale_halo:
        c2 = 16 - 8
        n = n[:, c2 : n.shape[1] - c2, c2 : n.shape[2] - c2, :]
    return fisrnet.apply_heads(p, n, sf, POL)


def make_pass(split_l3, split_l2, acc_f32):
    gh, gw = GRID
    s_h, s_w = H // gh, W // gw

    def run(params, x):
        bh = bw = BOUNDARY
        xp = jnp.pad(POL.cast(x), ((0, 0), (bh, bh), (bw, bw), (0, 0)))
        patches = jnp.concatenate(
            [xp[:, ph * s_h : (ph + 1) * s_h + 2 * bh,
                pw * s_w : (pw + 1) * s_w + 2 * bw, :]
             for ph in range(gh) for pw in range(gw)], 0)
        img = patches
        img_l1 = downsample_int(img, 4)
        pred_l1 = fisrnet.apply_level(params["level_1"], img_l1, 2, POL)
        img_l2b = downsample_int(img, 2)
        if split_l2:
            pred_l2 = level_split(params["level_2"], img_l2b, pred_l1, 2, 0,
                                  False, acc_f32)
        else:
            pred_l2 = fisrnet.apply_level(
                params["level_2"], jnp.concatenate([img_l2b, pred_l1], -1), 2, POL)
        if split_l3:
            pred = level_split(params["level_3"], img, pred_l2, 2, BOUNDARY,
                               True, acc_f32)
        else:
            pred = fisrnet.apply_level(
                params["level_3"], jnp.concatenate([img, pred_l2], -1), 2, POL,
                stale_halo=BOUNDARY, fast_upsample=True)
        th = tw = 8 * 2
        core = pred[:, th : th + s_h * 2, tw : tw + s_w * 2, :]
        return unpatchify(core, GRID, x.shape[0])

    return run


def main():
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16), fisrnet.init_params(jax.random.PRNGKey(0)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 29), jnp.bfloat16)

    ref = jax.jit(lambda p, v: tiled_apply(p, v, GRID, BOUNDARY, 2, POL))(params, x)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))

    a0 = timeit(lambda p, v: tiled_apply(p, v, GRID, BOUNDARY, 2, POL), params, x)
    print(f"A0 current tiled_apply            {a0:7.1f} ms", flush=True)

    variants = [("A1 split l3, bf16 partials   ", True, False, False),
                ("A2 split l3, f32 accumulate  ", True, False, True),
                ("A3 split l2+l3, f32 acc      ", True, True, True)]
    for name, l3, l2, f32 in variants:
        fn = make_pass(l3, l2, f32)
        out = jax.jit(fn)(params, x)
        dev = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        t = timeit(fn, params, x)
        print(f"{name} {t:7.1f} ms   max dev {dev:.4g} (scale {scale:.4g})",
              flush=True)


if __name__ == "__main__":
    main()
