"""Round-3 glue hunt, part 3: bf16 split l2+l3 + fused strided downsampling.

B0  split l3 (bf16 partials)              [glue2's A1 re-measure]
B1  split l2+l3 (bf16 partials)
B2  B1 + levels 1/2 input convs as stride-4/2 DILATED convs reading the
    full-res patch directly (downsample_int folded into the conv: a 3x3
    conv on x[::k, ::k] == the same conv on x with window_strides=k,
    rhs_dilation=k, explicit pad k — no strided-slice intermediate at all)

Run on the real TPU.
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


def conv_strided(p, x, k):
    """3x3 SAME conv on x[::k, ::k] computed from full-res x directly."""
    w = p["w"].astype(POL.compute_dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(k, k), padding=[(k, k), (k, k)],
        rhs_dilation=(k, k), dimension_numbers=DN,
        preferred_element_type=POL.compute_dtype)
    return out + p["b"].astype(POL.compute_dtype)


def conv_pair(p, a, b, k=1):
    """conv(concat([a.down(k), b], -1)) with no concat and no downsample."""
    ca = a.shape[-1]
    w = p["w"]
    wa = w[:, :, :ca].astype(POL.compute_dtype)
    wb = w[:, :, ca:].astype(POL.compute_dtype)
    if k == 1:
        oa = jax.lax.conv_general_dilated(a, wa, (1, 1), "SAME",
                                          dimension_numbers=DN,
                                          preferred_element_type=POL.compute_dtype)
    else:
        oa = jax.lax.conv_general_dilated(a, wa, (k, k), [(k, k), (k, k)],
                                          rhs_dilation=(k, k),
                                          dimension_numbers=DN,
                                          preferred_element_type=POL.compute_dtype)
    ob = jax.lax.conv_general_dilated(b, wb, (1, 1), "SAME",
                                      dimension_numbers=DN,
                                      preferred_element_type=POL.compute_dtype)
    return oa + ob + p["b"].astype(POL.compute_dtype)


def level_custom(p, conv_in_out, h, w, sf, stale_halo, fast_upsample):
    """apply_level body after a custom conv_in (already computed)."""
    n = conv_in_out
    ep = p["enc"]["level_0"]
    n = C.res_block(ep["res0"], n, POL)
    skip0 = jax.nn.relu(C.res_block(ep["res1"], n, POL))
    n = C.max_pool_2x2(skip0)
    n, skip1 = C.enc_level(p["enc"]["level_1"], n, POL)
    n, skip2 = C.enc_level(p["enc"]["level_2"], n, POL)
    n = C.bottleneck(p["bottleneck"], n, POL)
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


def make_pass(split_l2, fused_down):
    gh, gw = GRID
    s_h, s_w = H // gh, W // gw

    def run(params, x):
        bh = bw = BOUNDARY
        xp = jnp.pad(POL.cast(x), ((0, 0), (bh, bh), (bw, bw), (0, 0)))
        img = jnp.concatenate(
            [xp[:, ph * s_h : (ph + 1) * s_h + 2 * bh,
                pw * s_w : (pw + 1) * s_w + 2 * bw, :]
             for ph in range(gh) for pw in range(gw)], 0)
        ph_, pw_ = img.shape[1], img.shape[2]

        # level 1
        if fused_down:
            c1 = conv_strided(params["level_1"]["enc"]["level_0"]["conv_in"],
                              img, 4)
            pred_l1 = level_custom(params["level_1"], c1, ph_ // 4, pw_ // 4,
                                   2, 0, False)
        else:
            pred_l1 = fisrnet.apply_level(params["level_1"],
                                          downsample_int(img, 4), 2, POL)
        # level 2
        if split_l2:
            if fused_down:
                c2 = conv_pair(params["level_2"]["enc"]["level_0"]["conv_in"],
                               img, pred_l1, k=2)
            else:
                c2 = conv_pair(params["level_2"]["enc"]["level_0"]["conv_in"],
                               downsample_int(img, 2), pred_l1, k=1)
            pred_l2 = level_custom(params["level_2"], c2, ph_ // 2, pw_ // 2,
                                   2, 0, False)
        else:
            pred_l2 = fisrnet.apply_level(
                params["level_2"],
                jnp.concatenate([downsample_int(img, 2), pred_l1], -1), 2, POL)
        # level 3 (always split)
        c3 = conv_pair(params["level_3"]["enc"]["level_0"]["conv_in"],
                       img, pred_l2, k=1)
        pred = level_custom(params["level_3"], c3, ph_, pw_, 2, BOUNDARY, True)

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

    for name, sl2, fd in (("B0 split l3 only           ", False, False),
                          ("B1 split l2+l3             ", True, False),
                          ("B2 B1 + fused strided down ", True, True)):
        fn = make_pass(sl2, fd)
        out = jax.jit(fn)(params, x)
        dev = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        t = timeit(fn, params, x)
        print(f"{name} {t:7.1f} ms   max dev {dev:.4g} (scale {scale:.4g})",
              flush=True)


if __name__ == "__main__":
    main()
