"""Isolate the ~18 ms of non-stage glue in the tiled 4K pass (round-3 item 1).

PERF.md round-2 accounting: per-stage sums ~190 ms vs 207 ms total at the
bench config ((4,6), bf16, 1024x1920). This script measures the glue pieces
in isolation AND A/B-measures rewrite candidates, all in ONE process at
5-rep medians (relay noise +-2-3% — single runs cannot resolve <5 ms).

Run on the real TPU:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_glue.py
"""

import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.device import tiled_apply
from fisr_tpu.infer.halo import halo_exchange, patchify, unpatchify
from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import Policy
from fisr_tpu.ops.resize import downsample_int

POL = Policy(jnp.bfloat16)
H, W = 1024, 1920
GRID = (4, 6)
BOUNDARY = 32


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


def split_slices(x, grid, bh, bw):
    """The current _split: pad + gh*gw overlapping slices + concat."""
    gh, gw = grid
    _b, h, w, _c = x.shape
    sh, sw = h // gh, w // gw
    xp = jnp.pad(x, ((0, 0), (bh, bh), (bw, bw), (0, 0)))
    return jnp.concatenate(
        [xp[:, i * sh : (i + 1) * sh + 2 * bh,
            j * sw : (j + 1) * sw + 2 * bw, :]
         for i in range(gh) for j in range(gw)], 0)


def split_exchange(x, grid, halo):
    """Candidate: reshape-patchify + strip halo_exchange (~8 ops any grid)."""
    return halo_exchange(patchify(x, grid), grid, x.shape[0], halo)


def trim_unpatchify(pred, grid, b, s_h, s_w, th, tw):
    core = pred[:, th : th + s_h * 2, tw : tw + s_w * 2, :]
    return unpatchify(core, grid, b)


def apply_l3_split_conv(params, patches, sf=2):
    """fisrnet.apply but with level-3's 29+9 concat replaced by a split
    enc0 conv_in: conv(img, w[:, :, :29]) + conv(pred_l2, w[:, :, 29:]).
    Only level 3 differs; math identical (conv is linear in channels)."""
    from fisr_tpu.ops import conv as C

    img = POL.cast(patches)
    img_l1 = downsample_int(img, 4)
    pred_l1 = fisrnet.apply_level(params["level_1"], img_l1, sf, POL)
    img_l2 = jnp.concatenate([downsample_int(img, 2), pred_l1], axis=-1)
    pred_l2 = fisrnet.apply_level(params["level_2"], img_l2, sf, POL)

    # --- level 3 inline with split conv_in --------------------------------
    p = params["level_3"]
    cin = p["enc"]["level_0"]["conv_in"]
    w = cin["w"].astype(POL.compute_dtype)
    b_ = cin["b"].astype(POL.compute_dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    n = (jax.lax.conv_general_dilated(img, w[:, :, :29], (1, 1), "SAME",
                                      dimension_numbers=dn,
                                      preferred_element_type=POL.compute_dtype)
         + jax.lax.conv_general_dilated(pred_l2, w[:, :, 29:], (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        preferred_element_type=POL.compute_dtype)
         + b_)
    ep = p["enc"]["level_0"]
    n = C.res_block(ep["res0"], n, POL)
    skip0 = jax.nn.relu(C.res_block(ep["res1"], n, POL))
    n = C.max_pool_2x2(skip0)
    n, skip1 = C.enc_level(p["enc"]["level_1"], n, POL)
    n, skip2 = C.enc_level(p["enc"]["level_2"], n, POL)
    n = C.bottleneck(p["bottleneck"], n, POL)
    h, w2 = img.shape[1], img.shape[2]
    n = C.dec_level(p["dec"]["level_2"], n, skip2, (h // 4, w2 // 4), POL)
    n = C.dec_level(p["dec"]["level_1"], n, skip1, (h // 2, w2 // 2), POL, True)
    # stale shrink (boundary 32)
    cut = 32 - 16
    ch2 = cut // 2
    n = n[:, ch2 : n.shape[1] - ch2, ch2 : n.shape[2] - ch2, :]
    skip0 = skip0[:, cut : skip0.shape[1] - cut, cut : skip0.shape[2] - cut, :]
    h, w2 = h - 2 * cut, w2 - 2 * cut
    n = C.dec_level(p["dec"]["level_0"], n, skip0, (h, w2), POL, True)
    c2 = 16 - 8
    n = n[:, c2 : n.shape[1] - c2, c2 : n.shape[2] - c2, :]
    return fisrnet.apply_heads(p, n, sf, POL)


def main():
    gh, gw = GRID
    s_h, s_w = H // gh, W // gw
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16), fisrnet.init_params(jax.random.PRNGKey(0)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 29), jnp.bfloat16)
    patches = split_slices(x, GRID, BOUNDARY, BOUNDARY)
    print(f"patches {patches.shape}", flush=True)

    # A. the bench path end to end
    a = timeit(lambda p, v: tiled_apply(p, v, GRID, BOUNDARY, 2, POL), params, x)
    print(f"A  tiled_apply (bench path)                 {a:7.1f} ms", flush=True)

    # B. model only on pre-built patches (stale shrink + fast upsample)
    b = timeit(lambda p, v: fisrnet.apply(p, v, 2, POL, final_stale_halo=32,
                                          fast_upsample=True)[2], params, patches)
    print(f"B  apply() on pre-built patches             {b:7.1f} ms", flush=True)

    # C/D. patchify variants in isolation
    c = timeit(lambda v: split_slices(v, GRID, BOUNDARY, BOUNDARY), x)
    print(f"C  patchify: pad + {gh*gw} slices + concat      {c:7.1f} ms", flush=True)
    d = timeit(lambda v: split_exchange(v, GRID, BOUNDARY), x)
    print(f"D  patchify: reshape + strip exchange       {d:7.1f} ms", flush=True)

    # E. trim + unpatchify in isolation (pred shape after stale shrink)
    ph, pw = (s_h + 2 * BOUNDARY - 2 * (BOUNDARY - 8)) * 2, \
             (s_w + 2 * BOUNDARY - 2 * (BOUNDARY - 8)) * 2
    pred = jnp.zeros((gh * gw, ph, pw, 9), jnp.bfloat16)
    e = timeit(lambda v: trim_unpatchify(v, GRID, 1, s_h, s_w, 16, 16), pred)
    print(f"E  trim + unpatchify ({pred.shape})   {e:7.1f} ms", flush=True)
    print(f"   A - B - C - E (unaccounted)              {a-b-c-e:7.1f} ms", flush=True)

    # F. full pass with exchange-based patchify
    def pass_exchange(p, v):
        pt = split_exchange(POL.cast(v), GRID, BOUNDARY)
        pr = fisrnet.apply(p, pt, 2, POL, final_stale_halo=32, fast_upsample=True)[2]
        return trim_unpatchify(pr, GRID, v.shape[0], s_h, s_w, 16, 16)
    f = timeit(pass_exchange, params, x)
    print(f"F  full pass, exchange patchify             {f:7.1f} ms", flush=True)

    # G. model with split-conv level-3 input (no 38-ch concat materialized)
    ref_out = jax.jit(lambda p, v: fisrnet.apply(p, v, 2, POL, final_stale_halo=32,
                                                 fast_upsample=True)[2])(params, patches)
    g_out = jax.jit(apply_l3_split_conv)(params, patches)
    err = float(jnp.max(jnp.abs(g_out.astype(jnp.float32) - ref_out.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref_out.astype(jnp.float32))))
    print(f"   split-conv max abs dev {err:.4g} (scale {scale:.4g})", flush=True)
    g = timeit(apply_l3_split_conv, params, patches)
    print(f"G  apply() with split enc0 conv (no concat) {g:7.1f} ms", flush=True)

    # H. in-model concat costs in isolation (what B pays in glue)
    pred_l2 = jnp.zeros((gh * gw, s_h + 2 * BOUNDARY, s_w + 2 * BOUNDARY, 9),
                        jnp.bfloat16)
    h_ = timeit(lambda a_, b_: jnp.concatenate([a_, b_], -1) * 1.0, patches, pred_l2)
    print(f"H  l3 38-ch concat alone                    {h_:7.1f} ms", flush=True)

    # I. per-patch downsample vs canvas-downsample-then-patchify (levels 1/2
    #    read the same values either way: exact subsampling, halo/4 | halo/2)
    i1 = timeit(lambda v: (downsample_int(v, 4), downsample_int(v, 2)), patches)
    def canvas_down(v):
        d4 = downsample_int(v, 4)
        d2 = downsample_int(v, 2)
        return (split_slices(d4, GRID, BOUNDARY // 4, BOUNDARY // 4),
                split_slices(d2, GRID, BOUNDARY // 2, BOUNDARY // 2))
    i2 = timeit(canvas_down, x)
    print(f"I  downsample per-patch {i1:6.1f} ms vs canvas-then-patchify {i2:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
