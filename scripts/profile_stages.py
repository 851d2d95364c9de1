"""Per-stage timing of the FISRnet 4K pass at bench geometry (real TPU).

Times each U-Net stage at the current (4,4)+32px-halo patch geometry
[16, 320, 544] AND at the minimal-halo geometry a halo-exchange design
would use, to size the win of removing the 41.7% redundant halo compute.

Device-side repetition (lax.scan inside one jit) so the axon relay's
~2 ms/dispatch overhead cannot pollute small-stage numbers.
"""
import time
import functools

import jax
import jax.numpy as jnp

from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import (BF16, bottleneck, conv2d, dec_level, enc_level,
                               head_tail_conv, res_block)

P = BF16


def time_fn(f, *args, iters=8):
    @jax.jit
    def rep(x, rest):
        def body(c, i):
            y = f(x * (1.0 + i.astype(x.dtype) * 1e-6), *rest)
            leaves = [jnp.mean(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(y)]
            return c + sum(leaves), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    x, rest = args[0], args[1:]
    float(rep(x, rest))  # compile + warm (scalar readback = real sync)
    t0 = time.perf_counter()
    float(rep(x, rest))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    rng = jax.random.PRNGKey(0)
    params = fisrnet.init_params(rng)
    lv = params["level_3"]

    def mk(shape):
        return jax.random.uniform(jax.random.PRNGKey(1), shape, jnp.bfloat16)

    class _R(dict):
        def __setitem__(self, k, v):
            print(f"{k:28s} {v:8.2f} ms", flush=True)
            super().__setitem__(k, v)

    results = _R()

    def stage_suite(tag, b, h, w):
        e0 = functools.partial(lambda x: enc_level(lv["enc"]["level_0"], x, P))
        results[f"enc0 {tag}"] = time_fn(e0, mk((b, h, w, 38)))
        e1 = lambda x: enc_level(lv["enc"]["level_1"], x, P)
        results[f"enc1 {tag}"] = time_fn(e1, mk((b, h // 2, w // 2, 64)))
        e2 = lambda x: enc_level(lv["enc"]["level_2"], x, P)
        results[f"enc2 {tag}"] = time_fn(e2, mk((b, h // 4, w // 4, 128)))
        bt = lambda x: bottleneck(lv["bottleneck"], x, P)
        results[f"bott {tag}"] = time_fn(bt, mk((b, h // 8, w // 8, 256)))
        d2 = lambda x, s: dec_level(lv["dec"]["level_2"], x, s, (h // 4, w // 4), P)
        results[f"dec2 {tag}"] = time_fn(
            d2, mk((b, h // 8, w // 8, 512)), mk((b, h // 4, w // 4, 256)))
        d1 = lambda x, s: dec_level(lv["dec"]["level_1"], x, s, (h // 2, w // 2), P)
        results[f"dec1 {tag}"] = time_fn(
            d1, mk((b, h // 4, w // 4, 256)), mk((b, h // 2, w // 2, 128)))
        d0 = lambda x, s: dec_level(lv["dec"]["level_0"], x, s, (h, w), P)
        results[f"dec0 {tag}"] = time_fn(
            d0, mk((b, h // 2, w // 2, 128)), mk((b, h, w, 64)))

        def heads(n):
            ch = 64
            wm = jnp.concatenate([lv["fisr"]["conv0"]["w"],
                                  lv["sr"]["conv0"]["w"]], 3).astype(jnp.bfloat16)
            bm = jnp.concatenate([lv["fisr"]["conv0"]["b"],
                                  lv["sr"]["conv0"]["b"]]).astype(jnp.bfloat16)
            m0 = jax.lax.conv_general_dilated(
                n, wm, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16) + bm

            def run_head(hp, m):
                m = res_block(hp["res0"], m, P)
                m = conv2d(hp["conv1"], jax.nn.relu(m), P)
                return head_tail_conv(hp["conv2"], m, P)

            a = run_head(lv["fisr"], m0[..., :ch])
            s = run_head(lv["sr"], m0[..., ch:])
            return a, s

        results[f"heads {tag}"] = time_fn(heads, mk((b, h, w, 64)))

    # current bench geometry: (4,4) grid, 32 halo -> [16, 320, 544]
    stage_suite("halo32", 16, 320, 544)
    # minimal-halo geometry (halo-exchange would run ~patch-sized, e.g. +8)
    stage_suite("halo8", 16, 272, 496)
    # no-halo geometry
    stage_suite("halo0", 16, 256, 480)

    # whole levels at bench geometry, for the level split
    l1 = lambda x: fisrnet.apply_level(params["level_1"], x, 2, P)
    results["level1 [16,80,136,29]"] = time_fn(l1, mk((16, 80, 136, 29)))
    l2 = lambda x: fisrnet.apply_level(params["level_2"], x, 2, P)
    results["level2 [16,160,272,38]"] = time_fn(l2, mk((16, 160, 272, 38)))
    l3 = lambda x: fisrnet.apply_level(params["level_3"], x, 2, P)
    results["level3 [16,320,544,38]"] = time_fn(l3, mk((16, 320, 544, 38)))

    tot32 = sum(v for k, v in results.items() if "halo32" in k)
    tot8 = sum(v for k, v in results.items() if "halo8" in k)
    tot0 = sum(v for k, v in results.items() if "halo0" in k)
    print(f"\nlevel3 stage sum  halo32={tot32:.1f}  halo8={tot8:.1f}  halo0={tot0:.1f} ms")


if __name__ == "__main__":
    main()
