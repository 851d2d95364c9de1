"""Per-stage breakdown of the bench 4K pass (run on real TPU).

Times each component of the (4,4)-tiled FISRnet pass at its real shapes to
find where the 236 ms goes. Scratch tool, not part of the package API.
"""

import time

import jax
import jax.numpy as jnp

from fisr_tpu.models import fisrnet
from fisr_tpu.ops import conv as C
from fisr_tpu.ops.conv import Policy
from fisr_tpu.ops.resize import downsample_int


POL = Policy(jnp.bfloat16)


def timeit(fn, *args, n=10, warm=2):
    f = jax.jit(fn)
    for _ in range(warm):
        out = f(*args)
    float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    rng = jax.random.PRNGKey(0)
    params = fisrnet.init_params(rng)

    # bench config: (4,4) tiling of 1024x1920 with 32 halo -> 16 x 320x544
    B, H, W = 16, 320, 544
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 29), jnp.float32)

    print("== whole stack on the patch batch ==", flush=True)
    t_all = timeit(lambda p, x: fisrnet.apply(p, x, 2, POL)[2], params, x)
    print(f"3-level apply [16,320,544,29]: {t_all:.1f} ms", flush=True)

    x1 = downsample_int(x, 4)
    x2 = jnp.concatenate([downsample_int(x, 2),
                          jnp.zeros((B, H // 2, W // 2, 9))], -1)
    x3 = jnp.concatenate([x, jnp.zeros((B, H, W, 9))], -1)
    for name, lv, xi in (("level_1 (1/4)", "level_1", x1),
                         ("level_2 (1/2)", "level_2", x2),
                         ("level_3 (1/1)", "level_3", x3)):
        t = timeit(lambda p, x: fisrnet.apply_level(p, x, 2, POL),
                   params[lv], xi)
        print(f"{name}: {t:.1f} ms", flush=True)

    # --- level_3 internals at their true shapes --------------------------
    p3 = params["level_3"]
    print("== level_3 internals ==", flush=True)
    x3b = POL.cast(x3)
    t = timeit(lambda p, v: C.enc_level(p, v, POL), p3["enc"]["level_0"], x3b)
    print(f"enc0 (38->64 @ {H}x{W}): {t:.1f} ms", flush=True)
    e0 = jnp.zeros((B, H // 2, W // 2, 64), POL.compute_dtype)
    t = timeit(lambda p, v: C.enc_level(p, v, POL), p3["enc"]["level_1"], e0)
    print(f"enc1 (64->128 @ /2): {t:.1f} ms", flush=True)
    e1 = jnp.zeros((B, H // 4, W // 4, 128), POL.compute_dtype)
    t = timeit(lambda p, v: C.enc_level(p, v, POL), p3["enc"]["level_2"], e1)
    print(f"enc2 (128->256 @ /4): {t:.1f} ms", flush=True)
    e2 = jnp.zeros((B, H // 8, W // 8, 256), POL.compute_dtype)
    t = timeit(lambda p, v: C.bottleneck(p, v, POL), p3["bottleneck"], e2)
    print(f"bottleneck (256->512 @ /8): {t:.1f} ms", flush=True)

    bot = jnp.zeros((B, H // 8, W // 8, 512), POL.compute_dtype)
    s2 = jnp.zeros((B, H // 4, W // 4, 256), POL.compute_dtype)
    t = timeit(lambda p, a, s: C.dec_level(p, a, s, (H // 4, W // 4), POL),
               p3["dec"]["level_2"], bot, s2)
    print(f"dec2 (512->256 @ /4): {t:.1f} ms", flush=True)
    d2 = jnp.zeros((B, H // 4, W // 4, 256), POL.compute_dtype)
    s1 = jnp.zeros((B, H // 2, W // 2, 128), POL.compute_dtype)
    t = timeit(lambda p, a, s: C.dec_level(p, a, s, (H // 2, W // 2), POL),
               p3["dec"]["level_1"], d2, s1)
    print(f"dec1 (256->128 @ /2): {t:.1f} ms", flush=True)
    d1 = jnp.zeros((B, H // 2, W // 2, 128), POL.compute_dtype)
    s0 = jnp.zeros((B, H, W, 64), POL.compute_dtype)
    t = timeit(lambda p, a, s: C.dec_level(p, a, s, (H, W), POL),
               p3["dec"]["level_0"], d1, s0)
    print(f"dec0 (128->64 @ /1): {t:.1f} ms", flush=True)

    # heads
    n = jnp.zeros((B, H, W, 64), POL.compute_dtype)

    def head(hp, v):
        m = C.conv2d(hp["conv0"], v, POL)
        m = C.res_block(hp["res0"], m, POL)
        m = C.conv2d(hp["conv1"], jax.nn.relu(m), POL)
        m = C.depth_to_space(jax.nn.relu(m), 2)
        return C.conv2d(hp["conv2"], m, POL)

    t = timeit(head, p3["fisr"], n)
    print(f"head fisr (total): {t:.1f} ms", flush=True)

    t = timeit(lambda hp, v: C.conv2d(hp["conv0"], v, POL), p3["fisr"], n)
    print(f"  head conv0 64->64 @ {H}x{W}: {t:.1f} ms", flush=True)
    t = timeit(lambda hp, v: C.res_block(hp["res0"], v, POL), p3["fisr"], n)
    print(f"  head res0 @ {H}x{W}: {t:.1f} ms", flush=True)
    t = timeit(lambda hp, v: C.conv2d(hp["conv1"], v, POL), p3["fisr"], n)
    print(f"  head conv1 64->256 @ {H}x{W}: {t:.1f} ms", flush=True)
    m = jnp.zeros((B, 2 * H, 2 * W, 64), POL.compute_dtype)
    t = timeit(lambda hp, v: C.conv2d(hp["conv2"], v, POL), p3["fisr"], m)
    print(f"  head conv2 64->6 @ {2*H}x{2*W}: {t:.1f} ms", flush=True)

    # single building blocks at enc0 geometry
    print("== building blocks @ level_3 full res ==", flush=True)
    v64 = jnp.zeros((B, H, W, 64), POL.compute_dtype)
    t = timeit(lambda p, v: C.res_block(p, v, POL), p3["enc"]["level_0"]["res0"], v64)
    print(f"res_block C=64 @ {H}x{W} (x{B}): {t:.1f} ms", flush=True)
    t = timeit(lambda p, v: C.conv2d(p, v, POL), p3["enc"]["level_0"]["res0"]["conv0"], v64)
    print(f"conv 64->64 @ {H}x{W} (x{B}): {t:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
