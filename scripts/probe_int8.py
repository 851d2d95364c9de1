"""Probe: does XLA expose the v5e int8 MXU path (394 TOPS vs 197 bf16)?

Measures, in ONE process with scalar-readback fences (relay rule):
  A. dense matmul  [8192,512]x[512,512]   bf16 vs int8->int32
  B. 3x3 conv C=64 at the bench patch extent (the N=64-lane-capped shape
     that binds the 4K pass)  bf16 vs int8->int32
  C. 3x3 conv C=128 / C=256 (MXU-filled shapes) bf16 vs int8

If int8 convs run ~2x bf16 at the binding shapes, a quantized fast engine
is worth building; if XLA lowers int8 conv via upcast, drop the idea.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(jnp.mean(x.astype(jnp.float32)))


def timeit(fn, *args, reps=5):
    fence(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    rng = np.random.default_rng(0)

    # ---- A: matmul ----
    m, k, n = 8192, 512, 512
    a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16(a, b):
        # loop to amortize dispatch: 64 dependent matmuls
        def body(c, _):
            return jnp.tanh(c @ b), None
        return jax.lax.scan(body, a, None, length=64)[0]

    @jax.jit
    def mm_int8(a, b):
        def body(c, _):
            o = jax.lax.dot_general(c, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (o >> 8).astype(jnp.int8), None
        return jax.lax.scan(body, a, None, length=64)[0]

    t_bf = timeit(mm_bf16, ab, bb)
    t_i8 = timeit(mm_int8, a8, b8)
    flops = 2 * m * k * n * 64
    print(f"A matmul {m}x{k}x{n} x64: bf16 {t_bf:.2f} ms ({flops/t_bf/1e9:.1f} TF/s)"
          f"  int8 {t_i8:.2f} ms ({flops/t_i8/1e9:.1f} TOP/s)")

    # ---- B/C: convs ----
    def conv(x, w, pet):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    for tag, (b, h, w_, c) in (("B c64-bench", (24, 264, 488, 64)),
                               ("C c128", (24, 132, 244, 128)),
                               ("C c256", (24, 66, 122, 256))):
        x8 = jnp.asarray(rng.integers(-127, 127, (b, h, w_, c)), jnp.int8)
        k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c)), jnp.int8)
        xb, kb = x8.astype(jnp.bfloat16), k8.astype(jnp.bfloat16)

        @jax.jit
        def cv_bf16(x, w):
            def body(cst, _):
                return jnp.maximum(conv(cst, w, jnp.bfloat16), 0), None
            return jax.lax.scan(body, x, None, length=16)[0]

        @jax.jit
        def cv_int8(x, w):
            def body(cst, _):
                o = conv(cst, w, jnp.int32)
                return (o >> 8).astype(jnp.int8), None
            return jax.lax.scan(body, x, None, length=16)[0]

        t_bf = timeit(cv_bf16, xb, kb)
        t_i8 = timeit(cv_int8, x8, k8)
        flops = 2 * 9 * c * c * b * h * w_ * 16
        print(f"{tag} {b}x{h}x{w_}x{c}: bf16 {t_bf:.2f} ms ({flops/t_bf/1e9:.1f} TF/s)"
              f"  int8 {t_i8:.2f} ms ({flops/t_i8/1e9:.1f} TOP/s)")


if __name__ == "__main__":
    main()
