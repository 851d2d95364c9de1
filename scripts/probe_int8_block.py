"""Probe 2: realistic W8A8 res-block chain vs bf16 — requant overhead included.

probe_int8.py showed raw int8 convs run 1.5x bf16 at the binding C=64 shape.
A real quantized engine pays: dynamic per-tensor max-abs scale, round/clip to
int8, int32->scale-multiply dequant epilogues, and higher-precision residual
adds. This measures a faithful enc-level-shaped chain (conv_in + 2 res
blocks + relu + pool) both ways on the bench patch extent.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(jnp.mean(x.astype(jnp.float32)))


def timeit(fn, *args, reps=5):
    fence(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def conv(x, w, pet):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def q8(x):
    """Dynamic per-tensor symmetric int8 quant; returns (q, scale)."""
    s = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def main():
    rng = np.random.default_rng(0)
    b, h, w_, c = 24, 264, 488, 64

    x = jnp.asarray(rng.normal(size=(b, h, w_, c)), jnp.bfloat16)
    ws = [jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
          for _ in range(5)]
    # pre-quantized weights (engine quantizes once at load): per-out-channel
    wqs, wss = [], []
    for w in ws:
        s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0 + 1e-12   # [C_out]
        wqs.append(jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8))
        wss.append(s)
    wbs = [w.astype(jnp.bfloat16) for w in ws]

    @jax.jit
    def enc_bf16(x, wbs):
        n = conv(x, wbs[0], jnp.bfloat16)
        for i in (1, 3):
            r = conv(jax.nn.relu(n), wbs[i], jnp.bfloat16)
            r = conv(jax.nn.relu(r), wbs[i + 1], jnp.bfloat16)
            n = n + r
        n = jax.nn.relu(n)
        return jax.lax.reduce_window(n, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "SAME")

    @jax.jit
    def enc_int8(x, wqs, wss):
        def qconv(t, i, act=None):
            tq, ts_ = q8(act(t) if act is not None else t)
            o = conv(tq, wqs[i], jnp.int32)
            return (o.astype(jnp.float32) * (ts_ * wss[i])).astype(jnp.bfloat16)

        n = qconv(x, 0)
        for i in (1, 3):
            r = qconv(n, i, jax.nn.relu)
            r = qconv(r, i + 1, jax.nn.relu)
            n = n + r
        n = jax.nn.relu(n)
        return jax.lax.reduce_window(n, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "SAME")

    t_bf = timeit(enc_bf16, x, wbs)
    t_i8 = timeit(enc_int8, x, wqs, wss)
    flops = 2 * 9 * c * c * b * h * w_ * 5
    print(f"enc-level chain {b}x{h}x{w_}x{c} (5 convs):")
    print(f"  bf16 {t_bf:.2f} ms ({flops/t_bf/1e9:.1f} TF/s)")
    print(f"  int8 {t_i8:.2f} ms ({flops/t_i8/1e9:.1f} TOP/s)  -> {t_bf/t_i8:.2f}x")

    # numeric sanity: quant error magnitude at this chain depth
    o_bf = enc_bf16(x, wbs).astype(jnp.float32)
    o_i8 = enc_int8(x, wqs, wss).astype(jnp.float32)
    rel = float(jnp.linalg.norm(o_i8 - o_bf) / jnp.linalg.norm(o_bf))
    print(f"  rel L2 deviation int8 vs bf16: {rel:.4f}")


if __name__ == "__main__":
    main()
