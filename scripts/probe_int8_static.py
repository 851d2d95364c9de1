"""Probe 3: int8 enc chain with STATIC calibrated scales (no max reduce).

probe_int8_block.py showed dynamic per-tensor requant eats the int8 win
(1.06x): the max-abs reduce is an extra HBM pass per conv. Serving engines
calibrate activation scales offline. Two variants vs the same bf16 chain:

  V1: static scales, bf16 activations between convs (quant pass fuses with
      the producer epilogue).
  V2: int-domain chaining — conv int32 output requantizes STRAIGHT to the
      next layer's int8 with a combined per-channel scale; relu runs on int8
      (scale > 0 so relu commutes); bf16 only at residual joins.
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


def main():
    rng = np.random.default_rng(0)
    b, h, w_, c = 24, 264, 488, 64

    x = jnp.asarray(rng.normal(size=(b, h, w_, c)), jnp.bfloat16)
    ws = [jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
          for _ in range(5)]
    wqs, wss = [], []
    for w in ws:
        s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0 + 1e-12
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

    # --- calibrate static activation scales from one f32 pass ---
    def enc_trace(x, ws):
        acts = [x.astype(jnp.float32)]
        n = conv(acts[0], ws[0], jnp.float32)
        for i in (1, 3):
            a = jax.nn.relu(n); acts.append(a)
            r = conv(a, ws[i], jnp.float32)
            a = jax.nn.relu(r); acts.append(a)
            r = conv(a, ws[i + 1], jnp.float32)
            n = n + r
        return acts
    acts = enc_trace(x, ws)
    a_scales = [float(jnp.max(jnp.abs(a)) / 127.0) + 1e-12 for a in acts]

    def quant_to(t, s):
        return jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)

    @jax.jit
    def enc_v1(x, wqs, wss):
        def qconv(t, i, s_in, act=None):
            if act is not None:
                t = act(t)
            o = conv(quant_to(t, s_in), wqs[i], jnp.int32)
            return (o.astype(jnp.float32) * (s_in * wss[i])).astype(jnp.bfloat16)

        n = qconv(x, 0, a_scales[0])
        k = 1
        for i in (1, 3):
            r = qconv(n, i, a_scales[k], jax.nn.relu); k += 1
            r = qconv(r, i + 1, a_scales[k], jax.nn.relu); k += 1
            n = n + r
        n = jax.nn.relu(n)
        return jax.lax.reduce_window(n, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "SAME")

    @jax.jit
    def enc_v2(x, wqs, wss):
        # int-domain: conv -> int32 -> requant straight to next int8
        def requant(o32, s_comb):
            # relu on the int32 accumulator (scale>0), then rescale to int8
            o = jnp.maximum(o32, 0)
            return jnp.clip(jnp.round(o.astype(jnp.float32) * s_comb),
                            -127, 127).astype(jnp.int8)

        q = quant_to(x, a_scales[0])
        o32 = conv(q, wqs[0], jnp.int32)                     # conv_in (no relu yet)
        n_bf = (o32.astype(jnp.float32) * (a_scales[0] * wss[0])).astype(jnp.bfloat16)
        k = 1
        for i in (1, 3):
            # relu(n) quantized once
            q = quant_to(jax.nn.relu(n_bf), a_scales[k])
            o32 = conv(q, wqs[i], jnp.int32)
            # fused: relu + requant to next layer's int8 (combined scale vec)
            s_comb = (a_scales[k] * wss[i] / a_scales[k + 1]).astype(jnp.float32)
            q2 = requant(o32, s_comb)
            k += 1
            o32 = conv(q2, wqs[i + 1], jnp.int32)
            r_bf = (o32.astype(jnp.float32) * (a_scales[k] * wss[i + 1])).astype(jnp.bfloat16)
            k += 1
            n_bf = n_bf + r_bf
        n = jax.nn.relu(n_bf)
        return jax.lax.reduce_window(n, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "SAME")

    @jax.jit
    def enc_v3(x, wqs, wss):
        # V3: pet=f32 on the int8 conv — XLA keeps the int8 MXU path AND
        # fuses the scale/relu/requant epilogue, so the int32 accumulator
        # never touches HBM (the V1/V2 killer).
        def qconv_f32(q, i, s_in):
            o = conv(q, wqs[i], jnp.float32)
            return o * (s_in * wss[i])          # f32, fused epilogue

        def to_q(t_f32, s):                      # round/clip/cast, fusable
            return jnp.clip(jnp.round(t_f32 / s), -127, 127).astype(jnp.int8)

        q = to_q(x.astype(jnp.float32), a_scales[0])
        n = qconv_f32(q, 0, a_scales[0])         # conv_in
        k = 1
        for i in (1, 3):
            q = to_q(jax.nn.relu(n), a_scales[k])
            r = qconv_f32(q, i, a_scales[k]); k += 1
            q = to_q(jax.nn.relu(r), a_scales[k])
            r = qconv_f32(q, i + 1, a_scales[k]); k += 1
            n = n + r
        n = jax.nn.relu(n).astype(jnp.bfloat16)
        return jax.lax.reduce_window(n, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "SAME")

    @jax.jit
    def enc_v4(x, wqs, wss):
        # V4: pet=f32 int8 convs; epilogues emit int8 (interlayer) or bf16
        # (residual joins) straight out of the fused epilogue. No f32 or
        # int32 tensor ever reaches HBM; interlayer tensors are 1 byte.
        def to_q(t, s):
            return jnp.clip(jnp.round(t / s), -127, 127).astype(jnp.int8)

        def qconv(q, i, s_in):
            return conv(q, wqs[i], jnp.float32) * (s_in * wss[i])

        q = to_q(x.astype(jnp.float32), a_scales[0])
        n = qconv(q, 0, a_scales[0]).astype(jnp.bfloat16)
        k = 1
        for i in (1, 3):
            q = to_q(jax.nn.relu(n).astype(jnp.float32), a_scales[k])
            a = qconv(q, i, a_scales[k]); k += 1
            q = to_q(jax.nn.relu(a), a_scales[k])        # int8 interlayer
            r = qconv(q, i + 1, a_scales[k]).astype(jnp.bfloat16); k += 1
            n = n + r
        n = jax.nn.relu(n)
        return jax.lax.reduce_window(n, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "SAME")

    t_bf = timeit(enc_bf16, x, wbs)
    t_v1 = timeit(enc_v1, x, wqs, wss)
    t_v2 = timeit(enc_v2, x, wqs, wss)
    t_v3 = timeit(enc_v3, x, wqs, wss)
    t_v4 = timeit(enc_v4, x, wqs, wss)
    flops = 2 * 9 * c * c * b * h * w_ * 5
    print(f"enc-level chain {b}x{h}x{w_}x{c} (5 convs):")
    print(f"  bf16      {t_bf:.2f} ms ({flops/t_bf/1e9:.1f} TF/s)")
    print(f"  int8 V1   {t_v1:.2f} ms -> {t_bf/t_v1:.2f}x")
    print(f"  int8 V2   {t_v2:.2f} ms -> {t_bf/t_v2:.2f}x")
    print(f"  int8 V3   {t_v3:.2f} ms -> {t_bf/t_v3:.2f}x")
    print(f"  int8 V4   {t_v4:.2f} ms -> {t_bf/t_v4:.2f}x")

    o_bf = enc_bf16(x, wbs).astype(jnp.float32)
    for tag, fn in (("V1", enc_v1), ("V2", enc_v2), ("V3", enc_v3), ("V4", enc_v4)):
        o = fn(x, wqs, wss).astype(jnp.float32)
        rel = float(jnp.linalg.norm(o - o_bf) / jnp.linalg.norm(o_bf))
        print(f"  rel L2 deviation {tag}: {rel:.4f}")


if __name__ == "__main__":
    main()
