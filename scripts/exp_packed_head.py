"""Experiment: conv3x3-after-depth_to_space as a packed 2x2 conv.

Identity: y = conv3x3_SAME(d2s(z, 2), w)  ==  interleave of 4 shifted slices
of conv2x2_VALID(pad1(z), w2), where w2 scatters w by (slot_in, slot_out).

Verifies exactness on CPU-style f32 and times both on the TPU at the bench
head-tail geometry.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def depth_to_space(x, block):
    n, h, w, c = x.shape
    c_out = c // (block * block)
    x = x.reshape(n, h, w, block, block, c_out)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h * block, w * block, c_out)


def conv_same(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def naive(z, w):
    return conv_same(depth_to_space(z, 2), w)


def fold_w(w):
    """w [3,3,C,Co] -> w2 [2,2,4C,4Co] for the packed formulation."""
    C, Co = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * C, 4 * Co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            so = a * 2 + b
            for dy in (-1, 0, 1):
                ti = (a + dy) // 2 - a + 1
                al = (a + dy) % 2
                for dx in (-1, 0, 1):
                    tj = (b + dx) // 2 - b + 1
                    be = (b + dx) % 2
                    si = al * 2 + be
                    w2 = w2.at[ti, tj, si * C:(si + 1) * C,
                               so * Co:(so + 1) * Co].set(w[dy + 1, dx + 1])
    return w2


def packed(z, w):
    n, h, wd, c4 = z.shape
    C = c4 // 4
    Co = w.shape[3]
    w2 = fold_w(w)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jax.lax.conv_general_dilated(
        zp, w2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=z.dtype)  # [n, h+1, w+1, 4Co]
    parts = [out[:, a:a + h, b:b + wd, (a * 2 + b) * Co:(a * 2 + b + 1) * Co]
             for a in (0, 1) for b in (0, 1)]
    packed_y = jnp.concatenate(parts, axis=-1)  # slot-major = d2s order
    return depth_to_space(packed_y, 2)


def packed_mm(z, w):
    """Same identity, but the 2x2 conv expressed as 4 shifted 1x1 GEMMs."""
    n, h, wd, c4 = z.shape
    Co = w.shape[3]
    w2 = fold_w(w)  # [2,2,4C,4Co]
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for ti in (0, 1):
        for tj in (0, 1):
            v = zp[:, ti:ti + h + 1, tj:tj + wd + 1, :]
            o = jnp.einsum("nhwc,cd->nhwd", v, w2[ti, tj],
                           preferred_element_type=z.dtype)
            out = o if out is None else out + o
    parts = [out[:, a:a + h, b:b + wd, (a * 2 + b) * Co:(a * 2 + b + 1) * Co]
             for a in (0, 1) for b in (0, 1)]
    return depth_to_space(jnp.concatenate(parts, axis=-1), 2)


def packed_cat(z, w):
    """Concat the 4 shifted views channel-wise, one [4*4C, 4Co] GEMM."""
    n, h, wd, c4 = z.shape
    Co = w.shape[3]
    w2 = fold_w(w).reshape(4 * c4, 4 * Co)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [zp[:, ti:ti + h + 1, tj:tj + wd + 1, :]
             for ti in (0, 1) for tj in (0, 1)]
    big = jnp.concatenate(views, axis=-1)
    out = jnp.einsum("nhwc,cd->nhwd", big, w2, preferred_element_type=z.dtype)
    parts = [out[:, a:a + h, b:b + wd, (a * 2 + b) * Co:(a * 2 + b + 1) * Co]
             for a in (0, 1) for b in (0, 1)]
    return depth_to_space(jnp.concatenate(parts, axis=-1), 2)


def packed_mm_t(z, w):
    """Transposed GEMMs: out lanes = spatial, tiny channel dim streams as
    rows — avoids the 128-lane padding tax entirely."""
    n, h, wd, c4 = z.shape
    Co = w.shape[3]
    w2 = fold_w(w)  # [2,2,4C,4Co]
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for ti in (0, 1):
        for tj in (0, 1):
            v = zp[:, ti:ti + h + 1, tj:tj + wd + 1, :]
            o = jnp.einsum("dc,nhwc->ndhw", w2[ti, tj].T, v,
                           preferred_element_type=z.dtype)
            out = o if out is None else out + o
    # out: [n, 4Co, h+1, w+1] channels-first; interleave slots -> [n,Co,2h,2w]
    parts = [[out[:, (a * 2 + b) * Co:(a * 2 + b + 1) * Co, a:a + h, b:b + wd]
              for b in (0, 1)] for a in (0, 1)]
    rows = [jnp.stack([parts[a][0], parts[a][1]], axis=-1).reshape(n, Co, h, 2 * wd)
            for a in (0, 1)]
    y = jnp.stack(rows, axis=3).reshape(n, Co, 2 * h, 2 * wd)
    return jnp.transpose(y, (0, 2, 3, 1))


def packed_mm_tap(z, w):
    """One [4C -> 16Co] GEMM (all taps at once), then shifted adds."""
    n, h, wd, c4 = z.shape
    Co = w.shape[3]
    w2 = fold_w(w)  # [2,2,4C,4Co]
    wall = jnp.concatenate([w2[ti, tj] for ti in (0, 1) for tj in (0, 1)],
                           axis=1)  # [4C, 16Co]
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    big = jnp.einsum("nhwc,cd->nhwd", zp, wall,
                     preferred_element_type=z.dtype)  # [n,h+2,w+2,16Co]
    out = None
    k = 0
    for ti in (0, 1):
        for tj in (0, 1):
            o = big[:, ti:ti + h + 1, tj:tj + wd + 1,
                    k * 4 * Co:(k + 1) * 4 * Co]
            out = o if out is None else out + o
            k += 1
    parts = [out[:, a:a + h, b:b + wd, (a * 2 + b) * Co:(a * 2 + b + 1) * Co]
             for a in (0, 1) for b in (0, 1)]
    return depth_to_space(jnp.concatenate(parts, axis=-1), 2)


def timeit(f, *args, n=10):
    g = jax.jit(f)
    out = g(*args)
    float(jnp.mean(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    float(jnp.mean(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    # exactness (small, f32)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(2, 8, 12, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 6)) * 0.1, jnp.float32)
    y0 = jax.jit(naive)(z, w)
    for impl in (packed, packed_mm, packed_cat, packed_mm_t, packed_mm_tap):
        y1 = jax.jit(impl)(z, w)
        err = float(jnp.max(jnp.abs(y0 - y1)))
        rel = err / float(jnp.max(jnp.abs(y0)))
        print(f"exactness {impl.__name__}: max abs err {err:.3e} "
              f"(rel {rel:.3e})", flush=True)

    # perf at bench geometry: level_3 head tail, batch 16 tiles 320x544
    for Co, name in ((6, "fisr"), (3, "sr")):
        z = jax.random.normal(jax.random.PRNGKey(1), (16, 320, 544, 256),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 64, Co),
                              jnp.bfloat16) * 0.1
        t0 = timeit(naive, z, w)
        t2 = timeit(packed_mm, z, w)
        t4 = timeit(packed_mm_t, z, w)
        t5 = timeit(packed_mm_tap, z, w)
        print(f"head {name}: naive {t0:.1f} | 4x1x1GEMM {t2:.1f} | "
              f"transposed {t4:.1f} | tap-GEMM {t5:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
