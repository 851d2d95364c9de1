"""Probe: packed-domain (space-to-depth) conv rates vs unpacked, real TPU.

Identity: conv3x3-SAME on [B,H,W,C] == 2x2-VALID conv on the 1-padded
s2d-packed tensor [B,H/2,W/2,4C] with a folded [2,2,4C,4Co] kernel (same
derivation as ops/conv._fold_d2s_conv_weights). 1.78x the FLOPs, but K=4C
and N=4Co fill the MXU where C=64 convs run half-empty.
"""
import time
import jax
import jax.numpy as jnp

def time_fn(f, *args, iters=8):
    @jax.jit
    def rep(x, rest):
        def body(c, i):
            y = f(x * (1.0 + i.astype(x.dtype) * 1e-6), *rest)
            return c + jnp.mean(y.astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c
    x, rest = args[0], tuple(args[1:])
    float(rep(x, rest))
    t0 = time.perf_counter()
    float(rep(x, rest))
    return (time.perf_counter() - t0) / iters * 1e3

def conv(x, w, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)

def res_unpacked(x, w0, w1):
    n = conv(jnp.maximum(x, 0), w0)
    n = conv(jnp.maximum(n, 0), w1)
    return x + n

def pconv(z, wall):  # packed conv3x3: [B,h,w,4C] -> [B,h,w,4Co]
    h, w = z.shape[1], z.shape[2]
    co = wall.shape[3] // 4
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = conv(zp, wall, "VALID")  # [B, h+1, w+1, 4Co]
    parts = [out[:, a:a + h, b:b + w, (a * 2 + b) * co:(a * 2 + b + 1) * co]
             for a in (0, 1) for b in (0, 1)]
    return jnp.concatenate(parts, -1)

def res_packed(z, wall0, wall1):
    n = pconv(jnp.maximum(z, 0), wall0)
    n = pconv(jnp.maximum(n, 0), wall1)
    return z + n

def main():
    k = jax.random.PRNGKey(0)
    def r(*s):
        return jax.random.normal(k, s, jnp.bfloat16) * 0.05

    B, H, W = 16, 256, 480   # halo-free patch geometry
    FH, FW = 1024, 1920      # full frame

    out = {}
    # --- res block C=64 ---
    x = r(B, H, W, 64); w0 = r(3, 3, 64, 64); w1 = r(3, 3, 64, 64)
    out["res64 patch unpacked"] = time_fn(res_unpacked, x, w0, w1)
    z = r(B, H // 2, W // 2, 256); a0 = r(2, 2, 256, 256); a1 = r(2, 2, 256, 256)
    out["res64 patch packed"] = time_fn(res_packed, z, a0, a1)
    xf = r(1, FH, FW, 64)
    out["res64 full unpacked"] = time_fn(res_unpacked, xf, w0, w1)
    zf = r(1, FH // 2, FW // 2, 256)
    out["res64 full packed"] = time_fn(res_packed, zf, a0, a1)

    # --- input conv 38->64 ---
    xi = r(B, H, W, 38); wi = r(3, 3, 38, 64)
    out["conv38->64 patch"] = time_fn(lambda t, w: conv(t, w), xi, wi)
    zi = r(B, H // 2, W // 2, 152); ai = r(2, 2, 152, 256)
    out["conv38->64 patch packed"] = time_fn(pconv, zi, ai)
    zfi = r(1, FH // 2, FW // 2, 152)
    out["conv38->64 full packed"] = time_fn(pconv, zfi, ai)
    xp64 = r(B, H, W, 64); wp64 = r(3, 3, 64, 64)
    out["conv64->64 patch"] = time_fn(lambda t, w: conv(t, w), xp64, wp64)

    # --- head conv1 64->256 ---
    wh = r(3, 3, 64, 256)
    out["conv64->256 patch"] = time_fn(lambda t, w: conv(t, w), xp64, wh)
    ah = r(2, 2, 256, 1024)
    out["conv64->256 patch packed"] = time_fn(pconv, z, ah)

    # --- s2d/d2s relayout cost at full res C=64 ---
    def s2d(t):
        n, h, w_, c = t.shape
        t = t.reshape(n, h // 2, 2, w_ // 2, 2, c)
        return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(n, h // 2, w_ // 2, 4 * c)
    out["s2d full 64ch"] = time_fn(s2d, xf)
    def d2s(t):
        n, h, w_, c4 = t.shape
        c = c4 // 4
        t = t.reshape(n, h, w_, 2, 2, c)
        return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * w_, c)
    out["d2s full 256ch"] = time_fn(d2s, zf)

    # --- full-frame packed DEC-like chain: up + conv128->64 + res ---
    nf = r(1, FH // 2, FW // 2, 512)  # packed 4x128
    ar = r(2, 2, 512, 256)
    def dec_chain(t, ar, a0, a1):
        u = pconv(jnp.maximum(t, 0), ar)
        return res_packed(u, a0, a1)
    out["dec-ish full packed"] = time_fn(dec_chain, nf, ar, a0, a1)

    for kk, v in out.items():
        print(f"{kk:28s} {v:8.2f} ms", flush=True)

if __name__ == "__main__":
    main()
