"""Dense bilinear backward warping (differentiable).

TPU-native equivalent of the reference's two warp paths:
  * `core_warp.dense_image_warp` (missing upstream module, called at
    model_pwcnet.py:1178) — warps image-2 features toward image-1 by the
    upsampled flow: out(x, y) = img(x + u(x, y), y + v(x, y));
  * the host-side `cv2.remap(..., INTER_LINEAR, BORDER_REPLICATE)` middle-
    frame synthesis (FISR_for_video_warp_img_with_flo.py:61-67).

Convention: `flow[..., 0]` is the horizontal displacement u (x), channel 1
is vertical v (y) — standard optical-flow ordering, same as the .flo files.
Sample coordinates are clamped to the image border (replicate), matching the
cv2 path; differentiable w.r.t. both image and flow (bilinear weights carry
the flow gradient, gathers carry the image gradient).

Two exact formulations, selected by size (measured on v5e, 2026-08-16):
  * `taps`  — four independent per-pixel gathers on the flattened [H*W, C]
    plane. Fastest at small extents (272x480x64: 5.5 ms vs 7.5).
  * `patch` — ONE `lax.gather` of a contiguous 2x2xC patch per output pixel
    (x0 clamped to W-2 / y0 to H-2 with the shift folded into the lerp
    fraction, so the result is bit-identical). Fastest at large extents
    where gather locality dominates (544x960x32: 12.2 ms vs 28.8 — 2.4x;
    1088x1920x3: 37.8 vs 44.6).
An in-kernel Pallas gather is blocked on this Mosaic version (lane gathers
span one vreg only — PERF.md), and reformulating as paired row gathers or
one-hot matmuls measured slower; the adaptive XLA form is the fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dense_image_warp"]

# measured crossover between the two gather formulations (pixels)
_PATCH_MIN_PIXELS = 250_000


def _query_coords(img, flow):
    b, h, w, c = img.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    qx = jnp.clip(gx + flow[..., 0].astype(jnp.float32), 0.0, w - 1.0)
    qy = jnp.clip(gy + flow[..., 1].astype(jnp.float32), 0.0, h - 1.0)
    return qx, qy


def _warp_taps(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Four per-tap gathers (original formulation)."""
    b, h, w, c = img.shape
    dtype = img.dtype
    qx, qy = _query_coords(img, flow)
    x0 = jnp.floor(qx)
    y0 = jnp.floor(qy)
    fx = (qx - x0).astype(dtype)[..., None]
    fy = (qy - y0).astype(dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = img.reshape(b, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(b, h * w, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, c)

    one = jnp.asarray(1.0, dtype)
    top = gather(y0i, x0i) * (one - fx) + gather(y0i, x1i) * fx
    bot = gather(y1i, x0i) * (one - fx) + gather(y1i, x1i) * fx
    return top * (one - fy) + bot * fy


def _warp_patch(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """One contiguous 2x2xC patch gather per output pixel.

    Clamping x0 to W-2 (y0 to H-2) keeps the patch in-bounds; the lerp
    fraction absorbs the shift (fx becomes 1 at the border), so the result
    is bit-identical to the per-tap form with replicate clamping.
    """
    b, h, w, c = img.shape
    dtype = img.dtype
    qx, qy = _query_coords(img, flow)
    x0 = jnp.clip(jnp.floor(qx), 0, w - 2)
    y0 = jnp.clip(jnp.floor(qy), 0, h - 2)
    fx = (qx - x0).astype(dtype)[..., None]
    fy = (qy - y0).astype(dtype)[..., None]
    idx = jnp.stack([y0, x0], -1).astype(jnp.int32).reshape(b, h * w, 2)

    def g(img_, idx_):
        return jax.lax.gather(
            img_, idx_,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(2, 2, c), mode="clip")

    p = jax.vmap(g)(img, idx).reshape(b, h, w, 2, 2, c)
    one = jnp.asarray(1.0, dtype)
    top = p[..., 0, 0, :] * (one - fx) + p[..., 0, 1, :] * fx
    bot = p[..., 1, 0, :] * (one - fx) + p[..., 1, 1, :] * fx
    return top * (one - fy) + bot * fy


def dense_image_warp(img: jnp.ndarray, flow: jnp.ndarray,
                     variant: str = "auto") -> jnp.ndarray:
    """Backward-warp `img` by `flow`: out[b,y,x] = img[b, y+v, x+u] (bilinear).

    img:  [B, H, W, C]
    flow: [B, H, W, 2] with channels (u, v)
    variant: 'auto' (size-based pick), 'taps', or 'patch' — all exact.
    """
    if variant == "auto":
        variant = "patch" if img.shape[1] * img.shape[2] >= _PATCH_MIN_PIXELS else "taps"
    if variant == "patch":
        return _warp_patch(img, flow)
    if variant != "taps":
        raise ValueError(variant)
    return _warp_taps(img, flow)
