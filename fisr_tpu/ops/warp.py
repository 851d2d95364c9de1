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
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["dense_image_warp"]


def dense_image_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp `img` by `flow`: out[b,y,x] = img[b, y+v, x+u] (bilinear).

    img:  [B, H, W, C]
    flow: [B, H, W, 2] with channels (u, v)
    """
    b, h, w, c = img.shape
    dtype = img.dtype
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    qx = jnp.clip(gx + flow[..., 0].astype(jnp.float32), 0.0, w - 1.0)
    qy = jnp.clip(gy + flow[..., 1].astype(jnp.float32), 0.0, h - 1.0)

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
