"""TF1-compatible image resize (legacy coordinate transform), NHWC.

FISRnet's multi-scale stack is built on TF 1.13 `tf.image.resize_images`
with its default `align_corners=False` *legacy* (non-half-pixel) transform:

    in_coord = out_coord * (in_size / out_size)

(reference: FISRnet.py:81,112,263-264 bicubic pyramid; ops.py:69 decoder
bilinear x2 upsample; model_pwcnet.py:1589 final bilinear x4). `jax.image.
resize` uses half-pixel centers, which drifts by up to half a pixel — enough
to cost dB at 4K — so we implement the legacy transform exactly.

Two useful exact identities under the legacy transform (exploited below):

* integer-factor DOWNscale is pure subsampling: in = out * f is integral, so
  bilinear weight is 1.0 on a single tap and the Keys bicubic kernel weights
  collapse to [0, 1, 0, 0]. `resize(x, (h//2, w//2), BICUBIC)` == `x[::2, ::2]`.
* bilinear x4 upscale == two chained x2 upscales (linear interpolation is
  closed under midpoint refinement on aligned grids).

All functions are jit-friendly: index/weight tables are computed with numpy
at trace time (shapes are static) and baked into the program as constants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["resize_tf1", "upsample2x_bilinear", "downsample_int"]


def _keys_cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with A=-0.75 (TF / OpenCV convention)."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=256)
def _interp_tables(in_size: int, out_size: int, method: str):
    """Gather indices + weights for 1-D legacy-transform interpolation.

    Returns (idx, w): int32 [taps, out_size], float32 [taps, out_size].
    Indices are clamped to [0, in_size-1]; weights are the raw kernel values
    (TF legacy behavior: clamp indices, do not renormalize weights).
    """
    scale = in_size / out_size
    coords = np.arange(out_size, dtype=np.float64) * scale
    base = np.floor(coords).astype(np.int64)
    frac = coords - base
    if method == "bilinear":
        offsets = np.array([0, 1])
        weights = np.stack([1.0 - frac, frac])
    elif method == "bicubic":
        offsets = np.array([-1, 0, 1, 2])
        weights = np.stack([_keys_cubic(frac - o) for o in offsets])
    else:
        raise ValueError(f"unknown resize method: {method}")
    idx = np.clip(base[None, :] + offsets[:, None], 0, in_size - 1)
    return idx.astype(np.int32), weights.astype(np.float32)


def _resize_axis(x: jnp.ndarray, out_size: int, axis: int, method: str) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size % out_size == 0:
        # Exact subsampling identity (see module docstring).
        step = in_size // out_size
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, in_size, step)
        return x[tuple(sl)]
    idx, w = _interp_tables(in_size, out_size, method)
    acc = None
    wshape = [1] * x.ndim
    wshape[axis] = out_size
    for t in range(idx.shape[0]):
        tap = jnp.take(x, jnp.asarray(idx[t]), axis=axis)
        wt = jnp.asarray(w[t]).reshape(wshape).astype(x.dtype)
        acc = tap * wt if acc is None else acc + tap * wt
    return acc


def resize_tf1(x: jnp.ndarray, size: tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    """Resize NHWC (or HWC) `x` to spatial `size` with TF1 legacy semantics.

    Equivalent to TF1.13 `tf.image.resize_images(x, size, method)` with the
    default align_corners=False (no half-pixel centers).
    """
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    h, w = x.shape[h_axis], x.shape[w_axis]
    # bilinear 2^k upscale == chained x2 (exact identity under the legacy
    # transform); the x2 path is shift/average ops instead of gathers
    if method == "bilinear" and size[0] % h == 0 and size[1] % w == 0:
        fh, fw = size[0] // h, size[1] // w
        if fh == fw and fh in (2, 4, 8, 16):
            for _ in range(fh.bit_length() - 1):
                x = upsample2x_bilinear(x)
            return x
    x = _resize_axis(x, size[0], h_axis, method)
    x = _resize_axis(x, size[1], w_axis, method)
    return x


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Exact TF1-legacy bilinear x2 upsample of NHWC (gather-free hot path).

    Legacy transform: out[2i] = in[i]; out[2i+1] = (in[i] + in[i+1]) / 2,
    clamped at the bottom/right edge (the last odd output reads in[i] twice).
    Used by the U-Net decoder (ops.py:69) — implemented with shifts/avgs that
    XLA fuses into the surrounding convs instead of gathers.
    """
    h_axis, w_axis = x.ndim - 3, x.ndim - 2

    def up_axis(v, axis):
        nxt = jnp.concatenate(
            [jax_take_tail(v, axis), jax_last_slice(v, axis)], axis=axis
        )
        half = (v + nxt) * jnp.asarray(0.5, v.dtype)
        stacked = jnp.stack([v, half], axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] *= 2
        return stacked.reshape(new_shape)

    return up_axis(up_axis(x, h_axis), w_axis)


def jax_take_tail(v, axis):
    sl = [slice(None)] * v.ndim
    sl[axis] = slice(1, None)
    return v[tuple(sl)]


def jax_last_slice(v, axis):
    sl = [slice(None)] * v.ndim
    sl[axis] = slice(-1, None)
    return v[tuple(sl)]


def downsample_int(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Integer-factor legacy-transform downscale == strided subsampling."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    sl = [slice(None)] * x.ndim
    sl[h_axis] = slice(0, None, factor)
    sl[w_axis] = slice(0, None, factor)
    return x[tuple(sl)]
