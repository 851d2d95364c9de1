"""Partial cost volume (local correlation) for PWC-Net.

TPU-native equivalent of the missing upstream `core_costvol.cost_volume`
(called at model_pwcnet.py:1277): for each of the (2d+1)^2 = 81 integer
shifts of the (warped) second feature map within a +/-d search window, the
channel-mean of the elementwise product with the first feature map:

    cost[b, y, x, (dy+d)*(2d+1)+(dx+d)] = mean_c c1[b,y,x,c] * c2[b,y+dy,x+dx,c]

Out-of-bounds samples contribute zero (zero padding), matching the CUDA
correlation op of the PWC-Net original.

Formulated as a `lax.fori_loop` over the 81 shifts (one traced body +
dynamic slices) rather than 81 unrolled static slices: the unrolled form
compiles pathologically slowly on TPU at video resolutions, while the loop
compiles in seconds and streams each shift as a fused
multiply-reduce-update pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cost_volume"]


def cost_volume(c1: jnp.ndarray, c2: jnp.ndarray, search_range: int = 4) -> jnp.ndarray:
    """c1, c2: [B, H, W, C] -> [B, H, W, (2*search_range+1)**2]."""
    b, h, w, c = c1.shape
    d = search_range
    n = 2 * d + 1
    pad = jnp.pad(c2, ((0, 0), (d, d), (d, d), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, c1.dtype)

    def shift_cost(k):
        dy = k // n
        dx = k % n
        shifted = jax.lax.dynamic_slice(pad, (0, dy, dx, 0), (b, h, w, c))
        return jnp.sum(c1 * shifted, axis=-1) * inv_c  # [B, H, W]

    # scan over shifts stacking on the LEADING axis (lane-dim dynamic
    # updates compile and run pathologically on TPU), transpose once at the end
    out = jax.lax.map(shift_cost, jnp.arange(n * n))  # [81, B, H, W]
    return jnp.transpose(out, (1, 2, 3, 0))
