"""Partial cost volume (local correlation) for PWC-Net.

TPU-native equivalent of the missing upstream `core_costvol.cost_volume`
(called at model_pwcnet.py:1277): for each of the (2d+1)^2 = 81 integer
shifts of the (warped) second feature map within a +/-d search window, the
channel-mean of the elementwise product with the first feature map:

    cost[b, y, x, (dy+d)*(2d+1)+(dx+d)] = mean_c c1[b,y,x,c] * c2[b,y+dy,x+dx,c]

Out-of-bounds samples contribute zero (zero padding), matching the CUDA
correlation op of the PWC-Net original.

This XLA formulation unrolls the 81 shifts as static slices of a padded
tensor; XLA fuses the multiply-reduce chain and never materializes an
81x-replicated feature map. A hand-tiled Pallas kernel lives in
fisr_tpu.kernels.cost_volume_pallas for the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cost_volume"]


def cost_volume(c1: jnp.ndarray, c2: jnp.ndarray, search_range: int = 4) -> jnp.ndarray:
    """c1, c2: [B, H, W, C] -> [B, H, W, (2*search_range+1)**2]."""
    b, h, w, c = c1.shape
    d = search_range
    pad = jnp.pad(c2, ((0, 0), (d, d), (d, d), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, c1.dtype)
    rows = []
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            shifted = pad[:, dy : dy + h, dx : dx + w, :]
            rows.append(jnp.sum(c1 * shifted, axis=-1) * inv_c)
    return jnp.stack(rows, axis=-1)
