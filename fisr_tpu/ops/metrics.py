"""PSNR / SSIM evaluation metrics.

* `psnr_np`    — exact parity with the reference's numpy PSNR
                 (utils.py:23-26): 10*log10(peak^2 / mse) over the full array.
* `psnr_image` — per-image PSNR over the last 3 axes then caller-side mean,
                 matching `tf.image.psnr` as used for train/val PSNR
                 (FISRnet.py:485-486, 532-533).
* `ssim`       — SSIM, Wang et al. 2004: 11x11 Gaussian window sigma=1.5,
                 K1=0.01, K2=0.03, channel-averaged.

NOTE on SSIM parity: the reference scores SSIM with `SSIM_PIL.compare_ssim`
on uint8 YUV images (FISRnet.py:890-891), a tile-based approximation of
SSIM. We implement the standard Gaussian-window SSIM (the definition
SSIM_PIL approximates); published reference SSIMs (0.9743 / 0.9921) were
produced with SSIM_PIL, so third-digit deviations are expected and
documented rather than replicated.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["psnr_np", "psnr_image", "ssim"]


def psnr_np(img_orig: np.ndarray, img_out: np.ndarray, peak: float = 1.0) -> float:
    mse = np.mean(np.square(img_orig - img_out))
    return float(10.0 * np.log10(peak * peak / mse))


def psnr_image(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR per image over the trailing [H, W, C] axes (tf.image.psnr parity)."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val * max_val / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def _filter2d_valid(x: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable VALID filter over H, W of [B, H, W, C]."""
    import jax

    c = x.shape[-1]
    kh = jnp.tile(k1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # depthwise via feature_group_count
    kw = jnp.tile(k1d.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    return x


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
         filter_size: int = 11, filter_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM per image pair; a, b: [B, H, W, C] (or [H, W, C])."""
    squeeze = a.ndim == 3
    if squeeze:
        a, b = a[None], b[None]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    k = jnp.asarray(_gaussian_kernel(filter_size, filter_sigma))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_a = _filter2d_valid(a, k)
    mu_b = _filter2d_valid(b, k)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _filter2d_valid(a * a, k) - mu_aa
    sigma_bb = _filter2d_valid(b * b, k) - mu_bb
    sigma_ab = _filter2d_valid(a * b, k) - mu_ab

    num = (2.0 * mu_ab + c1) * (2.0 * sigma_ab + c2)
    den = (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    s = jnp.mean(num / den, axis=(-3, -2, -1))
    return s[0] if squeeze else s
