"""PSNR / SSIM evaluation metrics.

* `psnr_np`    — exact parity with the reference's numpy PSNR
                 (utils.py:23-26): 10*log10(peak^2 / mse) over the full array.
* `psnr_image` — per-image PSNR over the last 3 axes then caller-side mean,
                 matching `tf.image.psnr` as used for train/val PSNR
                 (FISRnet.py:485-486, 532-533).
* `ssim`       — SSIM, Wang et al. 2004: 11x11 Gaussian window sigma=1.5,
                 K1=0.01, K2=0.03, channel-averaged.

* `ssim_pil_like` — the reference's actual scorer: SSIM_PIL.compare_ssim
                 on uint8 images (FISRnet.py:890-891) — non-overlapping
                 tile_size x tile_size tiles, uniform (unweighted) tile
                 statistics pooled across color bands, L=255, edge pixels
                 beyond the last full tile dropped, mean over tiles.

NOTE on SSIM parity: `ssim` is the standard Gaussian-window definition
(what SSIM_PIL approximates); `ssim_pil_like` reproduces SSIM_PIL's tile
algorithm so the published SSIMs (0.9743 / 0.9921, README.md:97) can be
reproduced. One implementation choice is not pinned upstream-bit-exact:
SSIM_PIL's CPU path computes each tile's statistics with PIL.ImageStat,
which pools all bands of the tile into one population; we do the same
(ddof=0). The pip package is unavailable in this offline image, so the
tests pin hand-computed analytic fixtures of the documented algorithm
rather than package output.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["psnr_np", "psnr_image", "ssim", "ssim_pil_like"]


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


def ssim_pil_like(a: np.ndarray, b: np.ndarray, tile_size: int = 7,
                  k1: float = 0.01, k2: float = 0.03,
                  dynamic_range: float = 255.0) -> float:
    """SSIM the way the reference scores it (SSIM_PIL.compare_ssim).

    a, b: float images in [0, 1], [H, W] or [H, W, C]; quantized to uint8
    exactly like FISRnet.py:890 (`(img * 255).astype('uint8')`, i.e.
    truncation, not rounding). Algorithm: crop to tile_size multiples,
    split into non-overlapping tiles, compute per-tile mean/variance/
    covariance with a uniform window pooling all bands (population
    statistics), per-tile SSIM with C1=(k1*L)^2 C2=(k2*L)^2, mean over
    tiles. Matches SSIM_PIL's documented tile algorithm (tile_size=7
    default); see module docstring for the parity caveat.
    """
    a8 = (np.asarray(a) * 255.0).astype(np.uint8).astype(np.float64)
    b8 = (np.asarray(b) * 255.0).astype(np.uint8).astype(np.float64)
    if a8.ndim == 2:
        a8, b8 = a8[..., None], b8[..., None]
    h, w, c = a8.shape
    th, tw = (h // tile_size) * tile_size, (w // tile_size) * tile_size
    a8, b8 = a8[:th, :tw], b8[:th, :tw]
    # [n_tiles, tile_px * bands] with band-pooled tile populations
    a_t = (a8.reshape(th // tile_size, tile_size, tw // tile_size,
                      tile_size, c)
              .transpose(0, 2, 1, 3, 4).reshape(-1, tile_size * tile_size * c))
    b_t = (b8.reshape(th // tile_size, tile_size, tw // tile_size,
                      tile_size, c)
              .transpose(0, 2, 1, 3, 4).reshape(-1, tile_size * tile_size * c))
    mu_a = a_t.mean(axis=1)
    mu_b = b_t.mean(axis=1)
    var_a = a_t.var(axis=1)          # population (ddof=0), like ImageStat
    var_b = b_t.var(axis=1)
    cov = ((a_t - mu_a[:, None]) * (b_t - mu_b[:, None])).mean(axis=1)
    c1 = (k1 * dynamic_range) ** 2
    c2 = (k2 * dynamic_range) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2))
    return float(s.mean())
