"""PSNR / SSIM metric parity."""

import numpy as np

from fisr_tpu.ops.metrics import psnr_image, psnr_np, ssim


def test_psnr_np_reference_formula():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(16, 16, 3))
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1)
    mse = np.mean(np.square(a - b))
    assert abs(psnr_np(a, b, 1.0) - 10 * np.log10(1.0 / mse)) < 1e-9


def test_psnr_image_matches_np_per_image():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(3, 8, 8, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.03, size=a.shape), 0, 1).astype(np.float32)
    got = np.asarray(psnr_image(a, b))
    for i in range(3):
        assert abs(got[i] - psnr_np(a[i], b[i], 1.0)) < 1e-3


def test_ssim_identity_and_range():
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    s_same = np.asarray(ssim(a, a))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    noisy = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    s = np.asarray(ssim(a, noisy))
    assert np.all(s < 1.0) and np.all(s > 0.2)
    very_noisy = rng.uniform(size=a.shape).astype(np.float32)
    assert np.all(np.asarray(ssim(a, very_noisy)) < s)
