"""dense_image_warp and cost_volume vs independent numpy references."""

import jax
import numpy as np

from fisr_tpu.ops.cost_volume import cost_volume
from fisr_tpu.ops.warp import dense_image_warp


def np_warp(img, flow):
    """Scalar-loop bilinear backward warp with border clamp (cv2.remap
    INTER_LINEAR/BORDER_REPLICATE semantics, warp script :61-67)."""
    b, h, w, c = img.shape
    out = np.zeros_like(img)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                qx = min(max(x + flow[bi, y, x, 0], 0.0), w - 1.0)
                qy = min(max(y + flow[bi, y, x, 1], 0.0), h - 1.0)
                x0, y0 = int(np.floor(qx)), int(np.floor(qy))
                x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
                fx, fy = qx - x0, qy - y0
                top = img[bi, y0, x0] * (1 - fx) + img[bi, y0, x1] * fx
                bot = img[bi, y1, x0] * (1 - fx) + img[bi, y1, x1] * fx
                out[bi, y, x] = top * (1 - fy) + bot * fy
    return out


def np_cost_volume(c1, c2, d):
    b, h, w, c = c1.shape
    pad = np.pad(c2, ((0, 0), (d, d), (d, d), (0, 0)))
    out = np.zeros((b, h, w, (2 * d + 1) ** 2), c1.dtype)
    k = 0
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            out[..., k] = np.mean(c1 * pad[:, dy : dy + h, dx : dx + w, :], axis=-1)
            k += 1
    return out


def test_warp_matches_reference():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 9, 11, 3)).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(2, 9, 11, 2)).astype(np.float32)
    got = np.asarray(dense_image_warp(img, flow))
    np.testing.assert_allclose(got, np_warp(img, flow), rtol=1e-5, atol=1e-5)


def test_warp_patch_variant_matches_taps():
    """The 2x2-patch gather formulation (fast path at large extents) must be
    exact vs both the taps form and the numpy reference, including border
    clamping (x0/y0 clamped with the shift folded into the lerp weight)."""
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(2, 9, 11, 3)).astype(np.float32)
    flow = rng.uniform(-6, 6, size=(2, 9, 11, 2)).astype(np.float32)
    taps = np.asarray(dense_image_warp(img, flow, variant="taps"))
    patch = np.asarray(dense_image_warp(img, flow, variant="patch"))
    np.testing.assert_allclose(patch, taps, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(patch, np_warp(img, flow), rtol=1e-5, atol=1e-5)


def test_warp_patch_variant_differentiable():
    rng = np.random.default_rng(8)
    img = rng.uniform(size=(1, 6, 7, 2)).astype(np.float32)
    flow = rng.uniform(-2, 2, size=(1, 6, 7, 2)).astype(np.float32)

    def loss(f):
        return jax.numpy.sum(dense_image_warp(img, f, variant="patch") ** 2)

    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).max()) > 0


def test_warp_zero_flow_is_identity():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 6, 7, 4)).astype(np.float32)
    got = np.asarray(dense_image_warp(img, np.zeros((1, 6, 7, 2), np.float32)))
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_warp_integer_shift():
    img = np.arange(5 * 6, dtype=np.float32).reshape(1, 5, 6, 1)
    flow = np.zeros((1, 5, 6, 2), np.float32)
    flow[..., 0] = 1.0  # sample one pixel to the right
    got = np.asarray(dense_image_warp(img, flow))
    want = np.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_warp_is_differentiable():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(1, 5, 5, 2)).astype(np.float32)
    flow = rng.uniform(-1, 1, size=(1, 5, 5, 2)).astype(np.float32)

    def loss(f):
        return (dense_image_warp(img, f) ** 2).sum()

    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_cost_volume_matches_reference():
    rng = np.random.default_rng(3)
    c1 = rng.normal(size=(2, 6, 7, 8)).astype(np.float32)
    c2 = rng.normal(size=(2, 6, 7, 8)).astype(np.float32)
    got = np.asarray(cost_volume(c1, c2, 2))
    np.testing.assert_allclose(got, np_cost_volume(c1, c2, 2), rtol=1e-5, atol=1e-5)
    assert cost_volume(c1, c2, 4).shape == (2, 6, 7, 81)


def test_cost_volume_center_is_self_correlation():
    rng = np.random.default_rng(4)
    c1 = rng.normal(size=(1, 4, 4, 16)).astype(np.float32)
    got = np.asarray(cost_volume(c1, c1, 1))
    np.testing.assert_allclose(got[..., 4], np.mean(c1 * c1, -1), rtol=1e-5)
