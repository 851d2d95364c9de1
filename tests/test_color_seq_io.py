"""Color transforms, sequence algebra, and file I/O vs reference semantics."""

import numpy as np

from fisr_tpu.data import flo, matio
from fisr_tpu.ops import color, seq


# --- reference twins (independent ports of utils.py / ops.py semantics) ----

def ref_yuv2rgb_matlab(yuv):
    Tinv = np.array([[0.00456621, 0.0, 0.00625893],
                     [0.00456621, -0.00153632, -0.00318811],
                     [0.00456621, 0.00791071, 0.0]])
    offset = [[16], [128], [128]]
    T = 255 * Tinv
    offset = 255 * Tinv @ offset
    rgb = np.zeros(yuv.shape)
    for p in range(3):
        rgb[:, :, p] = (T[p, 0] * yuv[:, :, 0] + T[p, 1] * yuv[:, :, 1]
                        + T[p, 2] * yuv[:, :, 2] - offset[p])
    return np.clip(rgb, 0, 255)


def ref_rgb2yuv(rgb):
    T = np.array([[65.481, 128.553, 24.966],
                  [-37.797, -74.203, 112], [112, -93.786, -18.214]]) / 255
    offset = [16, 128, 128]
    yuv = np.zeros(rgb.shape)
    for p in range(3):
        yuv[:, :, p] = (T[p, 0] * rgb[:, :, 0] + T[p, 1] * rgb[:, :, 1]
                        + T[p, 2] * rgb[:, :, 2] + offset[p])
    return np.clip(yuv, 0, 255)


def ref_merge_seq_dim(d):
    sz = d.shape
    return np.transpose(d, (0, 2, 3, 1, 4)).reshape(sz[0], sz[2], sz[3], sz[1] * sz[4])


def ref_groups2ovlp(g):
    out = [g[:, 0:1], g[:, 1:2], (g[:, 2:3] + g[:, 3:4]) / 2, g[:, 4:5],
           (g[:, 5:6] + g[:, 6:7]) / 2, g[:, 7:8], g[:, 8:9]]
    return np.concatenate(out, axis=1)


def test_yuv2rgb_matlab():
    rng = np.random.default_rng(0)
    yuv = rng.uniform(0, 255, size=(8, 6, 3))
    got = np.asarray(color.yuv2rgb_matlab(yuv))
    np.testing.assert_allclose(got, ref_yuv2rgb_matlab(yuv), rtol=1e-4, atol=1e-3)
    u8 = color.yuv2rgb_matlab_u8(yuv.astype(np.uint8))
    want_u8 = ref_yuv2rgb_matlab(yuv.astype(np.uint8).astype(np.float64)).astype("uint8")
    np.testing.assert_array_equal(u8, want_u8)


def test_rgb2yuv_roundtrip():
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 255, size=(8, 6, 3))
    got = np.asarray(color.rgb2yuv_matlab(rgb))
    np.testing.assert_allclose(got, ref_rgb2yuv(rgb), rtol=1e-4, atol=1e-3)
    # matrices are inverses (within clipping-free interior)
    mid = rng.uniform(90, 160, size=(4, 4, 3))
    back = np.asarray(color.yuv2rgb_matlab(color.rgb2yuv_matlab(mid)))
    np.testing.assert_allclose(back, mid, atol=1e-2)


def test_merge_split_roundtrip_and_parity():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(2, 5, 4, 6, 3)).astype(np.float32)
    merged = np.asarray(seq.merge_seq_dim(x))
    np.testing.assert_allclose(merged, ref_merge_seq_dim(x))
    back = np.asarray(seq.split_seq_dim(merged))
    np.testing.assert_allclose(back, x)


def test_window_channels_strides():
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(1, 4, 4, 15)).astype(np.float32)
    flow = rng.uniform(size=(1, 4, 4, 16)).astype(np.float32)
    warp = rng.uniform(size=(1, 4, 4, 24)).astype(np.float32)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(seq.window_channels(img, i, 3, 9)), img[..., 3 * i : 3 * i + 9])
        np.testing.assert_allclose(
            np.asarray(seq.window_channels(flow, i, 4, 8)), flow[..., 4 * i : 4 * i + 8])
        np.testing.assert_allclose(
            np.asarray(seq.window_channels(warp, i, 6, 12)), warp[..., 6 * i : 6 * i + 12])
    stacked = np.asarray(seq.stack_windows(img, flow, warp))
    assert stacked.shape == (3, 4, 4, 29)
    np.testing.assert_allclose(stacked[1, ..., :9], img[0, ..., 3:12])
    np.testing.assert_allclose(stacked[2, ..., 9:17], flow[0, ..., 8:16])


def test_groups_to_overlap():
    rng = np.random.default_rng(4)
    g = rng.uniform(size=(2, 9, 3, 3, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(seq.groups_to_overlap(g)), ref_groups2ovlp(g))


def test_flo_5dim_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    f = rng.normal(size=(3, 4, 6, 8, 2)).astype(np.float32)
    p = tmp_path / "t.flo"
    flo.write_flo_5dim(f, p)
    np.testing.assert_array_equal(flo.read_flo_5dim(p), f)
    # binary layout parity with the reference reader (utils.py:57-74)
    raw = np.fromfile(p, np.float32)
    assert raw[0] == np.float32(202021.25)
    hdr = np.fromfile(p, np.int32)[1:5]
    assert list(hdr) == [3, 4, 6, 8]


def test_flo_2dim_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    f = rng.normal(size=(5, 7, 2)).astype(np.float32)
    p = tmp_path / "m.flo"
    flo.write_flo(f, p)
    np.testing.assert_array_equal(flo.read_flo(p), f)


def test_mat_roundtrips(tmp_path):
    rng = np.random.default_rng(7)
    warp = rng.uniform(0, 255, size=(3, 2, 6, 8, 3)).astype(np.float32)
    p = tmp_path / "w.mat"
    matio.write_warp_mat(warp, p)
    got = matio.read_warp_mat(p)
    np.testing.assert_allclose(got, warp / 255.0, rtol=1e-6)

    train = rng.uniform(0, 255, size=(4, 5, 6, 8, 3)).astype(np.float32)
    p2 = tmp_path / "t.mat"
    matio.write_train_mat(p2, "LR_data", train)
    got2 = matio.read_train_mat(p2, "LR_data")
    np.testing.assert_allclose(got2, train / 255.0, rtol=1e-6)

    # MATLAB header present
    with open(p, "rb") as fh:
        head = fh.read(128)
    assert head.startswith(b"MATLAB 7.3 MAT-file")
    assert head[124:128] == b"\x00\x02IM"
