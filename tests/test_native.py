"""Native C++ loader: build, and parity with the Python reference paths."""

import numpy as np
import pytest

from fisr_tpu import native
from fisr_tpu.data.png_io import read_png, write_png
from fisr_tpu.ops.color import yuv2rgb_matlab_u8 as np_yuv2rgb


def test_native_builds():
    assert native.available(), "g++/libpng toolchain present — native must build"


def test_png_roundtrip_and_batch(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(4, 24, 32, 3), dtype=np.uint8)
    paths = []
    for i, im in enumerate(imgs):
        p = str(tmp_path / f"f{i}.png")
        write_png(im, p)  # PIL-encoded
        paths.append(p)

    # native single decode == PIL decode
    one = native.decode_png(paths[0])
    np.testing.assert_array_equal(one, imgs[0])

    # native threaded batch decode
    batch = native.decode_png_batch(paths, 24, 32)
    np.testing.assert_array_equal(batch, imgs)

    # native encode -> PIL decode
    p = str(tmp_path / "enc.png")
    native.encode_png(imgs[1], p)
    np.testing.assert_array_equal(read_png(p), imgs[1])


def test_gather_rows():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(50, 7, 5, 3)).astype(np.float32)
    idx = rng.permutation(50)[:8].astype(np.int64)
    got = native.gather_rows(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_color_parity():
    rng = np.random.default_rng(2)
    yuv = rng.integers(0, 256, size=(31, 17, 3), dtype=np.uint8)
    got = native.yuv2rgb_matlab_u8(yuv)
    want = np_yuv2rgb(yuv)
    np.testing.assert_array_equal(got, want)

    rgb = rng.integers(0, 256, size=(31, 17, 3), dtype=np.uint8)
    got = native.rgb2yuv_matlab_u8(rgb)
    from fisr_tpu.ops import color

    want = np.clip(np.asarray(color.rgb2yuv_matlab(rgb.astype(np.float32))),
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_extract_patches():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(40, 60, 29)).astype(np.float32)
    rects = [(0, 0), (8, 12), (24, 28)]
    got = native.extract_patches(src, rects, 16, 32)
    for i, (y, x) in enumerate(rects):
        np.testing.assert_array_equal(got[i], src[y : y + 16, x : x + 32])


def test_crc32c_native_matches_python_and_known_answer():
    """Native slice-by-8 vs the pure-Python table loop (tb_writer's
    fallback), across lengths, seeds, and the RFC 3720 known answer."""
    from fisr_tpu.native import bindings
    from fisr_tpu.utils import tb_writer

    def py_crc(data, crc=0):
        t = tb_writer._crc_table()
        crc ^= 0xFFFFFFFF
        for b in data:
            crc = t[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF

    got = bindings.crc32c(b"123456789")
    if got is None:
        import pytest
        pytest.skip("native library unavailable")
    assert got == 0xE3069283  # RFC 3720 CRC32C check value
    rng = np.random.default_rng(7)
    for n in (0, 1, 7, 8, 9, 63, 64, 1000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for seed in (0, 0xDEADBEEF):
            assert bindings.crc32c(data, seed) == py_crc(data, seed), (n, seed)
