"""ctypes bindings for the native loader, with numpy/PIL fallbacks.

Every function works whether or not the .so built: `available()` reports
which path is active. The native path is the production data loader; the
fallback keeps tests/platforms without libpng working.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from fisr_tpu.native.build import build

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    i8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.fisr_decode_png.argtypes = [ctypes.c_char_p, i8p, ctypes.c_int64, i32p, i32p]
    lib.fisr_decode_png.restype = ctypes.c_int
    lib.fisr_decode_png_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, i8p,
        ctypes.c_int32, ctypes.c_int32]
    lib.fisr_decode_png_batch.restype = ctypes.c_int
    lib.fisr_encode_png.argtypes = [ctypes.c_char_p, i8p, ctypes.c_int32, ctypes.c_int32]
    lib.fisr_encode_png.restype = ctypes.c_int
    lib.fisr_gather_rows_f32.argtypes = [f32p, ctypes.c_int64, i64p, ctypes.c_int64, f32p]
    lib.fisr_gather_rows_f32.restype = None
    lib.fisr_yuv2rgb_matlab_u8.argtypes = [i8p, i8p, ctypes.c_int64]
    lib.fisr_yuv2rgb_matlab_u8.restype = None
    lib.fisr_rgb2yuv_matlab_u8.argtypes = [i8p, i8p, ctypes.c_int64]
    lib.fisr_rgb2yuv_matlab_u8.restype = None
    lib.fisr_extract_patches_f32.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f32p]
    lib.fisr_extract_patches_f32.restype = None
    # c_char_p: pass bytes zero-copy (length is explicit, NULs are fine)
    lib.fisr_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_uint32]
    lib.fisr_crc32c.restype = ctypes.c_uint32
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def decode_png(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        from fisr_tpu.data.png_io import read_png

        img = read_png(path)
        return img[..., :3] if img.ndim == 3 else np.stack([img] * 3, -1)
    # probe size cheaply by letting the first decode report dims: allocate
    # generously from the header via PIL-free two-phase read
    from struct import unpack

    with open(path, "rb") as f:
        head = f.read(26)
    w, h = unpack(">II", head[16:24])
    out = np.empty((h, w, 3), np.uint8)
    oh = ctypes.c_int32(0)
    ow = ctypes.c_int32(0)
    rc = lib.fisr_decode_png(path.encode(), _u8p(out), out.size,
                             ctypes.byref(oh), ctypes.byref(ow))
    if rc != 0:
        raise IOError(f"png decode failed ({rc}): {path}")
    return out


def decode_png_batch(paths: Sequence[str], h: int, w: int) -> np.ndarray:
    """Threaded decode of same-sized YUV-container PNGs -> [N, h, w, 3] u8."""
    lib = _load()
    if lib is None:
        return np.stack([decode_png(p) for p in paths])
    n = len(paths)
    stride = max(len(p.encode()) for p in paths) + 1
    buf = np.zeros((n, stride), np.uint8)
    for i, p in enumerate(paths):
        pb = p.encode()
        buf[i, : len(pb)] = np.frombuffer(pb, np.uint8)
    out = np.empty((n, h, w, 3), np.uint8)
    rc = lib.fisr_decode_png_batch(
        buf.ctypes.data_as(ctypes.c_char_p), stride, n, _u8p(out), h, w)
    if rc != 0:
        raise IOError(f"batch png decode failed ({rc})")
    return out


def encode_png(img_u8: np.ndarray, path: str) -> None:
    lib = _load()
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    if lib is None:
        from fisr_tpu.data.png_io import write_png

        write_png(img_u8, path)
        return
    rc = lib.fisr_encode_png(path.encode(), _u8p(img_u8),
                             img_u8.shape[0], img_u8.shape[1])
    if rc != 0:
        raise IOError(f"png encode failed ({rc}): {path}")


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[i] = src[idx[i]]; threaded native memcpy when available."""
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    if lib is None:
        return src[idx]
    idx = np.ascontiguousarray(idx, np.int64)
    row_elems = int(np.prod(src.shape[1:]))
    out = np.empty((len(idx),) + src.shape[1:], np.float32)
    lib.fisr_gather_rows_f32(_f32p(src), row_elems, _i64p(idx), len(idx),
                             _f32p(out))
    return out


def yuv2rgb_matlab_u8(yuv: np.ndarray) -> np.ndarray:
    lib = _load()
    yuv = np.ascontiguousarray(yuv, np.uint8)
    if lib is None:
        from fisr_tpu.ops.color import yuv2rgb_matlab_u8 as np_impl

        return np_impl(yuv)
    out = np.empty_like(yuv)
    lib.fisr_yuv2rgb_matlab_u8(_u8p(yuv), _u8p(out), yuv.size // 3)
    return out


def rgb2yuv_matlab_u8(rgb: np.ndarray) -> np.ndarray:
    lib = _load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if lib is None:
        from fisr_tpu.ops import color

        return np.clip(np.asarray(color.rgb2yuv_matlab(rgb.astype(np.float32))),
                       0, 255).astype(np.uint8)
    out = np.empty_like(rgb)
    lib.fisr_rgb2yuv_matlab_u8(_u8p(rgb), _u8p(out), rgb.size // 3)
    return out


def extract_patches(src: np.ndarray, rects: Sequence[tuple], ph: int, pw: int) -> np.ndarray:
    """src: [H, W, C] f32; rects: [(y0, x0), ...] -> [n, ph, pw, C] f32."""
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    y0s = np.asarray([r[0] for r in rects], np.int64)
    x0s = np.asarray([r[1] for r in rects], np.int64)
    if lib is None:
        return np.stack([src[y : y + ph, x : x + pw] for y, x in rects])
    h, w, c = src.shape
    out = np.empty((len(rects), ph, pw, c), np.float32)
    lib.fisr_extract_patches_f32(_f32p(src), h, w, c, _i64p(y0s), _i64p(x0s),
                                 len(rects), ph, pw, _f32p(out))
    return out


def crc32c(data: bytes, crc: int = 0):
    """Slice-by-8 CRC32C (Castagnoli) over `data`, seeded with `crc`.

    Returns None when the native library is unavailable — callers keep
    their pure-Python table loop as the fallback (convert/tensor_bundle.py,
    utils/tb_writer.py)."""
    lib = _load()
    if lib is None:
        return None
    return int(lib.fisr_crc32c(data, len(data), ctypes.c_uint32(crc)))
