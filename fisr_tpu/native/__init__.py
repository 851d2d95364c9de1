from fisr_tpu.native.bindings import (available, decode_png, decode_png_batch,
                                      encode_png, extract_patches,
                                      gather_rows, rgb2yuv_matlab_u8,
                                      yuv2rgb_matlab_u8)

__all__ = [
    "available", "decode_png", "decode_png_batch", "encode_png",
    "extract_patches", "gather_rows", "rgb2yuv_matlab_u8",
    "yuv2rgb_matlab_u8",
]
