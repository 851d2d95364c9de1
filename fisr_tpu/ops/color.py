"""YUV <-> RGB color transforms (BT.601, MATLAB ycbcr2rgb/rgb2ycbcr parity).

The reference measures and saves everything in YUV and converts with MATLAB
constants at the output boundary:
  * utils.py:106-115  YUV2RGB_matlab — used in every save path
  * utils.py:94-103   YUV2RGB (float variant, same matrix pre-multiplied)
  * FISR_tfoptflow/FISR_for_video_warp_img_with_flo.py:47-57 RGB2YUV

These operate on [0, 255]-range arrays (any float dtype). Implemented for
jnp so they fuse into on-device pipelines; they accept numpy arrays too
(jnp ops promote). Channel axis is the last axis; any leading shape.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# MATLAB ycbcr2rgb: Tinv from the reference (utils.py:107), rows = R,G,B.
_TINV = np.array(
    [
        [0.00456621, 0.0, 0.00625893],
        [0.00456621, -0.00153632, -0.00318811],
        [0.00456621, 0.00791071, 0.0],
    ],
    dtype=np.float64,
)
_OFFSET_YUV = np.array([16.0, 128.0, 128.0], dtype=np.float64)

# yuv -> rgb: rgb = (255*Tinv) @ yuv - 255*Tinv@offset  (utils.py:108-113)
_M_YUV2RGB = (255.0 * _TINV).astype(np.float32)  # [3(rgb), 3(yuv)]
_B_YUV2RGB = (255.0 * _TINV @ _OFFSET_YUV).astype(np.float32)  # [3]

# rgb -> yuv (FISR_for_video_warp_img_with_flo.py:48-56): T/255 @ rgb + offset
_T_FWD = np.array(
    [
        [65.481, 128.553, 24.966],
        [-37.797, -74.203, 112.0],
        [112.0, -93.786, -18.214],
    ],
    dtype=np.float64,
)
_M_RGB2YUV = (_T_FWD / 255.0).astype(np.float32)  # [3(yuv), 3(rgb)]
_B_RGB2YUV = _OFFSET_YUV.astype(np.float32)

__all__ = ["yuv2rgb_matlab", "rgb2yuv_matlab", "yuv2rgb_matlab_u8",
           "yuv2rgb_float"]

# utils.py:94-103 YUV2RGB — the alternative float-constant variant (the
# MATLAB matrix pre-multiplied out; unclipped). Kept for inventory parity;
# the save paths all use the matlab variant.
_M_YUV2RGB_FLOAT = np.array(
    [
        [1.0, -0.000007154783816076815, 1.4019975662231445],
        [1.0, -0.3441331386566162, -0.7141380310058594],
        [1.0, 1.7720025777816772, 0.00001542569043522235],
    ],
    dtype=np.float32,
)
_B_YUV2RGB_FLOAT = np.array(
    [179.45477266423404, -135.45870971679688, 226.8183044444304], np.float32
)


def yuv2rgb_float(yuv: jnp.ndarray) -> jnp.ndarray:
    """utils.py:94-103 parity (note: NOT clipped, unlike the matlab one)."""
    return _apply_3x3(yuv, _M_YUV2RGB_FLOAT, _B_YUV2RGB_FLOAT, -1.0)


def _apply_3x3(x: jnp.ndarray, m: np.ndarray, b: np.ndarray, sign: float) -> jnp.ndarray:
    """out[..., r] = sum_c m[r, c] * x[..., c] + sign * b[r].

    Written as elementwise multiply-adds (VPU) rather than a dot so the TPU
    never routes a 3-channel color transform through the MXU's bf16 default
    precision — these constants need full f32.
    """
    x = x.astype(jnp.float32)
    chans = [x[..., c] for c in range(3)]
    outs = [
        m[r, 0] * chans[0] + m[r, 1] * chans[1] + m[r, 2] * chans[2] + sign * b[r]
        for r in range(3)
    ]
    return jnp.stack(outs, axis=-1)


def yuv2rgb_matlab(yuv: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """MATLAB-equivalent YUV([0,255]) -> RGB([0,255]); parity: utils.py:106."""
    rgb = _apply_3x3(yuv, _M_YUV2RGB, _B_YUV2RGB, -1.0)
    if clip:
        rgb = jnp.clip(rgb, 0.0, 255.0)
    return rgb


def rgb2yuv_matlab(rgb: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """MATLAB-equivalent RGB([0,255]) -> YUV([0,255]); parity: warp script :47."""
    yuv = _apply_3x3(rgb, _M_RGB2YUV, _B_RGB2YUV, 1.0)
    if clip:
        yuv = jnp.clip(yuv, 0.0, 255.0)
    return yuv


def yuv2rgb_matlab_u8(yuv_u8: np.ndarray) -> np.ndarray:
    """Host-side uint8 YUV -> uint8 RGB exactly as the reference save path
    (utils.py:106-115 followed by `.astype('uint8')`, i.e. truncation)."""
    rgb = (yuv_u8.astype(np.float64) @ _M_YUV2RGB.T.astype(np.float64)) - _B_YUV2RGB.astype(np.float64)
    return np.clip(rgb, 0, 255).astype(np.uint8)
