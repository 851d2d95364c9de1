"""PNG frame I/O (YUV-as-RGB-container convention of the FISR datasets).

The reference stores YUV frames in ordinary 3-channel PNGs (the channels are
Y, U, V — not RGB) and saves predictions both as converted RGB and raw YUV
PNGs (FISRnet.py:901-910, 1063-1077). PIL handles the codec.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

__all__ = ["read_png", "write_png", "list_pngs"]


def read_png(path: str | os.PathLike) -> np.ndarray:
    """Read a PNG as uint8 [H, W, C]."""
    return np.array(Image.open(path))


def write_png(img_u8: np.ndarray, path: str | os.PathLike) -> None:
    Image.fromarray(np.asarray(img_u8, dtype=np.uint8)).save(path)


def list_pngs(folder: str | os.PathLike, sort: bool = True) -> list[str]:
    import glob

    paths = glob.glob(os.path.join(str(folder), "*.png"))
    return sorted(paths) if sort else paths
