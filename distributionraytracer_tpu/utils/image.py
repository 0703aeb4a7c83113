"""Image IO: PNG write with the reference's u8 conversion.

``saveImgFile`` (main.cpp:251-266) writes img_Data bytes produced by
``u8fromfloat`` (maths.h:126-130): ``x*255.99`` saturated at 255.  The
render buffer is y-up (row 0 = bottom scanline); PNG is y-down, so flip.
"""

from __future__ import annotations

import numpy as np


def to_u8(img: np.ndarray) -> np.ndarray:
    v = np.asarray(img, np.float32) * 255.99
    return np.where(v >= 255.0, 255, v.astype(np.uint8)).astype(np.uint8)


def write_png(path: str, img: np.ndarray):
    """img: (H, W, 3) float in [0,1], row 0 at the bottom."""
    from PIL import Image
    Image.fromarray(to_u8(np.asarray(img))[::-1]).save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image
    a = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return (a[::-1].astype(np.float32) / 255.99)
