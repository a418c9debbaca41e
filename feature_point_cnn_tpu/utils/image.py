"""Shared host-side image helpers."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def ratio_preserving_crop(image: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Ratio-preserving resize then center crop to ``(H, W)``.

    The reference implements this three times (`preprocess_coco.py:27-33`,
    `inference.py:72-85`, and per-config variants); one helper here, (h, w)
    convention.  ``image``: ``(H, W, C)`` float or uint8; returns the same
    dtype at ``out_hw``.
    """
    import cv2

    oh, ow = out_hw
    ih, iw = image.shape[:2]
    scale = max(oh / ih, ow / iw)
    nh, nw = int(ih * scale), int(iw * scale)
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    y0 = (nh - oh) // 2
    x0 = (nw - ow) // 2
    return resized[y0 : y0 + oh, x0 : x0 + ow]
