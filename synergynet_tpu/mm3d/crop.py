"""Host-side crop geometry: bbox squaring and zero-padded cropping.

These run on the host (numpy, uint8 images) before pixels ever reach the
device — the TPU program starts at the fixed-size 120x120 crop. Semantics
mirror the reference exactly:

- ``square_box``: enlarge a detector rect to a square with margin 1.2x the
  *y-extent* (an intentional reference quirk, synergy3DMM.py:181-185).
- ``crop_img``: integer-rounded, zero-padded out-of-bounds crop
  (utils/inference.py:95-125).
"""

from __future__ import annotations

import numpy as np


def square_box(rect) -> np.ndarray:
    """[xmin, ymin, xmax, ymax, ...] -> square roi_box [sx, sy, ex, ey].

    Side length derives from the y-extent only, margin factor 1.2 with floor
    division by 2 — bit-for-bit the reference's squaring rule.
    """
    rect = np.asarray(rect, np.float64)
    hc = (rect[1] + rect[3]) / 2
    wc = (rect[0] + rect[2]) / 2
    side = rect[3] - rect[1]
    margin = side * 1.2 // 2
    return np.array([wc - margin, hc - margin, wc + margin, hc + margin],
                    np.float64)


def crop_img(img: np.ndarray, roi_box) -> np.ndarray:
    """Zero-padded crop of ``img`` at ``roi_box`` [sx, sy, ex, ey, ...]."""
    h, w = img.shape[:2]
    sx, sy, ex, ey = [int(round(float(v))) for v in np.asarray(roi_box)[:4]]
    dh, dw = ey - sy, ex - sx
    if img.ndim == 3:
        res = np.zeros((dh, dw, 3), dtype=np.uint8)
    else:
        res = np.zeros((dh, dw), dtype=np.uint8)
    dsx = -sx if sx < 0 else 0
    sx = max(sx, 0)
    dex = dw - (ex - w) if ex > w else dw
    ex = min(ex, w)
    dsy = -sy if sy < 0 else 0
    sy = max(sy, 0)
    dey = dh - (ey - h) if ey > h else dh
    ey = min(ey, h)
    res[dsy:dey, dsx:dex] = img[sy:ey, sx:ex]
    return res
