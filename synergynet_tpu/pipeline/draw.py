"""Visualization: 68-landmark plotting and pose-axis drawing.

Equivalents of the reference's matplotlib/cv2 draw helpers
(utils/inference.py:159-244) with identical visual conventions: green
landmark polylines per facial region with closed eyes/mouth loops, and
RGB(x)=red / y=green / z=blue axes anchored at the nose tip with length
derived from the landmark extent.
"""

from __future__ import annotations

from math import cos, sin, sqrt
from typing import Optional, Sequence

import numpy as np

# Region boundaries of the 68-point markup (utils/inference.py:172).
LANDMARK_GROUPS = [0, 17, 22, 27, 31, 36, 42, 48, 60, 68]
CLOSE_PAIRS = [(41, 36), (47, 42), (59, 48), (67, 60)]


def draw_landmarks(img_bgr: np.ndarray, pts, wfp: Optional[str] = None,
                   dpi: int = 200):
    """Plot landmark sets over the image; saves to ``wfp`` when given and
    returns the matplotlib figure otherwise (caller must close it)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    height, width = img_bgr.shape[:2]
    base = 6.4
    fig = plt.figure(figsize=(base, height / width * base))
    plt.imshow(img_bgr[:, :, ::-1])
    plt.subplots_adjust(left=0, right=1, top=1, bottom=0)
    plt.axis("off")

    if not isinstance(pts, (tuple, list)):
        pts = [pts]
    for p in pts:
        alpha, markersize, lw = 0.8, 1.5, 0.7
        color = markeredgecolor = "green"
        for i1, i2 in CLOSE_PAIRS:
            plt.plot([p[0, i1], p[0, i2]], [p[1, i1], p[1, i2]],
                     color=color, lw=lw, alpha=alpha - 0.1)
        for left, right in zip(LANDMARK_GROUPS[:-1], LANDMARK_GROUPS[1:]):
            plt.plot(p[0, left:right], p[1, left:right], color=color,
                     lw=lw, alpha=alpha - 0.1)
            plt.plot(p[0, left:right], p[1, left:right], marker="o",
                     linestyle="None", markersize=markersize, color=color,
                     markeredgecolor=markeredgecolor, alpha=alpha)
    if wfp is not None:
        plt.savefig(wfp, dpi=dpi)
        plt.close(fig)
        return None
    return fig


def draw_axis(img_bgr: np.ndarray, yaw: float, pitch: float, roll: float,
              pts68: np.ndarray, thickness: int = 4) -> np.ndarray:
    """Draw the head-pose axes in place (utils/inference.py:199-244):
    anchored at landmark 30 (nose tip), length 0.5 * sqrt(bbox area)."""
    import cv2

    pitch_r = pitch * np.pi / 180
    yaw_r = -(yaw * np.pi / 180)
    roll_r = roll * np.pi / 180

    tdx = float(pts68[0, 30])
    tdy = float(pts68[1, 30])
    minx, maxx = float(np.min(pts68[0])), float(np.max(pts68[0]))
    miny, maxy = float(np.min(pts68[1])), float(np.max(pts68[1]))
    size = sqrt((maxx - minx) * (maxy - miny)) * 0.5

    x1 = size * (cos(yaw_r) * cos(roll_r)) + tdx
    y1 = size * (cos(pitch_r) * sin(roll_r)
                 + cos(roll_r) * sin(pitch_r) * sin(yaw_r)) + tdy
    x2 = size * (-cos(yaw_r) * sin(roll_r)) + tdx
    y2 = size * (cos(pitch_r) * cos(roll_r)
                 - sin(pitch_r) * sin(yaw_r) * sin(roll_r)) + tdy
    x3 = size * sin(yaw_r) + tdx
    y3 = size * (-cos(yaw_r) * sin(pitch_r)) + tdy

    cv2.line(img_bgr, (int(tdx), int(tdy)), (int(x1), int(y1)),
             (0, 0, 255), thickness)
    cv2.line(img_bgr, (int(tdx), int(tdy)), (int(x2), int(y2)),
             (0, 255, 0), thickness)
    cv2.line(img_bgr, (int(tdx), int(tdy)), (int(x3), int(y3)),
             (255, 0, 0), thickness)
    return img_bgr


def viz_bbox(img_bgr: np.ndarray, dets: Sequence, vis_thresh: float = 0.5
             ) -> np.ndarray:
    """Draw detector boxes + scores (reference FaceBoxes/FaceBoxes.py:32-44)."""
    import cv2

    for b in dets:
        if b[4] < vis_thresh:
            continue
        text = f"{b[4]:.4f}"
        bi = list(map(int, b[:4]))
        cv2.rectangle(img_bgr, (bi[0], bi[1]), (bi[2], bi[3]), (0, 0, 255), 2)
        cv2.putText(img_bgr, text, (bi[0], bi[1] + 12),
                    cv2.FONT_HERSHEY_DUPLEX, 0.5, (255, 255, 255))
    return img_bgr
