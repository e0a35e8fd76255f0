"""Mesh-overlay application wrapper (reference utils/render.py:31-50).

Renders each face's dense mesh (lit, solid) over the input image, then
alpha-composites the rendered layer onto the original with the same rounding
as cv2.addWeighted.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from synergynet_tpu.render.lighting import RenderPipeline, OVERLAY_LIGHT_CFG


def add_weighted_u8(a: np.ndarray, wa: float, b: np.ndarray, wb: float
                    ) -> np.ndarray:
    """cv2.addWeighted(a, wa, b, wb, 0) equivalent: round-half-away, uint8."""
    out = np.floor(a.astype(np.float64) * wa + b.astype(np.float64) * wb + 0.5)
    return np.clip(out, 0, 255).astype(np.uint8)


def render_overlay(img_bgr: np.ndarray,
                   vertices_lst: Sequence[np.ndarray],
                   tri: Optional[np.ndarray],
                   alpha: float = 0.6,
                   connectivity: Optional[np.ndarray] = None,
                   pipeline: Optional[RenderPipeline] = None,
                   texture: Optional[np.ndarray] = None,
                   with_solid: bool = True):
    """Render every face mesh onto ``img_bgr``.

    ``vertices_lst``: per-face (3, N) vertices in image coordinates (the
    decode output layout); ``tri``: (3, T) 0-based triangles
    (``connectivity`` overrides it, reference utils/render.py:35-36);
    ``texture``: optional (N, 3) per-vertex colors in [0, 1], modulated by
    the lighting like the reference's ``tex`` argument. Returns
    (overlay, solid) — ``overlay`` is the alpha-composited result, ``solid``
    the fully-opaque render layer (the reference writes it as ``_solid.png``).
    """
    pipeline = pipeline or RenderPipeline(**OVERLAY_LIGHT_CFG)
    tris = np.ascontiguousarray(
        (connectivity if connectivity is not None else tri).T
    ).astype(np.int32)
    solid = img_bgr.copy()
    for ver in vertices_lst:
        solid = pipeline(np.ascontiguousarray(ver.T, dtype=np.float32),
                         tris, solid, texture=texture)
    res = add_weighted_u8(img_bgr, 1 - alpha, solid, alpha)
    return (res, solid) if with_solid else (res, None)
