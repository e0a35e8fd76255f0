"""Per-pixel UV texture-mapped rendering.

Equivalent of the reference's ``_render_texture_core``
(Sim3DR/lib/rasterize_kernel.cpp, declared rasterize.h:103-108 — present in
the native library but never exposed through the Cython bridge): for every
pixel, find the visible triangle, interpolate its corners' UV coordinates
with the barycentric weights, and sample the texture image (nearest or
bilinear).

Built on the same segment-reduction visibility resolve as the color rasterizer:
instead of interpolating per-vertex colors through the sort, the fragment
carries its interpolated (u, v) texture coordinates, and the winning
fragment's UVs drive one final texture sample per drawn pixel.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synergynet_tpu.render.raster import (_fragment_windows,
                                          _resolve_winners, blend_uint8,
                                          window_for)


@partial(jax.jit, static_argnames=("h", "w", "win_h", "win_w", "bilinear"))
def rasterize_texture_buffers(vertices: jnp.ndarray, triangles: jnp.ndarray,
                              tex_coords: jnp.ndarray, texture: jnp.ndarray,
                              *, h: int, w: int, win_h: int = 4,
                              win_w: int = 4, bilinear: bool = True
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(zbuf (h, w), color (h, w, 3) in [0, 1]) from a UV-mapped mesh.

    ``tex_coords``: (V, 2) per-vertex (u, v) in [0, 1] (v up, like BFM_UV);
    ``texture``: (TH, TW, 3) float in [0, 1] or uint8.
    """
    # Interpolate UVs through the fragment generator by treating (u, v, 0)
    # as "colors" — same weights, same coverage.
    uv3 = jnp.concatenate([tex_coords.astype(jnp.float32),
                           jnp.zeros((tex_coords.shape[0], 1), jnp.float32)],
                          axis=1)
    pix, depth, uvz, _ = _fragment_windows(
        vertices, triangles, uv3, h, w, win_h, win_w)
    zbuf, win_idx, drawn = _resolve_winners(pix, depth, h, w)
    ubuf = jnp.where(drawn, uvz[win_idx, 0], 0.0)
    vbuf = jnp.where(drawn, uvz[win_idx, 1], 0.0)
    color = _sample_texture(ubuf, vbuf, texture, bilinear)
    return zbuf.reshape(h, w), color.reshape(h, w, 3)


def _sample_texture(ubuf, vbuf, texture, bilinear):
    """Per-pixel texture lookup from interpolated UVs (flat or 2-D)."""
    tex = texture.astype(jnp.float32)
    if texture.dtype == jnp.uint8:
        tex = tex / 255.0
    th, tw = tex.shape[:2]
    # v is measured from the bottom (BFM_UV convention; the reference flips
    # the texture vertically before lookup, artistic.py:111-113).
    tx = ubuf * (tw - 1)
    ty = (1.0 - vbuf) * (th - 1)
    if bilinear:
        x0 = jnp.clip(jnp.floor(tx), 0, tw - 1)
        y0 = jnp.clip(jnp.floor(ty), 0, th - 1)
        x1 = jnp.clip(x0 + 1, 0, tw - 1)
        y1 = jnp.clip(y0 + 1, 0, th - 1)
        fx = (tx - x0)[..., None]
        fy = (ty - y0)[..., None]
        g = lambda yy, xx: tex[yy.astype(jnp.int32), xx.astype(jnp.int32)]
        return ((g(y0, x0) * (1 - fx) + g(y0, x1) * fx) * (1 - fy)
                + (g(y1, x0) * (1 - fx) + g(y1, x1) * fx) * fy)
    return tex[jnp.clip(jnp.round(ty), 0, th - 1).astype(jnp.int32),
               jnp.clip(jnp.round(tx), 0, tw - 1).astype(jnp.int32)]


@partial(jax.jit, static_argnames=("h", "w", "ry", "rx", "bilinear",
                                   "interpret"))
def rasterize_texture_buffers_tiled(vertices, triangles, tex_coords,
                                    texture, *, h: int, w: int, ry: int = 2,
                                    rx: int = 2, bilinear: bool = True,
                                    interpret: bool = False):
    """Tiled-Pallas variant of :func:`rasterize_texture_buffers`: the UV
    coordinates ride as two affine payload planes through the tile-binned
    kernel, and the winning pixel's UVs drive the texture sample."""
    from synergynet_tpu.render.raster import DEPTH_INIT
    from synergynet_tpu.render.raster_tiled import _plane_setup, _run_tiled

    tc = tex_coords.astype(jnp.float32)
    rec = _plane_setup(vertices, triangles, [tc[:, 0], tc[:, 1]])
    zbuf, pays = _run_tiled(rec, vertices, triangles, h=h, w=w, ry=ry,
                            rx=rx, n_payload=2, interpret=interpret)
    drawn = zbuf > DEPTH_INIT
    ubuf = jnp.where(drawn, pays[0], 0.0)
    vbuf = jnp.where(drawn, pays[1], 0.0)
    return zbuf, _sample_texture(ubuf, vbuf, texture, bilinear)


def render_texture(vertices, triangles, tex_coords, texture, bg,
                   alpha: float = 1.0, reverse: bool = False,
                   window: Optional[Tuple[int, int]] = None,
                   bilinear: bool = True) -> np.ndarray:
    """UV texture-mapped render over a uint8 background.

    vertices (V, 3) image-space, triangles (T, 3) int32, tex_coords (V, 2)
    in [0, 1], texture (TH, TW, 3).
    """
    bg = np.asarray(bg, np.uint8)
    h, w = bg.shape[:2]
    # An explicitly passed window is a request for the window path — honor
    # it on every backend rather than silently taking the tiled kernel.
    use_tiled = jax.default_backend() == "tpu" and window is None
    if use_tiled:
        from synergynet_tpu.render.raster_tiled import (
            replication_for, within_replication_budget)
        ry, rx = replication_for(vertices, triangles)
        if not within_replication_budget(
                np.asarray(triangles).shape[0], ry, rx):
            # The window path is NOT a safe fallback here: window_for caps
            # at 32 px, which would silently crop exactly the triangles
            # that blew the budget. The native scalar renderer covers any
            # triangle size.
            import warnings
            from synergynet_tpu import native
            warnings.warn(
                f"tiled texture copy grid ry*rx={ry}*{rx} over budget; "
                "falling back to the native host texture renderer",
                RuntimeWarning)
            if not native.native_available():
                raise RuntimeError(
                    "mesh needs a replication grid over "
                    "REPLICATION_ROW_BUDGET and the native host renderer "
                    "is unavailable; downscale the canvas or split the "
                    "mesh")
            img, _ = native.render_texture_cpu(
                np.asarray(vertices, np.float32),
                np.asarray(triangles, np.int32),
                np.asarray(tex_coords, np.float32), texture, bg,
                alpha=float(alpha), reverse=reverse, bilinear=bilinear)
            return img
    if use_tiled:
        zbuf, color = rasterize_texture_buffers_tiled(
            jnp.asarray(vertices, jnp.float32),
            jnp.asarray(triangles, jnp.int32),
            jnp.asarray(tex_coords, jnp.float32), jnp.asarray(texture),
            h=h, w=w, ry=ry, rx=rx, bilinear=bilinear)
    else:
        if window is None:
            window = window_for(vertices, triangles)
        zbuf, color = rasterize_texture_buffers(
            jnp.asarray(vertices, jnp.float32),
            jnp.asarray(triangles, jnp.int32),
            jnp.asarray(tex_coords, jnp.float32), jnp.asarray(texture),
            h=h, w=w, win_h=window[0], win_w=window[1], bilinear=bilinear)
    return np.asarray(blend_uint8(jnp.asarray(bg), zbuf, color,
                                  float(alpha), reverse=reverse))
