"""Data-parallel z-buffer rasterizer — the TPU-native Sim3DR.

The reference rasterizes with a scalar C++ loop: per triangle, scan the
bbox, barycentric-test each pixel, depth-test against a z-buffer, blend
(reference: Sim3DR/lib/rasterize_kernel.cpp:219-287). A sequential z-buffer
is a scatter-with-max — the worst possible shape for a vector machine — so
the TPU design inverts it into two data-parallel passes:

1. **Fragment generation** (vectorized over all triangles x a fixed local
   window): every triangle evaluates barycentric coverage, interpolated
   depth and color over a WIN_H x WIN_W window anchored at its clamped
   bbox origin. Work is proportional to sum(bbox areas) — the same
   complexity as the reference's scan — but runs 8x128 lanes wide on the
   VPU with no data-dependent control flow.
2. **Segment-reduction resolve**: per-pixel max depth via ``segment_max``,
   winners identified by exact float equality with the reduced value,
   equal-depth ties broken to the smallest fragment index via
   ``segment_min`` (fragment order follows triangle order, so this is the
   reference's first-triangle-wins rule), then winner payloads gathered
   per pixel. Measured against sort+scatter and searchsorted resolves on
   TPU this is the fastest exact formulation and compiles in seconds
   instead of minutes.

Semantics vs the reference: identical coverage rule (u >= 0, v >= 0,
u + v < 1 with the degenerate-triangle inverDeno=0 convention), identical
+strictly-greater depth test with first-triangle tie-break, identical
uint8 truncation blend ``(uchar)((1-alpha)*bg + alpha*255*color)``. The one
intentional divergence: the reference re-blends a pixel every time a nearer
triangle arrives (order-dependent repeated compositing); here each pixel is
blended exactly once with its winning triangle — deterministic and
order-independent.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEPTH_INIT = -1e8    # reference Sim3DR/Sim3DR.py:25


def _fragment_windows(vertices, triangles, colors, h, w, win_h, win_w):
    """Per-(triangle, window-slot) fragments.

    Returns (pix, depth, rgb, valid) with shapes (T*S,), (T*S,), (T*S, 3),
    (T*S,) where S = win_h * win_w. ``pix`` is h*w for invalid fragments.
    """
    p0 = vertices[triangles[:, 0]]
    p1 = vertices[triangles[:, 1]]
    p2 = vertices[triangles[:, 2]]

    # Clamped integer bbox (reference rasterize_kernel.cpp:244-252).
    xs = jnp.stack([p0[:, 0], p1[:, 0], p2[:, 0]], 1)
    ys = jnp.stack([p0[:, 1], p1[:, 1], p2[:, 1]], 1)
    x_min = jnp.maximum(jnp.floor(xs.min(1)).astype(jnp.int32), 0)
    x_max = jnp.minimum(jnp.ceil(xs.max(1)).astype(jnp.int32), w - 1)
    y_min = jnp.maximum(jnp.floor(ys.min(1)).astype(jnp.int32), 0)
    y_max = jnp.minimum(jnp.ceil(ys.max(1)).astype(jnp.int32), h - 1)

    # Barycentric setup (rasterize_kernel.cpp:26-83): v0 = p2-p0, v1 = p1-p0.
    v0 = p2[:, :2] - p0[:, :2]
    v1 = p1[:, :2] - p0[:, :2]
    dot00 = jnp.sum(v0 * v0, 1)
    dot01 = jnp.sum(v0 * v1, 1)
    dot11 = jnp.sum(v1 * v1, 1)
    den = dot00 * dot11 - dot01 * dot01
    # The reference tests den == 0 exactly (rasterize_kernel.cpp:42-45); under
    # XLA the subtraction fuses into an FMA whose residue makes an exactly
    # degenerate triangle's den a tiny nonzero, exploding 1/den. A relative
    # tolerance (|den| vs the product of squared edge lengths ~ sin^2 of the
    # corner angle) classifies those consistently in eager and jitted code.
    degenerate = jnp.abs(den) <= 1e-6 * dot00 * dot11
    inv = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, den))

    # Window pixel coordinates: slot s -> (x_min + s % win_w, y_min + s // win_w).
    t = triangles.shape[0]
    s = win_h * win_w
    sx = (jnp.arange(s, dtype=jnp.int32) % win_w)[None, :]       # (1, S)
    sy = (jnp.arange(s, dtype=jnp.int32) // win_w)[None, :]
    px = x_min[:, None] + sx                                      # (T, S)
    py = y_min[:, None] + sy
    in_bbox = (px <= x_max[:, None]) & (py <= y_max[:, None]) & \
              (x_max >= x_min)[:, None] & (y_max >= y_min)[:, None]

    # u, v are affine in the pixel position p: dot02 = v0.(p - p0) etc.
    dx = px.astype(jnp.float32) - p0[:, 0:1]
    dy = py.astype(jnp.float32) - p0[:, 1:2]
    dot02 = v0[:, 0:1] * dx + v0[:, 1:2] * dy
    dot12 = v1[:, 0:1] * dx + v1[:, 1:2] * dy
    u = (dot11[:, None] * dot02 - dot01[:, None] * dot12) * inv[:, None]
    v = (dot00[:, None] * dot12 - dot01[:, None] * dot02) * inv[:, None]
    covered = (u >= 0) & (v >= 0) & (u + v < 1) & in_bbox

    w0 = 1.0 - u - v
    w1 = v
    w2 = u
    depth = (w0 * p0[:, 2:3] + w1 * p1[:, 2:3] + w2 * p2[:, 2:3])  # (T, S)

    c0 = colors[triangles[:, 0]][:, None, :]                       # (T, 1, 3)
    c1 = colors[triangles[:, 1]][:, None, :]
    c2 = colors[triangles[:, 2]][:, None, :]
    rgb = w0[..., None] * c0 + w1[..., None] * c1 + w2[..., None] * c2

    pix = jnp.where(covered, py * w + px, h * w)
    # Fragments below the initial z-buffer never draw (depth test vs -1e8).
    pix = jnp.where(depth > DEPTH_INIT, pix, h * w)
    return (pix.reshape(-1), depth.reshape(-1), rgb.reshape(-1, 3),
            covered.reshape(-1))


@partial(jax.jit, static_argnames=("h", "w", "win_h", "win_w"))
def rasterize_buffers(vertices: jnp.ndarray, triangles: jnp.ndarray,
                      colors: jnp.ndarray, *, h: int, w: int,
                      win_h: int = 4, win_w: int = 4
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve the z-buffer: (depth (h, w) f32 init -1e8, color (h, w, 3)).

    ``win_h``/``win_w`` bound the rasterized extent of a single triangle
    (its clamped bbox is anchored top-left); pick them >= the largest
    triangle bbox at your render scale (see :func:`window_for`).
    """
    pix, depth, rgb, _ = _fragment_windows(
        vertices, triangles, colors, h, w, win_h, win_w)
    zbuf, win_idx, drawn = _resolve_winners(pix, depth, h, w)
    color = jnp.where(drawn[:, None], rgb[win_idx], 0.0)
    return zbuf.reshape(h, w), color.reshape(h, w, 3)


def _resolve_winners(pix, depth, h, w):
    """Sort-free exact z-buffer resolve (TPU sorts and .set scatters
    measured 4x slower than segment reductions at face-mesh fragment
    counts): 1. per-pixel max depth (segment_max); 2. fragments matching it
    are winners (float equality with the value just reduced is exact);
    3. among equal-depth winners the smallest fragment index wins —
    fragment order follows triangle order, reproducing the reference's
    first-triangle-wins strictly-greater depth test; 4. callers gather
    winner payloads per pixel.

    Returns (zbuf (h*w,), win_idx (h*w,) fragment indices, drawn (h*w,)).
    """
    e = pix.shape[0]
    zmax = jax.ops.segment_max(depth, pix, num_segments=h * w + 1)
    zbuf = jnp.maximum(zmax[:h * w], DEPTH_INIT)

    is_winner = depth == zmax[pix]
    frag_idx = jax.lax.broadcasted_iota(jnp.int32, (e, 1), 0)[:, 0]
    win_idx = jax.ops.segment_min(
        jnp.where(is_winner, frag_idx, e), pix, num_segments=h * w + 1)
    win_idx = jnp.minimum(win_idx[:h * w], e - 1)
    return zbuf, win_idx, zbuf > DEPTH_INIT


@partial(jax.jit, static_argnames=("reverse",))
def blend_uint8(bg_u8: jnp.ndarray, zbuf: jnp.ndarray, color: jnp.ndarray,
                alpha: float, reverse: bool = False) -> jnp.ndarray:
    """uint8 truncation blend of resolved color into the background
    (reference rasterize_kernel.cpp:268-282)."""
    mask = (zbuf > DEPTH_INIT)[..., None]
    blended = ((1.0 - alpha) * bg_u8.astype(jnp.float32)
               + alpha * 255.0 * color)
    out = jnp.where(mask, blended.astype(jnp.uint8), bg_u8)
    if reverse:
        out = out[::-1]
    return out


def window_for(vertices: np.ndarray, triangles: np.ndarray,
               cap: int = 32) -> Tuple[int, int]:
    """Smallest power-of-two window covering every triangle bbox (+1 for the
    inclusive ceil-bounded scan), capped to keep fragment count bounded."""
    v = np.asarray(vertices)
    tr = np.asarray(triangles)
    xs = v[:, 0][tr]
    ys = v[:, 1][tr]
    wmax = int(np.ceil(xs.max(1) - np.floor(xs.min(1))).max()) + 1
    hmax = int(np.ceil(ys.max(1) - np.floor(ys.min(1))).max()) + 1

    def pot(n):
        p = 1
        while p < n:
            p *= 2
        return p
    return min(pot(hmax), cap), min(pot(wmax), cap)


def rasterize(vertices, triangles, colors, bg=None, height=None, width=None,
              channel=None, reverse: bool = False, alpha: float = 1.0,
              window: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Reference-compatible host API (Sim3DR/Sim3DR.py:15-29): vertices
    (V, 3) f32 image-space, triangles (T, 3) int32, colors (V, 3) in [0, 1],
    optional uint8 background -> uint8 image."""
    if bg is not None:
        height, width, channel = bg.shape
        bg = np.asarray(bg, np.uint8)
    else:
        assert height is not None and width is not None
        bg = np.zeros((height, width, channel or 3), np.uint8)
    if window is None:
        window = window_for(vertices, triangles)
    zbuf, color = rasterize_buffers(
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(triangles, jnp.int32),
        jnp.asarray(colors, jnp.float32),
        h=height, w=width, win_h=window[0], win_w=window[1])
    out = blend_uint8(jnp.asarray(bg), zbuf, color, float(alpha),
                      reverse=reverse)
    return np.asarray(out)


@partial(jax.jit, static_argnames=("h", "w", "win_h", "win_w"))
def rasterize_triangles(vertices: jnp.ndarray, triangles: jnp.ndarray, *,
                        h: int, w: int, win_h: int = 4, win_w: int = 4):
    """Visibility buffers: per pixel the winning triangle id, its depth and
    barycentric weight of the first corner.

    The equivalent of the reference's ``_rasterize_triangles``
    (Sim3DR/lib/rasterize_kernel.cpp:290-348: triangle-index buffer +
    barycentric buffer). Returns (tri_id (h, w) int32 — -1 where empty,
    depth (h, w) f32 init -1e8, bary_w0 (h, w) f32).
    """
    dummy_colors = jnp.zeros((vertices.shape[0], 3), jnp.float32)
    pix, depth, _, _ = _fragment_windows(
        vertices, triangles, dummy_colors, h, w, win_h, win_w)
    zbuf, win_idx, drawn = _resolve_winners(pix, depth, h, w)

    s = win_h * win_w
    tri_buf = jnp.where(drawn, (win_idx // s).astype(jnp.int32), -1)
    w0 = _fragment_w0(vertices, triangles, h, w, win_h, win_w)
    w0buf = jnp.where(drawn, w0[win_idx], 0.0)
    return (tri_buf.reshape(h, w), zbuf.reshape(h, w), w0buf.reshape(h, w))


def _fragment_w0(vertices, triangles, h, w, win_h, win_w):
    """w0 = 1 - u - v per fragment, same traversal as _fragment_windows."""
    p0 = vertices[triangles[:, 0]]
    p1 = vertices[triangles[:, 1]]
    p2 = vertices[triangles[:, 2]]
    xs = jnp.stack([p0[:, 0], p1[:, 0], p2[:, 0]], 1)
    ys = jnp.stack([p0[:, 1], p1[:, 1], p2[:, 1]], 1)
    x_min = jnp.maximum(jnp.floor(xs.min(1)).astype(jnp.int32), 0)
    y_min = jnp.maximum(jnp.floor(ys.min(1)).astype(jnp.int32), 0)
    v0 = p2[:, :2] - p0[:, :2]
    v1 = p1[:, :2] - p0[:, :2]
    dot00 = jnp.sum(v0 * v0, 1)
    dot01 = jnp.sum(v0 * v1, 1)
    dot11 = jnp.sum(v1 * v1, 1)
    den = dot00 * dot11 - dot01 * dot01
    degenerate = jnp.abs(den) <= 1e-6 * dot00 * dot11
    inv = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, den))
    s = win_h * win_w
    sx = (jnp.arange(s, dtype=jnp.int32) % win_w)[None, :]
    sy = (jnp.arange(s, dtype=jnp.int32) // win_w)[None, :]
    dx = (x_min[:, None] + sx).astype(jnp.float32) - p0[:, 0:1]
    dy = (y_min[:, None] + sy).astype(jnp.float32) - p0[:, 1:2]
    dot02 = v0[:, 0:1] * dx + v0[:, 1:2] * dy
    dot12 = v1[:, 0:1] * dx + v1[:, 1:2] * dy
    u = (dot11[:, None] * dot02 - dot01[:, None] * dot12) * inv[:, None]
    v = (dot00[:, None] * dot12 - dot01[:, None] * dot02) * inv[:, None]
    return (1.0 - u - v).reshape(-1)
