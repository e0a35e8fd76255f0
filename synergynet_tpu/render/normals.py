"""Mesh normals: triangle cross products + one-ring vertex accumulation.

TPU-native equivalent of the reference's scalar C++ normal routines
(reference: Sim3DR/lib/rasterize_kernel.cpp:88-215): the per-triangle loop
becomes a batched gather + cross product, and the one-ring accumulation
(scatter-add over the three corners of every triangle) becomes a
``segment_sum`` — the canonical XLA formulation of scatter-accumulate.

Parity notes:
- ``get_tri_normal(..., normalize=True)`` guards the zero norm with 1e-6
  (rasterize_kernel.cpp:110-113).
- ``get_normal`` (the fused path used by lighting, rasterize_kernel.cpp:
  158-215) does NOT guard the final vertex normalization — vertices that
  belong to no triangle come out NaN there, exactly like the reference;
  such vertices are never rasterized so the NaNs are inert.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _tri_cross(vertices: jnp.ndarray, triangles: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized per-triangle normals. vertices (V, 3), triangles (T, 3)
    int -> (T, 3); counter-clockwise order (p1-p0) x (p2-p0)."""
    p0 = vertices[triangles[:, 0]]
    p1 = vertices[triangles[:, 1]]
    p2 = vertices[triangles[:, 2]]
    return jnp.cross(p1 - p0, p2 - p0)


@partial(jax.jit, static_argnames=("normalize",))
def get_tri_normal(vertices: jnp.ndarray, triangles: jnp.ndarray,
                   normalize: bool = False) -> jnp.ndarray:
    n = _tri_cross(vertices, triangles)
    if normalize:
        det = jnp.linalg.norm(n, axis=1, keepdims=True)
        n = n / jnp.maximum(det, 1e-6)
    return n


@partial(jax.jit, static_argnames=("num_vertices",))
def accumulate_vertex_normals(tri_normal: jnp.ndarray,
                              triangles: jnp.ndarray,
                              num_vertices: int) -> jnp.ndarray:
    """Sum each triangle's normal into its three corner vertices."""
    flat_idx = triangles.reshape(-1)                        # (3T,)
    flat_val = jnp.repeat(tri_normal, 3, axis=0)            # (3T, 3)
    return jax.ops.segment_sum(flat_val, flat_idx,
                               num_segments=num_vertices)


def get_ver_normal(tri_normal: jnp.ndarray, triangles: jnp.ndarray,
                   num_vertices: int) -> jnp.ndarray:
    """Accumulate + guarded normalize (rasterize_kernel.cpp:125-153)."""
    acc = accumulate_vertex_normals(tri_normal, triangles, num_vertices)
    det = jnp.linalg.norm(acc, axis=1, keepdims=True)
    return acc / jnp.maximum(det, 1e-6)


def get_normal(vertices: jnp.ndarray, triangles: jnp.ndarray) -> jnp.ndarray:
    """Fused tri-normal + one-ring + unguarded normalize — the lighting-path
    normal (reference Sim3DR/Sim3DR.py:8-12 -> rasterize_kernel.cpp:158-215).
    vertices (V, 3) f32, triangles (T, 3) int32 -> (V, 3)."""
    tri_n = _tri_cross(vertices, triangles)
    acc = accumulate_vertex_normals(tri_n, triangles, vertices.shape[0])
    det = jnp.sqrt(jnp.sum(acc * acc, axis=1, keepdims=True))
    return acc / det


# ---------------------------------------------------------------------------
# One-ring gather path: TPU fast accumulation for a FIXED topology.
#
# segment_sum lowers to a serialized scatter-add on TPU (~8 ms for the
# 105,840-triangle BFM mesh); with static topology the scatter inverts into
# a padded per-vertex gather of incident-triangle normals — pure gather +
# reduce, which the TPU runs in well under a millisecond.
# ---------------------------------------------------------------------------

_RING_CACHE: dict = {}


def one_ring_table(triangles, num_vertices: int):
    """(T, 3) int triangles -> (V, K) int32 of incident triangle ids per
    vertex, padded with T (a zero row is appended to the normals before
    gathering). Host-side, cached by topology content."""
    tr = np.asarray(triangles)
    key = (tr.shape, int(num_vertices), hash(tr.tobytes()))
    hit = _RING_CACHE.get(key)
    if hit is not None:
        return hit
    flat_v = tr.reshape(-1)                       # (3T,) vertex ids
    flat_t = np.repeat(np.arange(tr.shape[0], dtype=np.int32), 3)
    order = np.argsort(flat_v, kind="stable")
    sv, st = flat_v[order], flat_t[order]
    starts = np.searchsorted(sv, np.arange(num_vertices + 1))
    counts = starts[1:] - starts[:-1]
    k = max(int(counts.max()) if len(counts) else 1, 1)
    rings = np.full((num_vertices, k), tr.shape[0], np.int32)
    slot = np.arange(len(sv)) - starts[:-1].repeat(counts)
    rings[sv, slot] = st
    table = jnp.asarray(rings)
    _RING_CACHE[key] = table
    return table


def get_normal_rings(vertices: jnp.ndarray, triangles: jnp.ndarray,
                     rings: jnp.ndarray) -> jnp.ndarray:
    """``get_normal`` with the one-ring gather accumulation. ``rings`` from
    :func:`one_ring_table` for the same (static) topology. Bit-identical
    semantics up to float addition order within a ring."""
    tri_n = _tri_cross(vertices, triangles)
    padded = jnp.concatenate(
        [tri_n, jnp.zeros((1, 3), tri_n.dtype)], axis=0)
    acc = jnp.sum(padded[rings], axis=1)          # (V, K, 3) -> (V, 3)
    det = jnp.sqrt(jnp.sum(acc * acc, axis=1, keepdims=True))
    return acc / det
