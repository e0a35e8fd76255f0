"""Shaded-surface synthetic crops: dense appearance the backbone can learn.

Why this exists. The dot-painted task (``data/synthetic.py``) paints 68
isolated 2x2 dots over noise: 99.7% of pixels carry no signal, and a
global-average-pooled CNN (the reference backbone contract,
reference backbone_nets/mobilenetv2_backbone.py:173-189) learns little
beyond the mean face from such sparse evidence — the round-3 recipe runs
plateaued at mean-collapse NME. Real 300W-LP crops are the opposite: the
whole face region carries appearance that varies smoothly with the 3DMM
parameters. This module reproduces that property for the synthetic pack:
the crop is a *lit rendering of the deformed surface itself*, so local
shading gradients everywhere in the face region constrain pose, shape and
expression — the same dense-supervision structure the reference trains on.

How. The synthetic asset pack's first ``GRID_H x GRID_W`` vertices form a
row-major surface grid (``mm3d/assets.py::make_synthetic_assets``), so the
deformed surface can be decoded directly from the grid slice of the PCA
bases (one MXU GEMM), shaded with finite-difference normals + Lambertian
lighting (elementwise), and z-buffer splatted into the 120x120 crop with
one scatter-max and one unique-index scatter — fully static shapes, jit-
and vmap-friendly, cheap enough to run *inside* the training program
(which is what lets the full 680K-crop recipe train single-chip without
29 GB of resident crops: only the (n, 62) params live in HBM and each
batch's images are synthesized on device).

GT landmarks are additionally painted as 2x2 dots (same convention as
``data/synthetic.py::_paint_landmarks``) so the task keeps exact sparse
anchors on top of the dense shading.

This synthesizer is specific to the *synthetic* pack's grid topology; it
is a data-fabrication tool, not part of the parity surface (the reference
trains on real 300W-LP images, reference main_train.py:199).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from synergynet_tpu.mm3d.assets import (GRID_H, GRID_W, STD_SIZE, ParamPack)
from synergynet_tpu.mm3d.codec import dewhiten, parse_param62, _HI

# Lambertian shading configuration: BGR albedo (host images are BGR uint8,
# CLAUDE.md conventions), ambient + diffuse sum to 1 so intensity <= albedo.
ALBEDO_BGR = (150.0, 180.0, 235.0)
AMBIENT = 0.35
DIFFUSE = 0.65
DOT_BGR = (255, 220, 180)      # landmark dot color (data/synthetic.py)


class ShadedSpec(NamedTuple):
    """Grid-sliced decode bases: ``u`` (3*Ng,), ``w`` (3*Ng, 50)."""

    u: jnp.ndarray
    w: jnp.ndarray

    @property
    def n_grid(self) -> int:
        return self.u.shape[0] // 3


def build_shaded_spec(pack: ParamPack) -> ShadedSpec:
    """Slice the surface-grid rows out of the pack's PCA bases.

    Valid only for the synthetic pack (``make_synthetic_assets``), whose
    first GRID_H*GRID_W vertices are the row-major surface grid.
    """
    ng = GRID_H * GRID_W
    rows = 3 * ng
    if pack.u.shape[0] < rows:
        raise ValueError(f"pack too small for {GRID_H}x{GRID_W} grid")
    w = jnp.concatenate([jnp.asarray(pack.w_shp[:rows]),
                         jnp.asarray(pack.w_exp[:rows])], axis=1)
    return ShadedSpec(u=jnp.asarray(pack.u[:rows, 0]), w=w)


def decode_grid(params: jnp.ndarray, spec: ShadedSpec, pack: ParamPack
                ) -> jnp.ndarray:
    """Whitened (B, 62) -> deformed surface grid (B, 3, GRID_H, GRID_W)
    in crop space (same conventions as ``mm3d.codec.decode_param62``)."""
    raw = dewhiten(params, pack)
    p, offset, alpha_shp, alpha_exp = parse_param62(raw)
    alphas = jnp.concatenate([alpha_shp[..., 0], alpha_exp[..., 0]], axis=1)
    flat = spec.u + jnp.matmul(alphas, spec.w.T, precision=_HI)  # (B, 3Ng)
    base = flat.reshape(-1, spec.n_grid, 3).transpose(0, 2, 1)   # (B, 3, Ng)
    v = jnp.matmul(p, base, precision=_HI) + offset
    v = v.at[:, 1, :].set(STD_SIZE + 1 - v[:, 1, :])
    return v.reshape(-1, 3, GRID_H, GRID_W)


def _grid_normals(v: jnp.ndarray) -> jnp.ndarray:
    """Viewer-facing unit normals from central differences on the grid.

    v: (B, 3, H, W) -> (B, 3, H, W). Edge rows/cols use one-sided
    differences. Normals are flipped to face +z (toward the camera) — the
    surface is a deformed height field, so per-point orientation is enough.
    """

    def cdiff(a, axis):
        lo = jnp.take(a, jnp.array([1]), axis=axis) - \
            jnp.take(a, jnp.array([0]), axis=axis)
        hi = jnp.take(a, jnp.array([a.shape[axis] - 1]), axis=axis) - \
            jnp.take(a, jnp.array([a.shape[axis] - 2]), axis=axis)
        mid = (jax.lax.slice_in_dim(a, 2, a.shape[axis], axis=axis) -
               jax.lax.slice_in_dim(a, 0, a.shape[axis] - 2, axis=axis)) * 0.5
        return jnp.concatenate([lo, mid, hi], axis=axis)

    t_r = cdiff(v, 2)                    # d(pos)/d(row)
    t_c = cdiff(v, 3)                    # d(pos)/d(col)
    n = jnp.cross(t_c, t_r, axisa=1, axisb=1, axisc=1)
    n = n * jnp.sign(n[:, 2:3, :, :] + 1e-20)
    return n / (jnp.linalg.norm(n, axis=1, keepdims=True) + 1e-9)


def shade_grid(v: jnp.ndarray, light: jnp.ndarray) -> jnp.ndarray:
    """Lambertian shading: (B, 3, H, W) verts + (B, 3) unit light dirs ->
    uint8 BGR colors (B, H*W, 3)."""
    n = _grid_normals(v)
    ndotl = jnp.einsum("bchw,bc->bhw", n, light)
    inten = AMBIENT + DIFFUSE * jnp.maximum(ndotl, 0.0)          # (B, H, W)
    albedo = jnp.asarray(ALBEDO_BGR, jnp.float32)
    col = inten[..., None] * albedo                              # (B, H, W, 3)
    return col.astype(jnp.uint8).reshape(v.shape[0], -1, 3)


def sample_lights(keys: jnp.ndarray) -> jnp.ndarray:
    """Per-crop light directions in a cone around +z. keys: (B,) PRNG keys."""

    def one(k):
        lx, ly = jax.random.uniform(k, (2,), minval=-0.6, maxval=0.6)
        return jnp.stack([lx, ly, 1.0])

    l = jax.vmap(one)(keys)
    return l / jnp.linalg.norm(l, axis=1, keepdims=True)


def _splat_one(xy: jnp.ndarray, zkey: jnp.ndarray, colors: jnp.ndarray,
               bg: jnp.ndarray, size: int) -> jnp.ndarray:
    """Z-buffered point splat for one crop (vmapped over the batch).

    xy (N, 2) crop coords, zkey (N,) strictly-unique depth keys, colors
    (N, 3) uint8, bg (size*size, 3) uint8 -> (size*size, 3) uint8.

    One non-unique scatter-max resolves depth; winners (exactly one per
    covered pixel thanks to key uniqueness) then land via a unique-index
    scatter, with losers redirected to distinct slots past the image.
    """
    n = xy.shape[0]
    hw = size * size
    x = jnp.round(xy[:, 0]).astype(jnp.int32)
    y = jnp.round(xy[:, 1]).astype(jnp.int32)
    inb = (x >= 0) & (x < size) & (y >= 0) & (y < size)
    pid = jnp.where(inb, y * size + x, hw)
    zbuf = jnp.full((hw + 1,), jnp.iinfo(jnp.int32).min, jnp.int32)
    zbuf = zbuf.at[pid].max(zkey)
    win = inb & (zkey == zbuf[pid])
    slots = jnp.where(win, pid, hw + 1 + jnp.arange(n, dtype=jnp.int32))
    buf = jnp.concatenate(
        [bg, jnp.zeros((1 + n, 3), jnp.uint8)], axis=0)
    buf = buf.at[slots].set(colors, unique_indices=True)
    return buf[:hw]


def _paint_dots_one(img_flat: jnp.ndarray, lmk: jnp.ndarray, size: int
                    ) -> jnp.ndarray:
    """2x2 landmark dots, same convention as synthetic._paint_landmarks."""
    xs = jnp.clip(jnp.round(lmk[0]).astype(jnp.int32), 0, size - 2)
    ys = jnp.clip(jnp.round(lmk[1]).astype(jnp.int32), 0, size - 2)
    pid = jnp.stack([(ys + dy) * size + (xs + dx)
                     for dy in (0, 1) for dx in (0, 1)]).reshape(-1)
    dot = jnp.broadcast_to(jnp.asarray(DOT_BGR, jnp.uint8),
                           (pid.shape[0], 3))
    return img_flat.at[pid].set(dot)


@functools.partial(jax.jit, static_argnames=("size",))
def _render_shaded(params: jnp.ndarray, key: jax.Array, spec: ShadedSpec,
                   pack: ParamPack, lmk: jnp.ndarray,
                   idx: Optional[jnp.ndarray] = None, size: int = STD_SIZE
                   ) -> jnp.ndarray:
    b = params.shape[0]
    v = decode_grid(params, spec, pack)                  # (B, 3, H, W)

    # Lighting/background randomness is keyed per crop by fold_in(key, idx)
    # so generation is bit-stable per (key, index) regardless of batch
    # composition — the property the dataset contract and the on-device
    # generative epochs (train/resident.py) both rely on.
    if idx is None:
        idx = jnp.arange(b, dtype=jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
    colors = shade_grid(v, sample_lights(keys))          # (B, Ng, 3) uint8

    # Background: per-crop base level [40, 90) + per-pixel noise [0, 30),
    # the data/synthetic.py background statistics.
    def bg_one(k):
        kb, kn = jax.random.split(k)
        base = jax.random.randint(kb, (1, 3), 40, 90, jnp.uint8)
        return base + jax.random.randint(kn, (size * size, 3), 0, 30,
                                         jnp.uint8)

    bg = jax.vmap(bg_one)(keys)

    flat = v.reshape(b, 3, -1)
    xy = flat[:, :2].transpose(0, 2, 1)                  # (B, Ng, 2)
    ng = xy.shape[1]
    # Unique depth keys: quantized z in the high bits, point index low —
    # ties (duplicated vertices) resolve to exactly one winner per pixel.
    zq = jnp.clip(jnp.round(flat[:, 2] * 8.0), -16000, 16000
                  ).astype(jnp.int32)
    zkey = zq * 65536 + jnp.arange(ng, dtype=jnp.int32)

    img = jax.vmap(lambda a, zk, c, g: _splat_one(a, zk, c, g, size))(
        xy, zkey, colors, bg)
    img = jax.vmap(lambda im, l: _paint_dots_one(im, l, size))(img, lmk)
    return img.reshape(b, size, size, 3)


def render_shaded_crops(params: jnp.ndarray, key: jax.Array,
                        pack: ParamPack, spec: Optional[ShadedSpec] = None,
                        idx: Optional[jnp.ndarray] = None,
                        size: int = STD_SIZE) -> jnp.ndarray:
    """Whitened (B, 62) params -> (B, size, size, 3) BGR uint8 crops:
    lit rendering of the deformed surface + landmark dots over noise.

    ``idx``: optional per-crop indices keying lighting/background
    (bit-stable per (key, index); defaults to 0..B-1)."""
    from synergynet_tpu.mm3d.codec import decode_landmarks
    spec = spec or build_shaded_spec(pack)
    lmk = decode_landmarks(jnp.asarray(params), pack)
    return _render_shaded(jnp.asarray(params), key, spec, pack, lmk,
                          idx=None if idx is None else jnp.asarray(idx),
                          size=size)


def make_shaded_crops(n: int, pack: Optional[ParamPack] = None,
                      seed: int = 0, batch: int = 1024
                      ) -> Dict[str, np.ndarray]:
    """Host convenience mirroring ``synthetic.make_crops_with_params`` with
    shaded appearance. Renders in fixed-size batches (one compile)."""
    from synergynet_tpu.data.synthetic import sample_params
    from synergynet_tpu.mm3d import decode_landmarks, load_param_pack

    pack = pack or load_param_pack()
    spec = build_shaded_spec(pack)
    rng = np.random.default_rng(seed)
    params = sample_params(rng, n)
    lmk = np.asarray(decode_landmarks(jnp.asarray(params), pack))
    key = jax.random.PRNGKey(seed)
    out = np.empty((n, STD_SIZE, STD_SIZE, 3), np.uint8)
    for s in range(0, n, batch):
        e = min(s + batch, n)
        pad = batch - (e - s)
        if pad:
            chunk = np.concatenate([params[s:e],
                                    np.repeat(params[:1], pad, 0)])
            lchunk = np.concatenate([lmk[s:e], np.repeat(lmk[:1], pad, 0)])
        else:
            chunk, lchunk = params[s:e], lmk[s:e]
        img = _render_shaded(jnp.asarray(chunk), key, spec, pack,
                             jnp.asarray(lchunk),
                             idx=jnp.arange(s, s + batch, dtype=jnp.int32))
        out[s:e] = np.asarray(img)[:e - s]
    return {"images": out, "params": params, "landmarks": lmk}
