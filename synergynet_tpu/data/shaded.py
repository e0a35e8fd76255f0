"""Shaded-surface synthetic crops: dense appearance the backbone can learn.

Why this exists. The dot-painted task (``data/synthetic.py``) paints 68
isolated 2x2 dots over noise: 99.7% of pixels carry no signal. Real
300W-LP crops (what the reference trains on, reference main_train.py:199)
are the opposite: the whole face region carries appearance that varies
smoothly with the 3DMM parameters. This module reproduces that property
for the synthetic pack: the crop is a *lit blob-surface rendering keyed to
the 68 GT landmarks*, so local shading gradients across the face region
constrain pose, shape and expression densely — on top of the exact 2x2
landmark dots the sparse task paints.

How (TPU-first, scatter-free). A first design splatted the full deformed
53K-vertex surface grid with a z-buffer ``scatter-max``; measured on the
real chip that scatter ran at ~10M elements/s — 5.4 s per 1024-crop batch,
~90x the train step it was feeding, and long render+train dispatches
reproducibly crashed the TPU worker. TPUs have no fast scatter; they have
an MXU. The rewrite exploits that 2-D isotropic Gaussians are separable:
a blob field

    F_c(y, x) = sum_k payload[k, c] * gy[k, y] * gx[k, x]

is ONE (H x K) @ (K x C*W) matmul per crop, with ``gx``/``gy`` the 1-D
Gaussian profiles of the landmark x/y coordinates. Coverage, a smooth
depth field and a per-landmark albedo tint all ride the same matmul as
payload channels; normals come from finite differences of the depth image
(elementwise); the 2x2 landmark dots are the same trick with 0/1 indicator
profiles (an outer-product matmul, exact). Zero scatters anywhere, static
shapes, ~10 GFLOP per 1024-crop batch — measured 5.6 ms/batch on the
v5e chip (decode + render, slope method), ~960x the scatter design and
<10% of the ~60 ms train step, which is what lets the device-generative
epoch program
(``train/resident.py``) synthesize every batch on device and train the
full ~680K-crop reference scale single-chip (the crops would be 29 GB;
their parameters are 170 MB).

This synthesizer is a data-fabrication tool, not part of the parity
surface (the reference trains on real 300W-LP images).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from synergynet_tpu.mm3d.assets import STD_SIZE, ParamPack

# The ONE host-side shaded-render dispatch shape. Both host paths — the
# materialized ``make_shaded_crops`` and the streaming
# ``GeneratedCropDataset._generate_shaded`` — render in batches of exactly
# this size so a crop's uint8 pixels are bit-identical for the same
# (seed, index) regardless of which path produced it (different program
# shapes may legally round differently; ADVICE round 4).
RENDER_CHUNK = 256

# Same contract for the GT landmark decode feeding the render: both paths
# decode params in unpadded chunks of exactly this many rows (the last
# chunk may be short — identically short in both paths for the same n),
# on the CPU backend, so the landmark inputs to the render are themselves
# bit-identical across the streaming toggle.
DECODE_CHUNK = 65536

# Lambertian shading configuration: BGR albedo (host images are BGR uint8,
# CLAUDE.md conventions), ambient + diffuse sum to 1 so intensity <= albedo.
ALBEDO_BGR = (150.0, 180.0, 235.0)
AMBIENT = 0.45
DIFFUSE = 0.55
DOT_BGR = (255, 220, 180)      # landmark dot color (data/synthetic.py)

SIGMA = 6.0          # blob radius (px): ~inter-landmark spacing in a crop
FIELD_EPS = 0.05     # normalizer floor: fields decay to 0 off-coverage
ALPHA_KNEE = 0.25    # cover at which the surface is 50% opaque
Z_RELIEF = 0.35      # depth-field scale feeding the shading normals


@functools.lru_cache(maxsize=4)
def _tint(k: int) -> np.ndarray:
    """Fixed per-landmark albedo tints in [0.55, 1): a stable 'texture'
    tied to the geometry (eyes/nose/jaw regions look different), so the
    rendering localizes features the way real face appearance does."""
    return np.random.default_rng(7).uniform(0.55, 1.0, (k, 3)
                                            ).astype(np.float32)


def _axis_gauss(centers: jnp.ndarray, size: int) -> jnp.ndarray:
    """1-D Gaussian profiles: (K,) centers -> (K, size)."""
    px = jnp.arange(size, dtype=jnp.float32)
    d = px[None, :] - centers[:, None]
    return jnp.exp(d * d * (-0.5 / (SIGMA * SIGMA)))


def _blob_fields(lmk: jnp.ndarray, size: int):
    """(3, K) crop-space landmarks -> ``cover`` (H, W), ``zfield`` (H, W),
    ``tint`` (H, W, 3): the separable-Gaussian blob splat as one MXU
    matmul. ``zfield``/``tint`` are cover-normalized blends of the
    landmark depths / albedo tints and decay to 0 off-coverage."""
    k = lmk.shape[1]
    gx = _axis_gauss(lmk[0], size)                        # (K, W)
    gy = _axis_gauss(lmk[1], size)                        # (K, H)
    payload = jnp.concatenate(
        [jnp.ones((k, 1), jnp.float32), lmk[2][:, None],
         jnp.asarray(_tint(k))], axis=1)                  # (K, 5)
    rhs = (payload[:, :, None] * gx[:, None, :]).reshape(k, 5 * size)
    fields = (gy.T @ rhs).reshape(size, 5, size)          # (H, 5, W)
    cover = fields[:, 0]
    norm = cover + FIELD_EPS
    zfield = fields[:, 1] / norm
    tint = fields[:, 2:5].transpose(0, 2, 1) / norm[..., None]
    return cover, zfield, tint


def _shade(zfield: jnp.ndarray, tint: jnp.ndarray, light: jnp.ndarray
           ) -> jnp.ndarray:
    """Lambertian shading of the blob depth field: finite-difference
    height-field normals (elementwise) -> float BGR colors (H, W, 3)."""
    zs = zfield * Z_RELIEF
    dzdy = jnp.gradient(zs, axis=0)
    dzdx = jnp.gradient(zs, axis=1)
    inv = jax.lax.rsqrt(dzdx * dzdx + dzdy * dzdy + 1.0)
    ndotl = (-dzdx * light[0] - dzdy * light[1] + light[2]) * inv
    inten = AMBIENT + DIFFUSE * jnp.maximum(ndotl, 0.0)
    return inten[..., None] * jnp.asarray(ALBEDO_BGR, jnp.float32) * tint


def _dot_mask(lmk: jnp.ndarray, size: int) -> jnp.ndarray:
    """Exact 2x2 landmark-dot mask (H, W) bool, scatter-free: the union of
    per-landmark outer products of 0/1 x/y indicator profiles is one
    matmul. Same convention as ``synthetic._paint_landmarks``: rounded,
    clipped to [0, size-2], dot covers (y..y+1, x..x+1)."""
    px = jnp.arange(size, dtype=jnp.int32)[None, :]
    xs = jnp.clip(jnp.round(lmk[0]).astype(jnp.int32), 0, size - 2)[:, None]
    ys = jnp.clip(jnp.round(lmk[1]).astype(jnp.int32), 0, size - 2)[:, None]
    dxi = ((px == xs) | (px == xs + 1)).astype(jnp.float32)   # (K, W)
    dyi = ((px == ys) | (px == ys + 1)).astype(jnp.float32)   # (K, H)
    return (dyi.T @ dxi) > 0.5


def _render_one(lmk: jnp.ndarray, key: jax.Array, size: int) -> jnp.ndarray:
    """One crop: (3, K) landmarks + per-crop key -> (size, size, 3) uint8.

    The key draws the light direction (a cone around +z — the
    synthesis-side analogue of photometric augmentation) and the
    background (per-crop base level [40, 90) + per-pixel noise [0, 30),
    the data/synthetic.py background statistics).
    """
    kl, kb, kn = jax.random.split(key, 3)
    lxy = jax.random.uniform(kl, (2,), minval=-0.6, maxval=0.6)
    light = jnp.concatenate([lxy, jnp.ones((1,), jnp.float32)])
    light = light / jnp.linalg.norm(light)

    cover, zfield, tint = _blob_fields(lmk, size)
    color = _shade(zfield, tint, light)
    alpha = (cover / (cover + ALPHA_KNEE))[..., None]

    base = jax.random.randint(kb, (1, 1, 3), 40, 90, jnp.int32)
    noise = jax.random.randint(kn, (size, size, 3), 0, 30, jnp.int32)
    bg = (base + noise).astype(jnp.float32)

    out = alpha * color + (1.0 - alpha) * bg
    img = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return jnp.where(_dot_mask(lmk, size)[..., None],
                     jnp.asarray(DOT_BGR, jnp.uint8), img)


@functools.partial(jax.jit, static_argnames=("size",))
def _render_shaded(lmk: jnp.ndarray, key: jax.Array,
                   idx: Optional[jnp.ndarray] = None, size: int = STD_SIZE
                   ) -> jnp.ndarray:
    """GT landmarks (B, 3, K) -> (B, size, size, 3) BGR uint8 crops.

    Lighting/background randomness is keyed per crop by fold_in(key, idx)
    so generation is bit-stable per (key, index) regardless of batch
    composition — the property the dataset contract and the on-device
    generative epochs (train/resident.py) both rely on.
    """
    b = lmk.shape[0]
    if idx is None:
        idx = jnp.arange(b, dtype=jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
    return jax.vmap(lambda l, k: _render_one(l, k, size))(lmk, keys)


def render_shaded_crops(params: jnp.ndarray, key: jax.Array,
                        pack: ParamPack,
                        idx: Optional[jnp.ndarray] = None,
                        size: int = STD_SIZE) -> jnp.ndarray:
    """Whitened (B, 62) params -> (B, size, size, 3) BGR uint8 crops:
    lit landmark-blob surface + exact landmark dots over noise.

    ``idx``: optional per-crop indices keying lighting/background
    (bit-stable per (key, index); defaults to 0..B-1)."""
    from synergynet_tpu.mm3d.codec import decode_landmarks
    lmk = decode_landmarks(jnp.asarray(params), pack)
    return _render_shaded(lmk, key,
                          idx=None if idx is None else jnp.asarray(idx),
                          size=size)


def make_shaded_crops(n: int, pack: Optional[ParamPack] = None,
                      seed: int = 0, batch: int = None
                      ) -> Dict[str, np.ndarray]:
    """Host convenience mirroring ``synthetic.make_crops_with_params`` with
    shaded appearance. Renders in fixed-size batches (one compile).

    Bit-identity contract with the streaming ``GeneratedCropDataset``
    path (toggling ``cfg.data.streaming`` never changes a crop's uint8
    pixels for the same (seed, index); ADVICE round 4): both paths run on
    the CPU backend, decode landmarks in unpadded :data:`DECODE_CHUNK`
    row chunks, and render in padded :data:`RENDER_CHUNK` batches — same
    backend and same program shapes end to end (a different backend or
    batch shape may legally round differently). Passing an explicit
    ``batch`` opts out of the contract."""
    import contextlib

    from synergynet_tpu.data.synthetic import sample_params
    from synergynet_tpu.mm3d import decode_landmarks, load_param_pack

    if batch is None:
        batch = RENDER_CHUNK
    pack = pack or load_param_pack()
    rng = np.random.default_rng(seed)
    params = sample_params(rng, n)
    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except Exception:
        ctx = contextlib.nullcontext()
    key = jax.random.PRNGKey(seed)
    out = np.empty((n, STD_SIZE, STD_SIZE, 3), np.uint8)
    with ctx:
        lmk = np.concatenate(
            [np.asarray(decode_landmarks(
                jnp.asarray(params[s:s + DECODE_CHUNK]), pack))
             for s in range(0, n, DECODE_CHUNK)])
        for s in range(0, n, batch):
            e = min(s + batch, n)
            pad = batch - (e - s)
            lchunk = (np.concatenate([lmk[s:e], np.repeat(lmk[:1], pad, 0)])
                      if pad else lmk[s:e])
            img = _render_shaded(jnp.asarray(lchunk), key,
                                 idx=jnp.arange(s, s + batch,
                                                dtype=jnp.int32))
            out[s:e] = np.asarray(img)[:e - s]
    return {"images": out, "params": params, "landmarks": lmk}
