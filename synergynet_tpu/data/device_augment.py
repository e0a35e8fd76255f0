"""Device-side batched training augmentation (the TPU-native fast path).

The reference augments per sample on the host (PIL color jitter + border/
occlusion zeroing, utils/ddfa.py) — at batch 1024 that is the training
bottleneck (measured ~5 ms/image in Python threads vs ~1 ms/image of TPU
compute for the whole train step). This module runs the same augmentation
batched inside the training program: per-sample brightness/contrast/
saturation factors, the 5-px border zero, and the rare occlusion patterns,
all as fused VPU elementwise work.

Divergences from the host path (:mod:`synergynet_tpu.data.transforms`,
which remains the bit-faithful option):
- PIL rounds to uint8 after every enhancement op; here the chain stays in
  float (<=1 LSB per op).
- The reference shuffles the op order per sample; here the order is
  randomized per batch (a scalar 6-way branch) — per-sample order would
  force XLA to evaluate all six orders for every pixel.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from synergynet_tpu.data.transforms import _LUMA

_PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))


def _brightness(img, f):
    return img * f[:, None, None, None]


def _contrast(img, f):
    luma = img @ jnp.asarray(_LUMA)
    mean = jnp.round(jnp.mean(luma, axis=(1, 2)))[:, None, None, None]
    return mean + (img - mean) * f[:, None, None, None]


def _saturation(img, f):
    gray = jnp.round(img @ jnp.asarray(_LUMA))[..., None]
    return gray + (img - gray) * f[:, None, None, None]


@partial(jax.jit, static_argnames=("border", "occlusion_prob", "jitter"))
def device_augment(images_u8: jnp.ndarray, key: jax.Array, *,
                   jitter: Tuple[float, float, float] = (0.4, 0.4, 0.4),
                   border: int = 5,
                   occlusion_prob: float = 0.01) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> augmented float32 in [0, 255].

    The caller normalizes afterwards ((x - 127.5) / 128); the train step
    does this automatically when built with ``augment=``.
    """
    b, h, w, _ = images_u8.shape
    img = images_u8.astype(jnp.float32)
    k_f, k_perm, k_occ_on, k_occ_kind = jax.random.split(key, 4)

    lows = jnp.asarray([max(0.0, 1 - j) for j in jitter])
    highs = jnp.asarray([1 + j for j in jitter])
    f = jax.random.uniform(k_f, (b, 3)) * (highs - lows) + lows

    ops = (lambda x: _brightness(x, f[:, 0]),
           lambda x: _contrast(x, f[:, 1]),
           lambda x: _saturation(x, f[:, 2]))

    def perm_branch(p):
        def run(x):
            for i in p:
                x = ops[i](x)
            return x
        return run

    perm_idx = jax.random.randint(k_perm, (), 0, len(_PERMS))
    img = jax.lax.switch(perm_idx, [perm_branch(p) for p in _PERMS], img)
    img = jnp.clip(img, 0.0, 255.0)

    # Border zero (CenterCrop margin, reference utils/ddfa.py:227-236).
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((yy >= border) & (yy < h - border)
                & (xx >= border) & (xx < w - border))
    img = img * interior[None, :, :, None]

    # Occlusion patterns with probability occlusion_prob per sample
    # (reference switcher, utils/ddfa.py:168-244; rdown == lup, quirk Q2).
    up, down = yy < h // 2, yy >= h // 2
    left, right = xx < w // 2, xx >= w // 2
    center = ((yy >= h // 4) & (yy < h - h // 4)
              & (xx >= w // 4) & (xx < w - w // 4))
    masks = jnp.stack([up & left, up & right, down & left, up & left,
                       left, right, center])              # (7, H, W)
    kind = jax.random.randint(k_occ_kind, (b,), 0, 7)
    occlude = jax.random.uniform(k_occ_on, (b,)) < occlusion_prob
    sel = jnp.where(occlude[:, None, None], masks[kind],
                    jnp.ones((1, h, w), bool))
    return img * sel[..., None]
