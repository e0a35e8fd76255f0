"""On-device crop + bilinear resize: frame -> fixed 120x120 face crops.

The reference crops with cv2 on the host per face (synergy3DMM.py:187-188).
For TPU serving, bouncing the frame back to the host between detection and
regression wastes PCIe/host time; this op keeps everything on-chip: given
the full frame and N roi boxes, it gathers bilinear samples for all N crops
in one program (out-of-bounds samples are zero, matching the reference's
zero-padded ``crop_img``).

Semantics match the host chain ``cv2.resize(crop_img(img, roi), 120x120,
INTER_LINEAR)`` to fixed-point rounding (<1 LSB): rois round to integers
like ``crop_img``, sample coordinates follow cv2's (dst + 0.5) * scale
- 0.5 rule, clamp replicates at the crop border, and samples whose source
crop pixel was an out-of-image zero-pad stay zero.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_size",))
def crop_resize_bilinear(image: jnp.ndarray, rois: jnp.ndarray,
                         out_size: int = 120) -> jnp.ndarray:
    """image (H, W, C) float; rois (N, 4) [sx, sy, ex, ey] pixels ->
    (N, out_size, out_size, C)."""
    h, w = image.shape[:2]
    d = jnp.arange(out_size, dtype=jnp.float32) + 0.5

    # Integer roi like crop_img (utils/inference.py:98-103 rounding).
    sx = jnp.round(rois[:, 0])
    sy = jnp.round(rois[:, 1])
    cw = jnp.round(rois[:, 2]) - sx                     # crop extent
    chh = jnp.round(rois[:, 3]) - sy

    # Crop-relative source coords, border-replicated like cv2.resize.
    cx = jnp.clip(d[None, :] * (cw / out_size)[:, None] - 0.5,
                  0.0, jnp.maximum(cw - 1.0, 0.0)[:, None])
    cy = jnp.clip(d[None, :] * (chh / out_size)[:, None] - 0.5,
                  0.0, jnp.maximum(chh - 1.0, 0.0)[:, None])
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, None, :, None]                    # (N, 1, S, 1)
    fy = (cy - y0)[:, :, None, None]                    # (N, S, 1, 1)

    def sample(cyi, cxi):
        """Gather crop pixel (cyi, cxi) — zero where it falls outside the
        image (the zero-padded region of crop_img)."""
        cyi = jnp.minimum(cyi, jnp.maximum(chh - 1.0, 0.0)[:, None])
        cxi = jnp.minimum(cxi, jnp.maximum(cw - 1.0, 0.0)[:, None])
        yi = cyi + sy[:, None]
        xi = cxi + sx[:, None]
        inside = ((yi >= 0) & (yi < h))[:, :, None] & \
                 ((xi >= 0) & (xi < w))[:, None, :]     # (N, S, S)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = image[yc[:, :, None], xc[:, None, :]]    # (N, S, S, C)
        return vals * inside[..., None]

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def square_rois(boxes: jnp.ndarray) -> jnp.ndarray:
    """Vectorized roi squaring (reference synergy3DMM.py:181-185 rule:
    side from the y-extent, margin = side * 1.2 // 2)."""
    hc = (boxes[:, 1] + boxes[:, 3]) / 2
    wc = (boxes[:, 0] + boxes[:, 2]) / 2
    side = boxes[:, 3] - boxes[:, 1]
    margin = jnp.floor(side * 1.2 / 2)
    return jnp.stack([wc - margin, hc - margin, wc + margin, hc + margin], 1)


@partial(jax.jit, static_argnames=("out_size",))
def crop_resize_matmul(image: jnp.ndarray, rois: jnp.ndarray,
                       out_size: int = 120) -> jnp.ndarray:
    """Same semantics as :func:`crop_resize_bilinear`, reformulated for the
    MXU: bilinear resampling is separable, so each crop is two small
    matmuls — rows: (S, H) @ (H, W C) then cols: (S, W) applied on the
    width axis — with per-roi interpolation matrices built from closed-form
    comparisons (no gathers). ~10x faster than the gather form on TPU;
    bit-identical results (same sample coordinates and zero-pad rule).
    """
    h, w = image.shape[:2]
    d = jnp.arange(out_size, dtype=jnp.float32) + 0.5

    sx = jnp.round(rois[:, 0])
    sy = jnp.round(rois[:, 1])
    cw = jnp.round(rois[:, 2]) - sx
    chh = jnp.round(rois[:, 3]) - sy

    def interp_matrix(start, extent, size):
        """(N, out_size, size) row-interpolation operator: out = M @ axis."""
        c = jnp.clip(d[None, :] * (extent / out_size)[:, None] - 0.5,
                     0.0, jnp.maximum(extent - 1.0, 0.0)[:, None])
        c0 = jnp.floor(c)
        f = c - c0
        idx0 = c0 + start[:, None]                       # (N, S) img coords
        idx1 = jnp.minimum(c0 + 1.0,
                           jnp.maximum(extent - 1.0, 0.0)[:, None]
                           ) + start[:, None]
        grid = jnp.arange(size, dtype=jnp.float32)[None, None, :]
        m = ((grid == idx0[:, :, None]) * (1.0 - f)[:, :, None]
             + (grid == idx1[:, :, None]) * f[:, :, None])
        # idx0 == idx1 double-counts via the two terms summing to 1: when
        # equal, (1-f) + f = 1 — correct. Out-of-image coords match no grid
        # column -> zero row (the crop_img zero pad).
        return m                                         # (N, S, size)

    my = interp_matrix(sy, chh, h)                       # (N, S, H)
    mx = interp_matrix(sx, cw, w)                        # (N, S, W)
    rows = jnp.einsum("nsh,hwc->nswc", my, image)        # (N, Srow, W, C)
    return jnp.einsum("nsw,ntwc->ntsc", mx, rows)        # (N, Srow, Scol, C)


@partial(jax.jit, static_argnames=("out_size",))
def crop_resize_hybrid(image: jnp.ndarray, rois: jnp.ndarray,
                       out_size: int = 120) -> jnp.ndarray:
    """Same semantics as :func:`crop_resize_matmul`, with the ROW stage as
    a 2-tap full-row gather + lerp instead of the dense (S, H) interp
    matmul.

    Why: the row matmul is ~5.3 of the serving program's 8.9 GFLOP/frame
    at 8 faces — almost all multiplying the operator's zeros (each output
    row has <= 2 nonzero taps). Gathering the 2*out_size source rows per
    roi is a contiguous-row (DMA-friendly) access of ~25 MB/frame, and
    the remaining column matmul is only ~0.75 GFLOP/frame. The column
    stage stays a matmul: column gathers are lane-crossing on TPU.

    Sample coordinates, clamping and the zero-pad rule are identical to
    crop_resize_matmul / the host cv2 chain (tests assert both).

    Measured on-chip (v5e, prof_serving_stages at B=32): a NEGATIVE
    result — the crop stage is 2.08 ms as a matmul vs 12.40 ms hybrid,
    and the full serving program 12.6 vs 23.2 ms/dispatch. The dense
    interp matmul rides the MXU at high utilization while the 2-tap row
    gather serializes on dynamic-slice row addressing; 6x fewer FLOPs
    lost to 6x worse silicon. Kept as a tested alternative
    (crop_mode="hybrid") and as the record of why FLOP counts alone
    don't pick TPU kernels — see also the deferred-payload raster
    kernel in docs/RENDERER.md.
    """
    h, w = image.shape[:2]
    c = image.shape[2]
    d = jnp.arange(out_size, dtype=jnp.float32) + 0.5

    sx = jnp.round(rois[:, 0])
    sy = jnp.round(rois[:, 1])
    cw = jnp.round(rois[:, 2]) - sx
    chh = jnp.round(rois[:, 3]) - sy

    cy = jnp.clip(d[None, :] * (chh / out_size)[:, None] - 0.5,
                  0.0, jnp.maximum(chh - 1.0, 0.0)[:, None])
    y0 = jnp.floor(cy)
    fy = (cy - y0)[:, :, None, None]                     # (N, S, 1, 1)
    i0 = y0 + sy[:, None]                                # (N, S) img rows
    i1 = jnp.minimum(y0 + 1.0, jnp.maximum(chh - 1.0, 0.0)[:, None]
                     ) + sy[:, None]

    flat = image.reshape(h, w * c)

    def grab(idx):
        ok = ((idx >= 0) & (idx < h))[:, :, None, None]
        r = flat[jnp.clip(idx, 0, h - 1).astype(jnp.int32)]
        return r.reshape(idx.shape[0], idx.shape[1], w, c) * ok

    rows = grab(i0) * (1.0 - fy) + grab(i1) * fy         # (N, Srow, W, C)

    cx = jnp.clip(d[None, :] * (cw / out_size)[:, None] - 0.5,
                  0.0, jnp.maximum(cw - 1.0, 0.0)[:, None])
    x0 = jnp.floor(cx)
    fx = cx - x0
    ix0 = x0 + sx[:, None]
    ix1 = jnp.minimum(x0 + 1.0, jnp.maximum(cw - 1.0, 0.0)[:, None]
                      ) + sx[:, None]
    grid = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    mx = ((grid == ix0[:, :, None]) * (1.0 - fx)[:, :, None]
          + (grid == ix1[:, :, None]) * fx[:, :, None])  # (N, S, W)
    return jnp.einsum("nsw,ntwc->ntsc", mx, rows)        # (N, Srow, Scol, C)
