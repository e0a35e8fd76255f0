"""62-parameter 3DMM codec: whitening, parsing, landmark/dense decode.

This is the ONE decode implementation for the whole framework — the reference
carries four near-identical copies (model_building.py:106-139,
synergy3DMM.py:116-149, benchmark.py:76-97, utils/inference.py:64-84); here a
single batched, jit/vmap-able function family serves training, evaluation and
the packaged inference API alike.

Conventions preserved bit-for-bit from the reference (the parity contract):

- A 62-d parameter = [12 flattened 3x4 camera matrix | 40 shape | 10 expr]
  in *whitened* units; de-whitening is ``param * std[:62] + mean[:62]``
  (reference model_building.py:115-119).
- Vertex synthesis uses the Fortran-order interleave: the 159645-vector is
  [x1,y1,z1,x2,...], reshaped (N,3) then transposed to (3,N) — equivalent to
  the reference's ``.view(-1,N,3).transpose(1,2)`` (model_building.py:125)
  and numpy ``reshape(3,-1,order='F')`` (utils/inference.py:73).
- Image-space y flip: ``y -> std_size + 1 - y`` (model_building.py:129).

TPU notes: the dense decode is one (B,50)x(50,159645) GEMM on the MXU plus a
batched 3x3 rotation; the basis matrix stays HBM-resident and XLA fuses the
mean-add and y-flip into the GEMM epilogue. fp32 throughout (the basis is
ill-conditioned in bf16 and the GEMM is a tiny fraction of end-to-end FLOPs).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from synergynet_tpu.mm3d.assets import ParamPack, STD_SIZE

# TPU MXUs run f32 matmuls at reduced (bf16-pass) precision by default,
# which costs ~0.3% NME on the landmark decode — material against the
# <=3.41 NME target. These GEMMs are a rounding error of end-to-end FLOPs,
# so force full f32 here (the Pallas dense-decode fast path keeps default
# precision: mesh vertices tolerate ~0.1 px noise, landmarks do not).
_HI = jax.lax.Precision.HIGHEST


def dewhiten(param: jnp.ndarray, pack: ParamPack) -> jnp.ndarray:
    """Whitened (B, 62) -> raw parameter units."""
    return param * pack.param_std[:62] + pack.param_mean[:62]


def whiten(param_raw: jnp.ndarray, pack: ParamPack) -> jnp.ndarray:
    return (param_raw - pack.param_mean[:62]) / pack.param_std[:62]


def parse_param62(param_raw: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Split raw (B, 62) into (p (B,3,3), offset (B,3,1), alpha_shp (B,40,1),
    alpha_exp (B,10,1)). Mirrors reference model_building.py:25-32."""
    p_ = param_raw[:, :12].reshape(-1, 3, 4)
    p = p_[:, :, :3]
    offset = p_[:, :, 3:]
    alpha_shp = param_raw[:, 12:52, None]
    alpha_exp = param_raw[:, 52:62, None]
    return p, offset, alpha_shp, alpha_exp


def _synth(u: jnp.ndarray, w_shp: jnp.ndarray, w_exp: jnp.ndarray,
           alpha_shp: jnp.ndarray, alpha_exp: jnp.ndarray) -> jnp.ndarray:
    """u + w_shp@a + w_exp@e for a batch, returned as (B, 3, N).

    Computed as one fused GEMM: (B, 50) @ (50, 3N) keeps the contraction on
    the MXU with the long vertex axis as the minor (lane) dimension.
    """
    alphas = jnp.concatenate([alpha_shp[..., 0], alpha_exp[..., 0]], axis=1)
    w = jnp.concatenate([w_shp, w_exp], axis=1)            # (3N, 50)
    flat = u[:, 0] + jnp.matmul(alphas, w.T, precision=_HI)   # (B, 3N)
    n = flat.shape[1] // 3
    return flat.reshape(-1, n, 3).transpose(0, 2, 1)       # (B, 3, N)


def decode_param62(param: jnp.ndarray, pack: ParamPack, *, dense: bool,
                   whitening: bool = True, transform: bool = True
                   ) -> jnp.ndarray:
    """Whitened (B, 62) params -> vertices (B, 3, 68) or (B, 3, 53215).

    The single equivalent of reference ``reconstruct_vertex_62``
    (model_building.py:106-139) and ``param2vert`` (utils/inference.py:64-84).
    """
    param_raw = dewhiten(param, pack) if whitening else param
    p, offset, alpha_shp, alpha_exp = parse_param62(param_raw)
    if dense:
        base = _synth(pack.u, pack.w_shp, pack.w_exp, alpha_shp, alpha_exp)
    else:
        base = _synth(pack.u_base, pack.w_shp_base, pack.w_exp_base,
                      alpha_shp, alpha_exp)
    vertex = jnp.matmul(p, base, precision=_HI) + offset   # (B, 3, N)
    if transform:
        vertex = vertex.at[:, 1, :].set(STD_SIZE + 1 - vertex[:, 1, :])
    return vertex


def decode_landmarks(param: jnp.ndarray, pack: ParamPack, **kw) -> jnp.ndarray:
    """(B, 62) -> 68 3D landmarks (B, 3, 68) in 120x120 crop space."""
    return decode_param62(param, pack, dense=False, **kw)


def decode_dense(param: jnp.ndarray, pack: ParamPack, **kw) -> jnp.ndarray:
    """(B, 62) -> dense mesh vertices (B, 3, 53215) in 120x120 crop space."""
    return decode_param62(param, pack, dense=True, **kw)


def rescale_to_roi(vertex: jnp.ndarray, roi_box: jnp.ndarray) -> jnp.ndarray:
    """Map crop-space vertices (B, 3, N) into original-image coordinates.

    ``roi_box`` is (B, 4+) [sx, sy, ex, ey, ...]; trailing elements (detector
    score) are ignored. Mirrors reference utils/inference.py:127-138: x/y
    scale by roi extent / 120 plus offset, z scales by the mean factor.
    """
    sx, sy, ex, ey = (roi_box[:, i] for i in range(4))
    scale_x = (ex - sx) / STD_SIZE
    scale_y = (ey - sy) / STD_SIZE
    s = (scale_x + scale_y) / 2
    x = vertex[:, 0, :] * scale_x[:, None] + sx[:, None]
    y = vertex[:, 1, :] * scale_y[:, None] + sy[:, None]
    z = vertex[:, 2, :] * s[:, None]
    return jnp.stack([x, y, z], axis=1)
