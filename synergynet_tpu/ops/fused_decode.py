"""Pallas TPU kernel: fused dense 3DMM decode.

The dense decode (reference model_building.py:125, utils/inference.py:73)
is, per batch: de-whiten -> basis GEMM over the 159,645-row BFM basis ->
reshape -> 3x3 camera rotation + offset -> image-space y flip. As separate
XLA ops this costs ~5 HBM passes over the (B, 159645) intermediate (GEMM
write, transpose read/write, batched-matmul read/write); this kernel fuses
the whole chain so each output element is produced in one VMEM-resident
pass: HBM traffic = basis read + final (B, 3, N) write only (~3x less).

Layout: the basis is stored coordinate-separated — Wx, Wy, Wz (N, 50) and
means ux, uy, uz — so the per-batch 3x3 rotation becomes nine scalar-vector
multiply-adds on (BT, VT) register tiles with no strided xyz deinterleave
(the interleaved [x1, y1, z1, ...] layout of the reference would force
stride-3 sublane gathers). Grid = (batch tiles, vertex tiles); each cell
does three (BT, 50) x (50, VT) MXU contractions plus VPU epilogue.

The tiny host-side prologue (dewhiten + camera-matrix parse, (B, 62) ops)
stays in XLA where it fuses for free.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synergynet_tpu.mm3d.assets import ParamPack, STD_SIZE
from synergynet_tpu.mm3d.codec import dewhiten

LANE = 128


class DecodeBasis(NamedTuple):
    """Coordinate-separated, lane-padded dense basis (device-ready)."""

    w: jnp.ndarray       # (3, Npad, 50)  [x, y, z] stacked
    u: jnp.ndarray       # (3, Npad)
    nver: int            # true vertex count (<= Npad)

    @property
    def npad(self) -> int:
        return self.w.shape[1]


def build_decode_basis(pack: ParamPack) -> DecodeBasis:
    """Re-layout the pack's interleaved basis once (host, cached by caller)."""
    w = np.concatenate([np.asarray(pack.w_shp), np.asarray(pack.w_exp)],
                       axis=1)                       # (3N, 50)
    u = np.asarray(pack.u)[:, 0]                     # (3N,)
    n = w.shape[0] // 3
    npad = ((n + LANE - 1) // LANE) * LANE
    w3 = np.zeros((3, npad, 50), np.float32)
    u3 = np.zeros((3, npad), np.float32)
    for k in range(3):                               # x, y, z rows
        w3[k, :n] = w[k::3]
        u3[k, :n] = u[k::3]
    return DecodeBasis(w=jnp.asarray(w3), u=jnp.asarray(u3), nver=n)


def _decode_kernel(alpha_ref, p_ref, off_ref, w_ref, u_ref, out_ref):
    """One (BT batch, VT vertex) tile of the fused decode.

    alpha: (BT, 50) raw [shape|exp] coefficients;
    p: (BT, 9) flattened rotation; off: (BT, 3) translation;
    w: (3, VT, 50) basis slab; u: (3, VT) mean; out: (BT, 3, VT).
    """
    alpha = alpha_ref[:]
    dims = (((1,), (1,)), ((), ()))       # contract 50 x 50
    x = jax.lax.dot_general(alpha, w_ref[0], dims,
                            preferred_element_type=jnp.float32) + u_ref[0][None, :]
    y = jax.lax.dot_general(alpha, w_ref[1], dims,
                            preferred_element_type=jnp.float32) + u_ref[1][None, :]
    z = jax.lax.dot_general(alpha, w_ref[2], dims,
                            preferred_element_type=jnp.float32) + u_ref[2][None, :]

    p = p_ref[:]
    off = off_ref[:]

    def rot(r):
        return (p[:, 3 * r + 0][:, None] * x
                + p[:, 3 * r + 1][:, None] * y
                + p[:, 3 * r + 2][:, None] * z
                + off[:, r][:, None])

    out_ref[:, 0, :] = rot(0)
    out_ref[:, 1, :] = (STD_SIZE + 1) - rot(1)        # image-space y flip
    out_ref[:, 2, :] = rot(2)


def _auto_batch_tile(b: int) -> int:
    """Smallest power-of-two batch tile (8..128) covering b — i.e. the tile
    may overshoot a non-power-of-two b (b=100 -> 128) and the kernel pads
    the batch to a tile multiple internally.

    The basis block index map ignores the batch-tile grid axis only within
    a tile, so the FULL basis (3, Npad, 50) streams from HBM once per batch
    tile: at the serving batch (B frames x 8 faces flattened to b rows),
    bt=8 cost 32 MB x b/8 of pure re-read traffic (~4 GB per B=128
    dispatch — measured as ~16% of the fused program before this change).
    Growing the tile divides that traffic by bt/8 while the out block
    (bt, 3, vt) stays well inside VMEM (bt=128, vt=1024 -> 1.5 MB f32).
    """
    bt = 8
    while bt < 128 and bt < b:
        bt *= 2
    return bt


def decode_dense_fused(param: jnp.ndarray, basis: DecodeBasis,
                       pack: ParamPack, *, batch_tile: int | None = None,
                       vertex_tile: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """Whitened (B, 62) params -> dense vertices (B, 3, nver).

    Semantics identical to ``decode_dense`` (the single codec path); this is
    the TPU fast path. ``interpret=True`` runs the Pallas interpreter (for
    CPU tests). ``batch_tile=None`` auto-sizes the tile to the batch
    (bit-identical results for any tile: the contraction axis is untiled,
    so each output element sees one dot-product in one order).
    """
    if batch_tile is None:
        batch_tile = _auto_batch_tile(param.shape[0])
    return _decode_dense_fused(param, basis.w, basis.u, pack,
                               nver=basis.nver, batch_tile=batch_tile,
                               vertex_tile=vertex_tile, interpret=interpret)


@functools.partial(jax.jit, static_argnames=(
    "nver", "batch_tile", "vertex_tile", "interpret"))
def _decode_dense_fused(param, w, u, pack, *, nver, batch_tile,
                        vertex_tile, interpret):
    b = param.shape[0]
    bt, vt = batch_tile, vertex_tile
    bpad = ((b + bt - 1) // bt) * bt
    npad = w.shape[1]
    assert npad % vt == 0, (npad, vt)

    raw = dewhiten(param, pack)
    alpha = raw[:, 12:62]                              # (B, 50)
    p12 = raw[:, :12].reshape(-1, 3, 4)
    p9 = p12[:, :, :3].reshape(-1, 9)                  # (B, 9)
    off = p12[:, :, 3]                                 # (B, 3)
    if bpad != b:
        pad = [(0, bpad - b), (0, 0)]
        alpha = jnp.pad(alpha, pad)
        p9 = jnp.pad(p9, pad)
        off = jnp.pad(off, pad)

    grid = (bpad // bt, npad // vt)
    out = pl.pallas_call(
        _decode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 50), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 9), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vt, 50), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 3, vt), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, 3, npad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bpad * 3 * npad * 50 + 9 * bpad * npad,
            bytes_accessed=(3 * npad * 50 * 4) * (bpad // bt)
            + bpad * 3 * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(alpha, p9, off, w, u)
    return out[:b, :, :nver]


_BASIS_CACHE: dict = {}


def get_decode_basis(pack: ParamPack) -> DecodeBasis:
    key = id(pack.w_shp)
    if key not in _BASIS_CACHE:
        _BASIS_CACHE[key] = build_decode_basis(pack)
    return _BASIS_CACHE[key]


def decode_dense_fast(param: jnp.ndarray, pack: ParamPack) -> jnp.ndarray:
    """Dense decode via the Pallas kernel on TPU, XLA codec elsewhere."""
    from synergynet_tpu.mm3d.codec import decode_dense
    if jax.default_backend() == "tpu":
        return decode_dense_fused(param, get_decode_basis(pack), pack)
    return decode_dense(param, pack)
