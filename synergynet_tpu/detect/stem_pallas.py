"""Fused Pallas kernel for the FaceBoxes deep-s2d stem (conv1 + maxpool).

Reference semantics: conv1 7x7/4 + CRelu + 3x3/2 maxpool
(reference FaceBoxes/models/faceboxes.py:66-68,83-84). In the deep-s2d
(stem_r=8) formulation those become a 2x2 conv on the (H/8, W/8, 192)
packed input producing all four stride-4 phases as packed channels, and a
phase-shifted max (net.py::_phase_maxpool_s2d8). Measured as separate XLA
ops the pool dominates: the conv writes a 150 MB activation at B=32 that
the shifted maxes then re-read through misaligned 48-channel slices
(~1.75 ms of stem1's 2.6 ms, scripts/prof_serving_stages.py).

This kernel fuses both: per (frame, row-band) grid step it DMAs a
full-width band of HB+2 input rows once, runs the four tap matmuls at
full 128-lane occupancy (192-in -> 192-out), applies bias+relu, and
reduces the nine pool candidates entirely in VMEM — the 4x-phase conv
activation never touches HBM. Traffic is read-input x (HB+2)/HB +
write-pooled; the MXU work is four ((HB+1)*TW, 192) x (192, 192)
products per band.

Why ROW bands (round-5 redesign): three successive on-chip Mosaic
failures killed the column-tiled variants —
  1. out-block column tile 34 violated the (8,128) divisibility rule
     (round 4, BENCH_r04.json);
  2. the (h8, tj+1, C) -> (h8*(tj+1), C) matmul collapse with tj+1=9
     failed infer-vector-layout ("unsupported shape cast": the collapsed
     second-minor must be a multiple of the 16-row bf16 sublane tile);
  3. the halo DMA's partial slice of the tiled column dim (17 of 145)
     failed memref lowering.
Row bands sidestep all three: the frame rides in as a whole-frame VMEM
block (no halo DMA at all — a fourth on-chip failure showed
``memref_slice`` on a VMEM-placed input rejects partial tiled-dim
slices, and ``memory_space=ANY`` placed the single-frame input in VMEM),
the kernel slices bands on the untiled row axis, the matmul collapse
keeps a 16-aligned column count TW, and the out block spans the full W8
so it always equals the array dim. None of these constraints are visible
to jax.export's lowering gate (tests/test_pallas_lowering.py) — it stops
before infer-vector-layout — so any change here must be compile-probed
on real hardware before becoming a default path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pick_row_band(h8: int, w8: int, c: int, cout: int, itemsize: int = 2):
    """Largest divisor HB of h8 whose VMEM working set fits the budget.

    Resident per grid step: the whole padded frame block, double-buffered
    by Mosaic's pipeliner (2x (h8+2, tw+1, c)), the f32 conv accumulator
    (HB+1, TW, 4*cout), the double-buffered out block, and the tap
    weights. Budget ~12 MB of the 16 MB VMEM leaves room for spills.
    Returns None when even HB=1 does not fit (callers fall back to XLA).
    """
    tw = _round_up(w8 + 1, 16)
    frame = 2 * (h8 + 2) * (tw + 1) * c * itemsize
    weights = 4 * c * 4 * cout * itemsize
    for hb in sorted((d for d in range(1, h8 + 1) if h8 % d == 0),
                     reverse=True):
        acc = (hb + 1) * tw * 4 * cout * 4
        out = 2 * hb * w8 * cout * itemsize
        if frame + weights + acc + out <= 12 * 2 ** 20:
            return hb
    return None


def _stem_kernel(x_ref, k_ref, b_ref, out_ref, *, hb, tw, w8, cout):
    i = pl.program_id(1)
    xt = x_ref[0, pl.ds(i * hb, hb + 2)]              # (hb+2, tw+1, c)
    # Conv rows r = 0..hb (local; global packed row i*hb + r - 1, row -1
    # being the pool's top halo) x conv cols m = 0..tw-1 (global conv col
    # m - 1, col -1 being the pool's left halo). tw is a multiple of 16
    # (the bf16 sublane tile, and a multiple of the f32 one) so the
    # 3D->2D matmul collapse below is a layout-preserving shape cast.
    acc = jnp.zeros((hb + 1, tw, 4 * cout), jnp.float32)
    for aa in range(2):
        for bb in range(2):
            xs = xt[aa:aa + hb + 1, bb:bb + tw, :]
            xs = xs.reshape((hb + 1) * tw, xs.shape[-1])
            acc += jnp.dot(
                xs, k_ref[2 * aa + bb],
                preferred_element_type=jnp.float32,
            ).reshape(hb + 1, tw, 4 * cout)
    y = jnp.maximum(acc + b_ref[...].astype(jnp.float32), 0.0)
    # Halo conv outputs that are really pool pads must be 0 (neutral for
    # the post-relu max; the real pool's -inf pad differs only below 0):
    # local col 0 is global conv col -1 everywhere; local row 0 is global
    # conv row -1 on the top band only (elsewhere it is the previous
    # band's last real row, recomputed). Columns >= w8+1 are right-pad
    # garbage; they never reach the out slice.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tw, 1), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (hb + 1, 1, 1), 0)
    y = jnp.where(col > 0, y, 0.0)
    y = jnp.where(jnp.logical_or(row > 0, i > 0), y, 0.0)

    y00 = y[:, :, 0 * cout:1 * cout]
    y01 = y[:, :, 1 * cout:2 * cout]
    y10 = y[:, :, 2 * cout:3 * cout]
    y11 = y[:, :, 3 * cout:4 * cout]

    # Pool output row h (local 0..hb-1) = conv rows h-1 (phase p1 of the
    # previous packed row) and h; both live locally at conv rows h, h+1.
    r0 = jnp.maximum(jnp.maximum(y10[:hb], y00[1:]), y10[1:])
    r1 = jnp.maximum(jnp.maximum(y11[:hb], y01[1:]), y11[1:])
    out = jnp.maximum(jnp.maximum(r1[:, 0:w8], r0[:, 1:w8 + 1]),
                      r1[:, 1:w8 + 1])
    out_ref[...] = out.astype(out_ref.dtype)[None]


def fused_stem1_s2d8(x, kernel, bias, *, cout: int = 48,
                     interpret: bool = False, hb: int = None):
    """Fused conv1+maxpool for the stem_r=8 packed input.

    ``x``: (B, H8, W8, C) mean-subtracted s2d(r=8) frames (C = 192 for
    BGR); ``kernel``: (2, 2, C, 4*cout) from net.stem_kernel_to_s2d8;
    ``bias``: (4*cout,). Returns (B, H8, W8, cout) — bit-compatible with
    conv1_s2d8 + relu + _phase_maxpool_s2d8 up to f32 accumulation order.
    """
    b, h8, w8, c = x.shape
    if kernel.shape[:3] != (2, 2, c) or kernel.shape[3] != 4 * cout:
        raise ValueError(f"kernel shape {kernel.shape} does not match "
                         f"input channels {c} / cout {cout}")
    if hb is None:
        hb = _pick_row_band(h8, w8, c, cout, jnp.dtype(x.dtype).itemsize)
    elif h8 % hb:
        raise ValueError(f"hb={hb} does not divide H8={h8}")
    if hb is None:
        raise ValueError(
            f"no VMEM-sized row band for (H8={h8}, W8={w8}, C={c}); use "
            "the XLA stem path instead")
    tw = _round_up(w8 + 1, 16)
    # Top pad 2 rows (conv pad 1 + pool top halo 1); left pad 2 cols
    # (conv pad 1 + pool left halo 1); right pad so every band reads
    # tw+1 input columns.
    xp = jnp.pad(x, ((0, 0), (2, 0), (2, tw - 1 - w8), (0, 0)))
    k4 = kernel.astype(x.dtype).reshape(4, c, 4 * cout)
    grid = (b, h8 // hb)
    return pl.pallas_call(
        functools.partial(_stem_kernel, hb=hb, tw=tw, w8=w8, cout=cout),
        grid=grid,
        in_specs=[
            # Whole padded frame per block; the index is constant across
            # the band axis so the pipeliner fetches it once per frame
            # and prefetches frame bi+1 during bi's last band.
            pl.BlockSpec((1, h8 + 2, tw + 1, c), lambda bi, ii: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # (4, C, 4*cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias
        ],
        out_specs=pl.BlockSpec((1, hb, w8, cout),
                               lambda bi, ii: (bi, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h8, w8, cout), x.dtype),
        interpret=interpret,
    )(xp, k4, bias)
