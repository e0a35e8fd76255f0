"""Fused Pallas kernel for the FaceBoxes deep-s2d stem (conv1 + maxpool).

Reference semantics: conv1 7x7/4 + CRelu + 3x3/2 maxpool
(reference FaceBoxes/models/faceboxes.py:66-68,83-84). In the deep-s2d
(stem_r=8) formulation those become a 2x2 conv on the (H/8, W/8, 192)
packed input producing all four stride-4 phases as packed channels, and a
phase-shifted max (net.py::_phase_maxpool_s2d8). Measured as separate XLA
ops the pool dominates: the conv writes a 150 MB activation at B=32 that
the shifted maxes then re-read through misaligned 48-channel slices
(~1.75 ms of stem1's 2.6 ms, scripts/prof_serving_stages.py).

This kernel fuses both: per (frame, column-tile) grid step it DMAs the
input tile once, runs the four tap matmuls at full 128-lane occupancy
(192-in -> 192-out), applies bias+relu, and reduces the nine pool
candidates entirely in VMEM — the 4x-phase conv activation never touches
HBM. Traffic drops to read-input + write-pooled (~188 MB at B=32), the
MXU work is the same four (H8*(TJ+1), 192) x (192, 192) products.

Grid: (B, W8/TJ). Each step needs conv outputs for one extra column on
the left (the pool's q=1 candidate from the previous column block), so
the input tile carries a 2-column halo; the global left/top halo is a
zero pad of the mean-subtracted input, matching the conv's
((1,0),(1,0)) padding. The fake column-(-1) conv output of the leftmost
tile is masked to 0, which is neutral for the post-relu max (the real
pool's left pad is -inf; every real candidate is >= 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(w8: int):
    """Largest multiple-of-8 divisor of w8 that is <= 40 (VMEM-sized
    column tiles; 8 for the 1088-wide canvas, 136 = 17*8).

    Mosaic requires the last two dims of every block shape to be divisible
    by (8, 128) or equal to the full array dims (the round-4 bench died on
    tj=34: jax/_src/pallas/mosaic/lowering.py::_check_block_mappings). The
    column-tile axis is second-to-last in the out spec, so only multiples
    of 8 (or w8 itself, kept under the VMEM cap) are legal. Returns None
    when no legal tile exists — callers must fall back to the XLA path.
    """
    for t in range(40 - 40 % 8, 0, -8):
        if w8 % t == 0:
            return t
    if w8 <= 40:        # full-width block == array dim: always legal
        return w8
    return None


def _stem_kernel(x_hbm, k_ref, b_ref, out_ref, scratch, sem, *,
                 h8, tj, cout):
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), :, pl.ds(j * tj, tj + 2)],
        scratch, sem)
    cp.start()
    cp.wait()

    xt = scratch[...]                                   # (h8+1, tj+2, c)
    acc = jnp.zeros((h8, tj + 1, 4 * cout), jnp.float32)
    for aa in range(2):
        for bb in range(2):
            xs = xt[aa:aa + h8, bb:bb + tj + 1, :]
            xs = xs.reshape(h8 * (tj + 1), xs.shape[-1])
            acc += jnp.dot(
                xs, k_ref[2 * aa + bb],
                preferred_element_type=jnp.float32,
            ).reshape(h8, tj + 1, 4 * cout)
    y = jnp.maximum(acc + b_ref[...].astype(jnp.float32), 0.0)
    # Local column 0 is the global column -1 only on the leftmost tile;
    # there it is a pool pad, not a conv output — zero is neutral.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tj + 1, 1), 1)
    y = jnp.where(jnp.logical_or(col > 0, j > 0), y, 0.0)

    y00 = y[:, :, 0 * cout:1 * cout]
    y01 = y[:, :, 1 * cout:2 * cout]
    y10 = y[:, :, 2 * cout:3 * cout]
    y11 = y[:, :, 3 * cout:4 * cout]

    def up(a):                       # row i-1's value at i; top edge -> 0
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)

    r0 = jnp.maximum(jnp.maximum(up(y10), y00), y10)
    r1 = jnp.maximum(jnp.maximum(up(y11), y01), y11)
    out = jnp.maximum(jnp.maximum(r1[:, 0:tj], r0[:, 1:tj + 1]),
                      r1[:, 1:tj + 1])
    out_ref[...] = out.astype(out_ref.dtype)[None]


def fused_stem1_s2d8(x, kernel, bias, *, cout: int = 48,
                     interpret: bool = False):
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
    tj = _pick_tile(w8)
    if tj is None:
        raise ValueError(
            f"no Mosaic-legal column tile for W8={w8} (needs a multiple-"
            "of-8 divisor); use the XLA stem path instead")
    xp = jnp.pad(x, ((0, 0), (1, 0), (2, 0), (0, 0)))
    k4 = kernel.astype(x.dtype).reshape(4, c, 4 * cout)
    grid = (b, w8 // tj)
    return pl.pallas_call(
        functools.partial(_stem_kernel, h8=h8, tj=tj, cout=cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # padded frames, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # (4, C, 4*cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias
        ],
        out_specs=pl.BlockSpec((1, h8, tj, cout),
                               lambda bi, ji: (bi, 0, ji, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h8, w8, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h8 + 1, tj + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, k4, bias)
