"""Pallas TPU z-buffer rasterizer: tile-binned, VMEM-resident resolve.

Round 1 resolved the z-buffer with XLA segment reductions over fragment
windows (:mod:`synergynet_tpu.render.raster`); correct, but segment_max /
segment_min lower to serialized scatters on TPU (~90 ms/frame at 480x640)
and the fixed per-triangle window silently cropped triangles larger than
the cap. This kernel removes both limits by inverting the scatter into a
tile-local gather that never leaves VMEM:

1. **Plane records** (XLA prep): every triangle is compiled into affine
   plane equations over pixel position p = (x, y): barycentric u(p), v(p)
   (reference convention: v0 = p2 - p0, v1 = p1 - p0,
   Sim3DR/lib/rasterize_kernel.cpp:26-83, with the degenerate inverDeno=0
   rule), interpolated depth, and up to 5 payload planes (rgb, or
   tri-id + w0), plus the clamped integer bbox
   (rasterize_kernel.cpp:244-252). One record = 32 f32.
2. **Binning without scatter**: the image is cut into TH x TW pixel bins;
   each triangle is replicated into every bin its bbox overlaps (static
   RY x RX copy grid sized to the true max bbox — *no* size cap). Copies
   are ordered by (bin, triangle) with one argsort; per-bin segments are
   then padded to CHUNK-record boundaries by a pure *gather*, so every
   bin owns a whole number of record blocks.
3. **Pallas kernel**: a 1-D grid over record chunks. A scalar-prefetched
   chunk->bin map drives the BlockSpec index maps, so consecutive chunks
   of one bin revisit the same VMEM-resident (TH, TW) z-buffer/payload
   block (the classic accumulation pipeline — blocks spill to HBM only
   once per bin). Each chunk evaluates its records' planes over the whole
   tile, 8 triangles at a time on the VPU, and merges with a
   strictly-greater depth test in triangle order — the reference's
   sequential first-triangle-wins rule (rasterize_kernel.cpp:263-282) and
   the round-1 resolve's exact contract.

Work is O(sum of bbox-overlapped tile areas) with zero scatters, zero
host round-trips, and static shapes throughout (the only recompile knobs
are the image canvas and the bucketed RY/RX replication grid).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synergynet_tpu.render.raster import DEPTH_INIT

TH, TW = 8, 128          # pixel bin = one f32 VPU tile
CHUNK = 512              # records per grid step (on-chip sweep: 512/16
G = 16                   # records/sub-batch run ~1.6x over 256/8)
REC_W = 32               # record row width (sublane-aligned)
_NEVER = -3.4e38         # depth of non-covered / padding fragments

# The binned program materializes (T * ry * rx) record rows of 128 f32
# (512 B each). A face mesh at overlay scale needs ry*rx = 4 (~200 MB);
# a pathological mesh of canvas-spanning triangles can demand ry*rx in
# the hundreds, which would OOM deep inside XLA. Entry points check this
# budget (rows, = 2 GiB of records) and fall back to the host paths.
REPLICATION_ROW_BUDGET = 4_000_000


def within_replication_budget(n_triangles: int, ry: int, rx: int) -> bool:
    """True when the (ry, rx) copy grid keeps the binned record array
    under :data:`REPLICATION_ROW_BUDGET` rows."""
    return n_triangles * ry * rx <= REPLICATION_ROW_BUDGET

# Record row layout (f32):
#   0-2    Au Bu Cu        u(p) = Au*x + Bu*y + Cu
#   3-5    Av Bv Cv        v(p)
#   6-8    Ad Bd Cd        depth(p)
#   9-23   payload planes  (up to 5 affine payloads, 3 coeffs each)
#   24-27  x_min x_max y_min y_max   (clamped inclusive bbox, as f32)
_PAYLOAD0 = 9
_BBOX0 = 24

# Compact (deferred-payload) record layout — 16 f32, PACK = 8 records per
# 128-lane row:
#   0-8    u/v/depth planes as above
#   9      triangle id (exact in f32 below 2^24)
#   10-13  x_min x_max y_min y_max
#   14-15  pad
RECC_W = 16
PACK = 128 // RECC_W
_CID = 9
_CBBOX0 = 10


def _bary_setup(vertices, triangles):
    """Shared barycentric plane setup: (V, 3) verts + (T, 3) tris ->
    (attr_plane, base_rows, bbox_rows) where ``attr_plane(a0, a1, a2)``
    compiles a per-vertex attribute into its 3 affine coefficients,
    ``base_rows`` are the 9 u/v/depth plane rows and ``bbox_rows`` the 4
    unclamped bbox rows (the binning stage clamps to the canvas)."""
    p0 = vertices[triangles[:, 0]]
    p1 = vertices[triangles[:, 1]]
    p2 = vertices[triangles[:, 2]]

    v0 = p2[:, :2] - p0[:, :2]
    v1 = p1[:, :2] - p0[:, :2]
    dot00 = jnp.sum(v0 * v0, 1)
    dot01 = jnp.sum(v0 * v1, 1)
    dot11 = jnp.sum(v1 * v1, 1)
    den = dot00 * dot11 - dot01 * dot01
    # Same relative-tolerance degeneracy rule as raster.py:70-77; inv = 0
    # makes u = v = 0 so a degenerate triangle paints its bbox with vertex-0
    # attributes, the reference's inverDeno = 0 behavior.
    degenerate = jnp.abs(den) <= 1e-6 * dot00 * dot11
    inv = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, den))

    au = (dot11 * v0[:, 0] - dot01 * v1[:, 0]) * inv
    bu = (dot11 * v0[:, 1] - dot01 * v1[:, 1]) * inv
    cu = -(au * p0[:, 0] + bu * p0[:, 1])
    av = (dot00 * v1[:, 0] - dot01 * v0[:, 0]) * inv
    bv = (dot00 * v1[:, 1] - dot01 * v0[:, 1]) * inv
    cv = -(av * p0[:, 0] + bv * p0[:, 1])

    def attr_plane(a0, a1, a2):
        # value(p) = a0 + (a2 - a0) * u + (a1 - a0) * v   (w1 = v, w2 = u)
        du, dv = a2 - a0, a1 - a0
        return (du * au + dv * av, du * bu + dv * bv,
                a0 + du * cu + dv * cv)

    base_rows = [au, bu, cu, av, bv, cv,
                 *attr_plane(p0[:, 2], p1[:, 2], p2[:, 2])]
    xs = jnp.stack([p0[:, 0], p1[:, 0], p2[:, 0]], 1)
    ys = jnp.stack([p0[:, 1], p1[:, 1], p2[:, 1]], 1)
    bbox_rows = [jnp.floor(xs.min(1)), jnp.ceil(xs.max(1)),
                 jnp.floor(ys.min(1)), jnp.ceil(ys.max(1))]
    return attr_plane, base_rows, bbox_rows


def _plane_setup(vertices, triangles, payload_cols):
    """(V, 3) verts + (T, 3) tris + per-vertex payload columns [(V,), ...]
    -> (T, REC_W) records with zeroed bbox fields."""
    attr_plane, rows, bbox_rows = _bary_setup(vertices, triangles)
    rows = list(rows)
    for col in payload_cols:
        a0, a1, a2 = (col[triangles[:, k]] for k in range(3))
        rows.extend(attr_plane(a0, a1, a2))
    rows += [jnp.zeros_like(rows[0])] * (_BBOX0 - len(rows))
    rows += bbox_rows
    rec = jnp.stack(rows, axis=1)
    return jnp.pad(rec, ((0, 0), (0, REC_W - rec.shape[1])))


def _plane_setup_compact(vertices, triangles, payload_cols):
    """Deferred-payload record build: (T, RECC_W) compact records carrying
    only the u/v/depth planes + triangle id + bbox, PLUS the per-triangle
    payload plane coefficients (T, P, 3) evaluated later — per winning
    pixel, not per record x pixel (see :func:`_eval_deferred_payloads`)."""
    attr_plane, rows, bbox_rows = _bary_setup(vertices, triangles)
    t = triangles.shape[0]
    rows = list(rows) + [jnp.arange(t, dtype=jnp.float32)] + bbox_rows
    rec = jnp.stack(rows, axis=1)
    rec = jnp.pad(rec, ((0, 0), (0, RECC_W - rec.shape[1])))
    planes = jnp.stack([
        jnp.stack(attr_plane(*(col[triangles[:, k]] for k in range(3))), 1)
        for col in payload_cols], 1)                       # (T, P, 3)
    return rec, planes


def _eval_deferred_payloads(tri_id, drawn, planes):
    """(h, w) winner ids + (T, P, 3) payload plane coefficients -> (P, h, w)
    payload buffers: one plane evaluation per WINNING pixel (the in-kernel
    formulation pays it per record x tile pixel). Same f32 a*x + b*y + c as
    the kernel's ``plane``."""
    h, w = tri_id.shape
    cp = planes[jnp.clip(tri_id, 0, planes.shape[0] - 1)]   # (h, w, P, 3)
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 0)
    val = cp[..., 0] * x + cp[..., 1] * y + cp[..., 2]      # (h, w, P)
    val = jnp.where(drawn[..., None], val, 0.0)
    return jnp.moveaxis(val, -1, 0)


def _raster_kernel(c2b_ref, cc_ref, src0_ref, rec_hbm, *out_refs,
                   nbx, n_payload):
    *out_refs, scratch, sem = out_refs
    zbuf_ref = out_refs[0]
    pay_refs = out_refs[1:]
    c = pl.program_id(0)
    nsteps = pl.num_programs(0)
    b = c2b_ref[c]
    prev = c2b_ref[jnp.maximum(c - 1, 0)]
    first = jnp.logical_or(c == 0, b != prev)

    # Double-buffered manual DMA of this chunk's record rows straight out
    # of the bin-sorted HBM array (no chunk-aligned re-materialization —
    # the sorted segments are read in place at dynamic row offsets).
    # Empty chunks issue no DMA and no compute.
    def start_dma(cc_idx, slot):
        pltpu.make_async_copy(
            rec_hbm.at[pl.ds(src0_ref[cc_idx], CHUNK)],
            scratch.at[slot], sem.at[slot]).start()

    @pl.when(jnp.logical_and(c == 0, cc_ref[0] > 0))
    def _warmup():
        start_dma(0, 0)

    @pl.when(jnp.logical_and(c + 1 < nsteps, cc_ref[
        jnp.minimum(c + 1, nsteps - 1)] > 0))
    def _prefetch_next():
        start_dma(c + 1, (c + 1) % 2)

    @pl.when(first)
    def _init():
        zbuf_ref[:] = jnp.full((TH, TW), DEPTH_INIT, jnp.float32)
        for pr in pay_refs:
            pr[:] = jnp.zeros((TH, TW), jnp.float32)

    count = cc_ref[c]

    @pl.when(count > 0)
    def _work():
        slot = c % 2
        pltpu.make_async_copy(rec_hbm.at[pl.ds(src0_ref[c], CHUNK)],
                              scratch.at[slot], sem.at[slot]).wait()
        rec_ref = scratch.at[slot]
        by = (b // nbx).astype(jnp.float32)
        bx = (b % nbx).astype(jnp.float32)
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, TH * TW), 1)
        pxf = bx * TW + (ids % TW).astype(jnp.float32)
        pyf = by * TH + (ids // TW).astype(jnp.float32)
        gio = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)

        def body(g, carry):
            zb, pays = carry
            r = rec_ref[pl.ds(g * G, G), :]

            def plane(i):
                return (r[:, i:i + 1] * pxf + r[:, i + 1:i + 2] * pyf
                        + r[:, i + 2:i + 3])

            u = plane(0)
            v = plane(3)
            d = plane(6)
            pvals = [plane(_PAYLOAD0 + 3 * k) for k in range(n_payload)]
            # Rows past the segment tail are a neighboring bin's records
            # (the DMA reads CHUNK rows unconditionally) — mask them out.
            live = (g * G + gio) < count                      # (G, 1)
            cov = (live & (u >= 0) & (v >= 0) & (u + v < 1)
                   & (pxf >= r[:, _BBOX0:_BBOX0 + 1])
                   & (pxf <= r[:, _BBOX0 + 1:_BBOX0 + 2])
                   & (pyf >= r[:, _BBOX0 + 2:_BBOX0 + 3])
                   & (pyf <= r[:, _BBOX0 + 3:_BBOX0 + 4]))
            d = jnp.where(cov, d, _NEVER)
            # Tree merge across the G sub-batch (full-width VPU tiles, vs
            # G sequential 1-sublane updates): per-pixel max depth; among
            # equal-depth records the smallest index wins (min over masked
            # iota — Mosaic has no cumsum/argmax, so build the one-hot from
            # max + min-index). This is the reference's sequential
            # strictly-greater depth test within the sub-batch; the
            # cross-batch update stays strictly-greater in triangle order.
            bd = jnp.max(d, axis=0, keepdims=True)            # (1, P)
            gi = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
            wi = jnp.min(jnp.where(d == bd, gi, G), axis=0, keepdims=True)
            fm = (gi == wi).astype(jnp.float32)               # (G, P)
            upd = bd > zb
            zb = jnp.where(upd, bd, zb)
            pays = [jnp.where(upd, jnp.sum(pv * fm, axis=0, keepdims=True),
                              pz)
                    for pv, pz in zip(pvals, pays)]
            return zb, pays

        zb0 = zbuf_ref[:].reshape(1, TH * TW)
        pays0 = [pr[:].reshape(1, TH * TW) for pr in pay_refs]
        zb, pays = jax.lax.fori_loop(0, pl.cdiv(count, G), body,
                                     (zb0, pays0))
        zbuf_ref[:] = zb.reshape(TH, TW)
        for pr, pv in zip(pay_refs, pays):
            pr[:] = pv.reshape(TH, TW)


def _clamp_and_bins(rec, *, h, w, ry, rx, bbox0):
    """Clamp record bboxes to the canvas and compute the bin id of every
    replication copy. Returns (rec_clamped, bins (T*R,) int32 in
    [0, nbins], parked copies at the nbins sentinel)."""
    nby, nbx = -(-h // TH), -(-w // TW)
    nbins = nby * nbx

    # Clamp the record bbox (computed once in _plane_setup from the same
    # vertex gathers) to the canvas — reference rasterize_kernel.cpp:244-252.
    x_min = jnp.maximum(rec[:, bbox0].astype(jnp.int32), 0)
    x_max = jnp.minimum(rec[:, bbox0 + 1].astype(jnp.int32), w - 1)
    y_min = jnp.maximum(rec[:, bbox0 + 2].astype(jnp.int32), 0)
    y_max = jnp.minimum(rec[:, bbox0 + 3].astype(jnp.int32), h - 1)
    rec = rec.at[:, bbox0].set(x_min.astype(jnp.float32))
    rec = rec.at[:, bbox0 + 1].set(x_max.astype(jnp.float32))
    rec = rec.at[:, bbox0 + 2].set(y_min.astype(jnp.float32))
    rec = rec.at[:, bbox0 + 3].set(y_max.astype(jnp.float32))

    # Bin replication: copy (cy, cx) of a triangle covers bin
    # (y_min//TH + cy, x_min//TW + cx) when that bin intersects its bbox.
    empty = (x_max < x_min) | (y_max < y_min)
    by0, by1 = y_min // TH, y_max // TH
    bx0, bx1 = x_min // TW, x_max // TW
    cy = jnp.arange(ry, dtype=jnp.int32)[None, :, None]
    cx = jnp.arange(rx, dtype=jnp.int32)[None, None, :]
    bys = by0[:, None, None] + cy
    bxs = bx0[:, None, None] + cx
    valid = ((bys <= by1[:, None, None]) & (bxs <= bx1[:, None, None])
             & ~empty[:, None, None])
    bins = jnp.where(valid, bys * nbx + bxs, nbins).reshape(-1)   # (T*R,)
    return rec, bins


def _bin_maps(rec, t, *, h, w, ry, rx, bbox0):
    """Shared binning core: clamp bboxes, replicate copies into bins, sort
    by (bin, triangle), derive the per-bin segment and per-chunk maps.
    Returns (rec_clamped, order_tri, starts, chunk_start, c2b, ccount)."""
    nby, nbx = -(-h // TH), -(-w // TW)
    nbins = nby * nbx
    rcount = ry * rx
    rec, bins = _clamp_and_bins(rec, h=h, w=w, ry=ry, rx=rx, bbox0=bbox0)

    # Order copies by (bin, triangle). The per-bin order must be triangle
    # order — the depth-test tie-break relies on it. A triangle's R copies
    # all target DISTINCT bins, so within a bin each triangle appears at
    # most once and the TRIANGLE index (20 bits for the 846K-tri 8-face
    # mesh — vs 23 for the copy index, which overflowed int32 at 8 faces
    # and silently fell back to the ~10x slower stable pair sort) fully
    # determines both the order and the gather row. Pack bin into the high
    # bits and sort ONE int32 array; duplicate keys only occur among
    # parked (bin == nbins) copies, past every segment end.
    tri_bits = max(1, int(t - 1).bit_length())
    if tri_bits + int(nbins).bit_length() <= 31:
        tri_of_copy = (jnp.arange(t * rcount, dtype=jnp.int32)
                       // jnp.int32(rcount))
        packed = jax.lax.sort((bins << tri_bits) | tri_of_copy)
        order_tri = packed & ((1 << tri_bits) - 1)
        seg_keys = packed
        seg_queries = jnp.arange(nbins + 1) << tri_bits
    else:
        copy_idx = jnp.arange(t * rcount, dtype=jnp.int32)
        seg_keys, order = jax.lax.sort((bins, copy_idx), num_keys=1,
                                       is_stable=True)
        order_tri = order // rcount
        seg_queries = jnp.arange(nbins + 1)

    # Per-bin segments; every bin gets >= 1 chunk so its output tile is
    # initialized even when empty. All arrays here are bin- or
    # chunk-indexed (a few hundred to ~2K entries) — per-SLOT maps are
    # derived by broadcasting, never by 100K+-element scalar gathers.
    # compare_all beats the default scan lowering ~4x at this size.
    starts = jnp.searchsorted(seg_keys, seg_queries,
                              method="compare_all").astype(jnp.int32)
    counts = starts[1:] - starts[:-1]                              # (NBINS,)
    nchunks = jnp.maximum(-(-counts // CHUNK), 1)
    chunk_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)])

    total_chunks_max = t * rcount // CHUNK + nbins + 1
    cd = jnp.arange(total_chunks_max, dtype=jnp.int32)
    # compare_all: the default 'scan' method serializes a binary-search
    # while_loop per query (~14K queries here)
    c2b = jnp.clip(jnp.searchsorted(chunk_start, cd, side="right",
                                    method="compare_all") - 1,
                   0, nbins - 1).astype(jnp.int32)
    in_use = cd < chunk_start[-1]
    ccount = jnp.where(
        in_use,
        jnp.clip(counts[c2b] - (cd - chunk_start[c2b]) * CHUNK, 0, CHUNK),
        0).astype(jnp.int32)
    # Unused trailing chunks revisit the final bin as no-ops, keeping each
    # output block's revisit run consecutive.
    c2b = jnp.where(in_use, c2b, nbins - 1)
    return rec, order_tri, starts, chunk_start, c2b, ccount, cd


def _prepare(rec, vertices, triangles, *, h, w, ry, rx):
    """Bin + order + chunk-align: records (T, REC_W) ->
    (c2b (C,), ccount (C,), src0 (C,), rec_sorted (T*R+C, 128))."""
    t = triangles.shape[0]
    rcount = ry * rx
    rec, order_tri, starts, chunk_start, c2b, ccount, cd = _bin_maps(
        rec, t, h=h, w=w, ry=ry, rx=rx, bbox0=_BBOX0)

    # One row gather into bin-sorted order; the kernel DMAs CHUNK-row
    # windows out of it at per-chunk offsets (no chunk-aligned
    # re-materialization — that gather cost ~7 ms at face-mesh scale).
    # CHUNK pad rows keep the tail window in bounds (the kernel masks
    # past-the-segment rows by count); lanes pad to 128 because Mosaic DMA
    # slices must be lane-tile aligned.
    rec_sorted = jnp.pad(rec[order_tri.astype(jnp.int32)],
                         ((0, CHUNK), (0, 128 - REC_W)))     # (T*R+C, 128)
    src0 = jnp.clip(starts[c2b] + (cd - chunk_start[c2b]) * CHUNK,
                    0, t * rcount)                           # (C,)
    return c2b, ccount, src0, rec_sorted


def _faces_fit_packed_sort(t, faces, *, h, w) -> bool:
    """True when the per-face (bin << tri_bits) | tri packed sort key fits
    int32 for ``t // faces`` triangles on this canvas."""
    nbins = (-(-h // TH)) * (-(-w // TW))
    t1 = t // faces
    tri_bits = max(1, int(t1 - 1).bit_length())
    return tri_bits + int(nbins).bit_length() <= 31


def _face_maps(rec, t, faces, *, h, w, ry, rx):
    """Shared multi-face binning core: per-face bin sorts + (bin, face)
    pseudo-segment chunk maps. Returns (rec_clamped, order_tri (F, n1),
    c2b, ccount, src0) with ``src0`` in face-major sorted-copy positions
    (global position p -> face p // n1, local sorted slot p % n1)."""
    nby, nbx = -(-h // TH), -(-w // TW)
    nbins = nby * nbx
    rcount = ry * rx
    t1 = t // faces
    n1 = t1 * rcount
    rec, bins = _clamp_and_bins(rec, h=h, w=w, ry=ry, rx=rx, bbox0=_BBOX0)
    bins2 = bins.reshape(faces, n1)

    # Per-face packed sort (same key construction as _bin_maps, one
    # batched lax.sort over the face axis) + per-face segment starts.
    tri_bits = max(1, int(t1 - 1).bit_length())
    tri_of_copy = (jnp.arange(n1, dtype=jnp.int32) // jnp.int32(rcount))
    packed = jax.lax.sort((bins2 << tri_bits) | tri_of_copy[None, :],
                          dimension=1)
    order_tri = packed & ((1 << tri_bits) - 1)               # (F, n1)
    seg_queries = (jnp.arange(nbins + 1, dtype=jnp.int32) << tri_bits)
    starts = jax.vmap(lambda k: jnp.searchsorted(
        k, seg_queries, method="compare_all"))(packed).astype(jnp.int32)
    counts = starts[:, 1:] - starts[:, :-1]                  # (F, nbins)

    # Chunk maps over (bin, face) pseudo-segments. Segment s = b*F + f;
    # every real bin keeps >= 1 chunk (its face-0 segment is bumped) so
    # its output tile is initialized even when empty.
    counts_bf = counts.T.reshape(-1)                         # (NBINS*F,)
    nchunks = -(-counts_bf // CHUNK)
    sidx = jnp.arange(nbins * faces, dtype=jnp.int32)
    nchunks = jnp.where((sidx % faces == 0) & (nchunks == 0), 1, nchunks)
    chunk_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)])

    # sum ceil(c_i/CHUNK) + bin bumps <= total//CHUNK + nbins*faces.
    total_chunks_max = t * rcount // CHUNK + nbins * faces + 1
    cd = jnp.arange(total_chunks_max, dtype=jnp.int32)
    c2s = jnp.clip(jnp.searchsorted(chunk_start, cd, side="right",
                                    method="compare_all") - 1,
                   0, nbins * faces - 1).astype(jnp.int32)
    in_use = cd < chunk_start[-1]
    ccount = jnp.where(
        in_use,
        jnp.clip(counts_bf[c2s] - (cd - chunk_start[c2s]) * CHUNK,
                 0, CHUNK), 0).astype(jnp.int32)
    # Unused trailing chunks revisit the final bin as no-ops.
    c2b = jnp.where(in_use, c2s // faces, nbins - 1).astype(jnp.int32)
    segf = c2s % faces
    segb = c2s // faces
    seg_start = starts.reshape(-1)[segf * (nbins + 1) + segb]
    src0 = jnp.clip(segf * n1 + seg_start + (cd - chunk_start[c2s]) * CHUNK,
                    0, t * rcount)                           # (C,)
    return rec, order_tri, c2b, ccount, src0


def _prepare_faces(rec, t, faces, *, h, w, ry, rx):
    """Multi-face variant of :func:`_prepare`: per-face bin sorts and
    per-face bin-order gathers, chunk maps merged (bin, face)-major.

    Why: the global formulation's single row gather reads a (T, REC_W)
    table whose working set at 8 concatenated face meshes is ~100 MB. XLA
    picks its gather strategy from the STATIC operand size, so throughput
    collapses from ~700M rows/s (12 MB single-face table) to ~44M rows/s
    — measured round 3, the gather alone cost more than the rest of the
    frame (scripts/prof_overlay_stages.py; a face-partitioned index stream
    over the same big table is just as slow, so runtime locality doesn't
    help). Unrolled per-face gathers from static 1/F slices run ~6x
    faster (241-272M rows/s measured).

    The kernel is unchanged: chunks are ordered by (bin, face) pseudo-
    segments — bin-major, so each output tile's chunk run stays
    consecutive — and the existing per-chunk source-offset map simply
    points into face-major sorted storage. Per-bin record order
    (face asc, local tri asc) equals the global path's (global tri asc):
    the output is bit-identical (tests/test_raster_tiled.py).
    """
    t1 = t // faces
    rec, order_tri, c2b, ccount, src0 = _face_maps(
        rec, t, faces, h=h, w=w, ry=ry, rx=rx)

    # The payoff: F gathers, each from a static (t1, REC_W) slice.
    parts = [jax.lax.slice(rec, (f * t1, 0), ((f + 1) * t1, REC_W))[
        order_tri[f]] for f in range(faces)]
    rec_sorted = jnp.pad(jnp.concatenate(parts, axis=0),
                         ((0, CHUNK), (0, 128 - REC_W)))     # (T*R+C, 128)
    return c2b, ccount, src0, rec_sorted


def _prepare_compact(rec, t, *, h, w, ry, rx):
    """Compact-record variant of :func:`_prepare`: (T, RECC_W) records ->
    (c2b (C,), ccount (C,), rec_packed (C * CHUNK // PACK, 128)).

    The sorted segments are re-materialized chunk-aligned with PACK = 8
    records per 128-lane row — the per-chunk DMA then reads a STATIC
    CHUNK // PACK-row window at c * CHUNK // PACK, and moves 8x fewer
    bytes per record than the 128-lane-padded full records pay. The
    re-materialization composes index maps (chunk source position ->
    sorted copy -> triangle) so the only large data movement writes
    RECC_W lanes per record."""
    rcount = ry * rx
    rec, order_tri, starts, chunk_start, c2b, ccount, cd = _bin_maps(
        rec, t, h=h, w=w, ry=ry, rx=rx, bbox0=_CBBOX0)

    # Chunk c's records are sorted positions src0[c] .. src0[c]+ccount[c];
    # broadcast to a (C, CHUNK) source map, compose with order_tri, gather
    # triangle rows, pack PACK records per 128-lane row. Rows past a
    # segment tail read a clamped (junk) record — the kernel masks them
    # via ccount.
    src0 = jnp.clip(starts[c2b] + (cd - chunk_start[c2b]) * CHUNK,
                    0, t * rcount - 1)
    pos = jnp.clip(src0[:, None] + jnp.arange(CHUNK, dtype=jnp.int32)[None],
                   0, t * rcount - 1)                        # (C, CHUNK)
    tri = order_tri[pos.reshape(-1)].astype(jnp.int32)       # (C*CHUNK,)
    rec_packed = rec[tri].reshape(-1, PACK * RECC_W)         # (C*CHUNK/8,128)
    return c2b, ccount, rec_packed


GR = 8                   # packed rows per VPU sub-batch: GR*PACK=64 records


def _raster_kernel_compact(c2b_ref, cc_ref, rec_hbm, zbuf_ref, idbuf_ref,
                           scratch, sem, *, nbx):
    """Deferred-payload kernel: depth test + winning triangle id only.

    Records are PACK-packed compact rows (see :func:`_prepare_compact`);
    payload planes are evaluated AFTER the kernel, once per winning pixel
    (:func:`_eval_deferred_payloads`) instead of per record x tile pixel.
    Within a sub-batch the winner among equal depths is the min triangle
    id — ids are strictly increasing in record order inside a bin (each
    triangle appears at most once per bin and copies sort by (bin, tri)),
    so min-id IS the first record: the reference's sequential
    first-triangle-wins rule (rasterize_kernel.cpp:263-282), exactly the
    contract of :func:`_raster_kernel`'s min-index one-hot."""
    rows = CHUNK // PACK
    c = pl.program_id(0)
    nsteps = pl.num_programs(0)
    b = c2b_ref[c]
    prev = c2b_ref[jnp.maximum(c - 1, 0)]
    first = jnp.logical_or(c == 0, b != prev)

    # Chunk c's rows sit at a STATIC offset c*rows (chunk-aligned
    # re-materialization) — no dynamic source map needed.
    def start_dma(cc_idx, slot):
        pltpu.make_async_copy(
            rec_hbm.at[pl.ds(cc_idx * rows, rows)],
            scratch.at[slot], sem.at[slot]).start()

    @pl.when(jnp.logical_and(c == 0, cc_ref[0] > 0))
    def _warmup():
        start_dma(0, 0)

    @pl.when(jnp.logical_and(c + 1 < nsteps, cc_ref[
        jnp.minimum(c + 1, nsteps - 1)] > 0))
    def _prefetch_next():
        start_dma(c + 1, (c + 1) % 2)

    @pl.when(first)
    def _init():
        zbuf_ref[:] = jnp.full((TH, TW), DEPTH_INIT, jnp.float32)
        idbuf_ref[:] = jnp.zeros((TH, TW), jnp.float32)

    count = cc_ref[c]

    @pl.when(count > 0)
    def _work():
        slot = c % 2
        pltpu.make_async_copy(rec_hbm.at[pl.ds(c * rows, rows)],
                              scratch.at[slot], sem.at[slot]).wait()
        rec_ref = scratch.at[slot]
        by = (b // nbx).astype(jnp.float32)
        bx = (b % nbx).astype(jnp.float32)
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, TH * TW), 1)
        pxf = bx * TW + (ids % TW).astype(jnp.float32)
        pyf = by * TH + (ids // TW).astype(jnp.float32)
        jio = jax.lax.broadcasted_iota(jnp.int32, (GR, 1), 0)
        big = jnp.float32(3.0e38)

        def body(g, carry):
            zb, idb = carry
            r = rec_ref[pl.ds(g * GR, GR), :]                # (GR, 128)
            ds, ids_k = [], []
            for k in range(PACK):
                o = k * RECC_W

                def plane(i, o=o):
                    return (r[:, o + i:o + i + 1] * pxf
                            + r[:, o + i + 1:o + i + 2] * pyf
                            + r[:, o + i + 2:o + i + 3])

                u = plane(0)
                v = plane(3)
                d = plane(6)
                # Packed row j, lane group k = record j*PACK + k; rows past
                # the segment tail are clamped junk — mask by count.
                live = (g * (GR * PACK) + jio * PACK + k) < count
                cov = (live & (u >= 0) & (v >= 0) & (u + v < 1)
                       & (pxf >= r[:, o + _CBBOX0:o + _CBBOX0 + 1])
                       & (pxf <= r[:, o + _CBBOX0 + 1:o + _CBBOX0 + 2])
                       & (pyf >= r[:, o + _CBBOX0 + 2:o + _CBBOX0 + 3])
                       & (pyf <= r[:, o + _CBBOX0 + 3:o + _CBBOX0 + 4]))
                ds.append(jnp.where(cov, d, _NEVER))
                ids_k.append(r[:, o + _CID:o + _CID + 1])

            dm = ds[0]
            for dk in ds[1:]:
                dm = jnp.maximum(dm, dk)
            bd = jnp.max(dm, axis=0, keepdims=True)          # (1, P)
            wm = None
            for dk, ik in zip(ds, ids_k):
                cand = jnp.where(dk == bd, ik + jnp.zeros_like(dk), big)
                wm = cand if wm is None else jnp.minimum(wm, cand)
            wid = jnp.min(wm, axis=0, keepdims=True)         # (1, P)
            upd = bd > zb
            return jnp.where(upd, bd, zb), jnp.where(upd, wid, idb)

        zb0 = zbuf_ref[:].reshape(1, TH * TW)
        id0 = idbuf_ref[:].reshape(1, TH * TW)
        zb, idb = jax.lax.fori_loop(0, pl.cdiv(count, GR * PACK), body,
                                    (zb0, id0))
        zbuf_ref[:] = zb.reshape(TH, TW)
        idbuf_ref[:] = idb.reshape(TH, TW)


def _launch_compact(c2b, ccount, rec_packed, *, h, w, interpret):
    """pallas_call over chunk-aligned packed records -> (zbuf, tri_id,
    drawn)."""
    nby, nbx = -(-h // TH), -(-w // TW)
    total_chunks_max = c2b.shape[0]
    hpad, wpad = nby * TH, nbx * TW
    tile_spec = pl.BlockSpec(
        (TH, TW), lambda c, c2b, cc: (c2b[c] // nbx, c2b[c] % nbx),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(total_chunks_max,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # HBM-resident
        out_specs=[tile_spec, tile_spec],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK // PACK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_raster_kernel_compact, nbx=nbx),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hpad, wpad), jnp.float32)
                   for _ in range(2)],
        cost_estimate=pl.CostEstimate(
            flops=18 * total_chunks_max * CHUNK * TH * TW,
            bytes_accessed=total_chunks_max * CHUNK * RECC_W * 4
            + 2 * hpad * wpad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(c2b, ccount, rec_packed)
    zbuf = outs[0][:h, :w]
    drawn = zbuf > DEPTH_INIT
    tri_id = jnp.where(drawn, outs[1][:h, :w].astype(jnp.int32), -1)
    return zbuf, tri_id, drawn


def _run_tiled_deferred(rec, planes, t, *, h, w, ry, rx, interpret):
    c2b, ccount, rec_packed = _prepare_compact(rec, t, h=h, w=w,
                                               ry=ry, rx=rx)
    zbuf, tri_id, drawn = _launch_compact(c2b, ccount, rec_packed,
                                          h=h, w=w, interpret=interpret)
    return zbuf, _eval_deferred_payloads(tri_id, drawn, planes)


def _launch(c2b, ccount, src0, rec_sorted, *, h, w, n_payload, interpret):
    """pallas_call over the prepared chunks -> (zbuf, payload list)."""
    nby, nbx = -(-h // TH), -(-w // TW)
    total_chunks_max = c2b.shape[0]
    hpad, wpad = nby * TH, nbx * TW
    tile_spec = pl.BlockSpec(
        (TH, TW), lambda c, c2b, cc, s0: (c2b[c] // nbx, c2b[c] % nbx),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(total_chunks_max,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # HBM-resident
        out_specs=[tile_spec for _ in range(1 + n_payload)],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, 128), jnp.float32),      # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_raster_kernel, nbx=nbx, n_payload=n_payload),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hpad, wpad), jnp.float32)
                   for _ in range(1 + n_payload)],
        cost_estimate=pl.CostEstimate(
            flops=(14 + 2 * n_payload) * total_chunks_max * CHUNK * TH * TW,
            bytes_accessed=total_chunks_max * CHUNK * REC_W * 4
            + (1 + n_payload) * hpad * wpad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(c2b, ccount, src0, rec_sorted)
    zbuf = outs[0][:h, :w]
    pays = jnp.stack([o[:h, :w] for o in outs[1:]]) if n_payload else \
        jnp.zeros((0, h, w), jnp.float32)
    return zbuf, pays


def _run_tiled(rec, vertices, triangles, *, h, w, ry, rx, n_payload,
               interpret, faces=1):
    t = triangles.shape[0]
    if faces > 1 and _faces_fit_packed_sort(t, faces, h=h, w=w):
        c2b, ccount, src0, rec_sorted = _prepare_faces(
            rec, t, faces, h=h, w=w, ry=ry, rx=rx)
    else:
        c2b, ccount, src0, rec_sorted = _prepare(rec, vertices, triangles,
                                                 h=h, w=w, ry=ry, rx=rx)
    return _launch(c2b, ccount, src0, rec_sorted, h=h, w=w,
                   n_payload=n_payload, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("h", "w", "ry", "rx",
                                             "interpret", "faces"))
def _rasterize_color(vertices, triangles, colors, *, h, w, ry, rx,
                     interpret, faces=1):
    rec = _plane_setup(vertices, triangles,
                       [colors[:, 0], colors[:, 1], colors[:, 2]])
    return _run_tiled(rec, vertices, triangles, h=h, w=w, ry=ry, rx=rx,
                      n_payload=3, interpret=interpret, faces=faces)


@functools.partial(jax.jit, static_argnames=("h", "w", "ry", "rx",
                                             "interpret", "faces"))
def _rasterize_color_auto(vertices, triangles, colors, *, h, w, ry, rx,
                          interpret, faces=1):
    """Color rasterize with a data-dependent copy grid.

    (ry, rx) must be sized for the worst case (canvas-wide rois -> ~18 px
    triangles -> (4, 2)), but typical face rois produce triangles whose
    bboxes fit a single bin span, where a (2, 2) grid suffices — half the
    copies entering the bin sort and record gather. The triangle bbox
    extents are already in the plane records, so one reduction picks the
    branch; both branches share the record build and produce identical
    output whenever the small grid is sufficient (the guard guarantees
    it).
    """
    rec = _plane_setup(vertices, triangles,
                       [colors[:, 0], colors[:, 1], colors[:, 2]])
    if (ry, rx) == (2, 2) or ry < 2:
        return _run_tiled(rec, vertices, triangles, h=h, w=w, ry=ry, rx=rx,
                          n_payload=3, interpret=interpret, faces=faces)
    # Unclamped ceil/floor bbox extents: E <= TILE guarantees the bbox
    # touches at most 2 bins per axis even when it straddles a boundary.
    ey = jnp.max(rec[:, _BBOX0 + 3] - rec[:, _BBOX0 + 2])
    ex = jnp.max(rec[:, _BBOX0 + 1] - rec[:, _BBOX0])
    small = (ey <= TH) & (ex <= TW)

    def run(g):
        def f(r):
            return _run_tiled(r, vertices, triangles, h=h, w=w,
                              ry=g[0], rx=g[1], n_payload=3,
                              interpret=interpret, faces=faces)
        return f

    return jax.lax.cond(small, run((2, 2)), run((ry, rx)), rec)


@functools.partial(jax.jit, static_argnames=("h", "w", "ry", "rx",
                                             "interpret"))
def _rasterize_color_deferred(vertices, triangles, colors, *, h, w, ry, rx,
                              interpret):
    rec, planes = _plane_setup_compact(
        vertices, triangles, [colors[:, 0], colors[:, 1], colors[:, 2]])
    return _run_tiled_deferred(rec, planes, triangles.shape[0], h=h, w=w,
                               ry=ry, rx=rx, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("h", "w", "ry", "rx",
                                             "interpret"))
def _rasterize_color_auto_deferred(vertices, triangles, colors, *, h, w,
                                   ry, rx, interpret):
    """Deferred-payload color rasterize with the data-dependent copy grid
    of :func:`_rasterize_color_auto`."""
    rec, planes = _plane_setup_compact(
        vertices, triangles, [colors[:, 0], colors[:, 1], colors[:, 2]])
    t = triangles.shape[0]
    if (ry, rx) == (2, 2) or ry < 2:
        return _run_tiled_deferred(rec, planes, t, h=h, w=w, ry=ry, rx=rx,
                                   interpret=interpret)
    ey = jnp.max(rec[:, _CBBOX0 + 3] - rec[:, _CBBOX0 + 2])
    ex = jnp.max(rec[:, _CBBOX0 + 1] - rec[:, _CBBOX0])
    small = (ey <= TH) & (ex <= TW)

    def run(g):
        def f(r):
            return _run_tiled_deferred(r, planes, t, h=h, w=w,
                                       ry=g[0], rx=g[1],
                                       interpret=interpret)
        return f

    return jax.lax.cond(small, run((2, 2)), run((ry, rx)), rec)


@functools.partial(jax.jit, static_argnames=("h", "w", "ry", "rx",
                                             "interpret"))
def _rasterize_visibility(vertices, triangles, *, h, w, ry, rx, interpret):
    t = triangles.shape[0]
    zeros = jnp.zeros((vertices.shape[0],), jnp.float32)
    rec = _plane_setup(vertices, triangles, [zeros, zeros])
    # Payload 0: triangle id as a constant plane (ids are shared-vertex-free
    # only per triangle, so they cannot ride a per-vertex column).
    rec = rec.at[:, _PAYLOAD0 + 2].set(jnp.arange(t, dtype=jnp.float32))
    # Payload 1: w0 = 1 - u - v.
    rec = rec.at[:, _PAYLOAD0 + 3].set(-(rec[:, 0] + rec[:, 3]))
    rec = rec.at[:, _PAYLOAD0 + 4].set(-(rec[:, 1] + rec[:, 4]))
    rec = rec.at[:, _PAYLOAD0 + 5].set(1.0 - (rec[:, 2] + rec[:, 5]))
    return _run_tiled(rec, vertices, triangles, h=h, w=w, ry=ry, rx=rx,
                      n_payload=2, interpret=interpret)


def rasterize_buffers_tiled(vertices: jnp.ndarray, triangles: jnp.ndarray,
                            colors: jnp.ndarray, *, h: int, w: int,
                            ry: int = 2, rx: int = 2,
                            interpret: bool = False,
                            auto_replication: bool = False,
                            deferred: bool = False,
                            faces: int = 1,
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in equivalent of :func:`raster.rasterize_buffers` on the tiled
    kernel: (depth (h, w) f32 init -1e8, color (h, w, 3)).

    ``auto_replication``: treat (ry, rx) as the worst-case grid and drop
    to (2, 2) at runtime when every triangle bbox fits one bin span (see
    :func:`_rasterize_color_auto`).

    ``faces``: the mesh is F stacked equal-topology sub-meshes (triangles
    grouped face-major, ``T % faces == 0``) — prep runs per-face sorts and
    per-face bin-order gathers (~6x faster at 8 concatenated face meshes;
    see :func:`_prepare_faces`), output bit-identical. Ignored by the
    deferred path.

    ``deferred``: alternative formulation where the kernel resolves depth
    + winning triangle id only and the color planes are evaluated once per
    winning pixel after the kernel (8x less record DMA, ~2.5x fewer
    per-record plane FMAs). Same output contract (winner choice is
    bit-identical; color differs only in FMA regrouping of the identical
    plane formula). Measured on the v5e chip it LOSES to the in-kernel
    payload path at both scales — 14.1 vs 7.2 ms on the single 105K-tri
    mesh @480x640 and 323 vs 287 ms raster-stage at 8 faces @720x1088
    ((4, 2) grid): record DMA was never the bottleneck (double-buffered
    behind compute), while the PACK-packed min-id merge adds VPU work per
    sub-batch and the per-winner plane gather adds an HBM pass. Kept
    off-default as a tested, documented negative result
    (tests/test_raster_tiled.py::test_deferred_matches_inkernel_payloads).

    A third variant — PACK4 chunk-aligned packed FULL records with
    in-kernel payloads — was built in round 4 and measured on-chip in
    round 5: the packed kernel matched the default (37.8 vs 34.4 ms at 8
    faces @720x1088) but its composed remat gather made prep 2.8x slower
    (388.8 vs 137.0 ms), 421 vs 190 ms end-to-end raster stage. Deleted
    per that measurement; the decision record lives in docs/RENDERER.md.
    """
    kw = {}
    if deferred:
        fn = (_rasterize_color_auto_deferred if auto_replication
              else _rasterize_color_deferred)
    else:
        fn = _rasterize_color_auto if auto_replication else _rasterize_color
        if triangles.shape[0] % faces:
            raise ValueError(
                f"faces={faces} does not divide T={triangles.shape[0]}")
        kw["faces"] = faces
    zbuf, pay = fn(
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(triangles, jnp.int32),
        jnp.asarray(colors, jnp.float32),
        h=h, w=w, ry=ry, rx=rx, interpret=interpret, **kw)
    return zbuf, jnp.moveaxis(pay, 0, -1)


def rasterize_triangles_tiled(vertices: jnp.ndarray,
                              triangles: jnp.ndarray, *, h: int, w: int,
                              ry: int = 2, rx: int = 2,
                              interpret: bool = False):
    """Visibility buffers on the tiled kernel — the equivalent of
    :func:`raster.rasterize_triangles` (reference ``_rasterize_triangles``,
    rasterize_kernel.cpp:290-348): (tri_id (h, w) int32, -1 where empty;
    depth (h, w) f32 init -1e8; barycentric w0 (h, w) f32)."""
    zbuf, pay = _rasterize_visibility(
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(triangles, jnp.int32),
        h=h, w=w, ry=ry, rx=rx, interpret=interpret)
    drawn = zbuf > DEPTH_INIT
    tri_id = jnp.where(drawn, pay[0].astype(jnp.int32), -1)
    w0 = jnp.where(drawn, pay[1], 0.0)
    return tri_id, zbuf, w0


def replication_for(vertices: np.ndarray, triangles: np.ndarray
                    ) -> Tuple[int, int]:
    """Smallest (ry, rx) bin-copy grid covering every triangle bbox —
    computed from the data, so nothing is ever silently cropped (fixes the
    round-1 32-px window cap, VERDICT item 5). Bucketed to powers of two
    to bound recompiles."""
    v = np.asarray(vertices)
    tr = np.asarray(triangles)
    if not len(tr):
        return 1, 1
    xs = v[:, 0][tr]
    ys = v[:, 1][tr]
    # A bbox spanning E pixels overlaps at most E // TILE + 2 bins.
    ey = int(np.ceil(ys.max(1) - np.floor(ys.min(1))).max())
    ex = int(np.ceil(xs.max(1) - np.floor(xs.min(1))).max())
    need_y, need_x = ey // TH + 2, ex // TW + 2

    def pot(n):
        p = 1
        while p < n:
            p *= 2
        return p
    return pot(need_y), pot(need_x)


def rasterize_tiled(vertices, triangles, colors, bg=None, height=None,
                    width=None, channel=None, reverse: bool = False,
                    alpha: float = 1.0,
                    replication: Optional[Tuple[int, int]] = None
                    ) -> np.ndarray:
    """Reference-compatible host API on the tiled kernel (mirror of
    :func:`raster.rasterize`, Sim3DR/Sim3DR.py:15-29)."""
    from synergynet_tpu.render.raster import blend_uint8

    if bg is not None:
        height, width, channel = bg.shape
        bg = np.asarray(bg, np.uint8)
    else:
        assert height is not None and width is not None
        bg = np.zeros((height, width, channel or 3), np.uint8)
    if replication is None:
        replication = replication_for(vertices, triangles)
    tr = np.asarray(triangles)
    if not within_replication_budget(tr.shape[0], *replication):
        # Canvas-spanning triangles: the copy grid would blow the record
        # budget. The native scalar z-buffer is O(sum bbox) with no
        # replication and is oracle-verified to the same contract.
        import warnings
        from synergynet_tpu import native
        warnings.warn(
            f"tiled rasterizer copy grid ry*rx={replication[0]}*"
            f"{replication[1]} over budget for {tr.shape[0]} triangles; "
            "falling back to the native host rasterizer", RuntimeWarning)
        if not native.native_available():
            raise RuntimeError(
                "mesh needs a replication grid over REPLICATION_ROW_BUDGET "
                "and the native host rasterizer is unavailable; downscale "
                "the canvas or split the mesh")
        img, _ = native.rasterize_cpu(
            np.asarray(vertices, np.float32), tr.astype(np.int32),
            np.asarray(colors, np.float32), bg, alpha=float(alpha),
            reverse=reverse)
        return img
    interpret = jax.default_backend() != "tpu"
    zbuf, color = rasterize_buffers_tiled(
        vertices, triangles, colors, h=height, w=width,
        ry=replication[0], rx=replication[1], interpret=interpret)
    out = blend_uint8(jnp.asarray(bg), zbuf, color, float(alpha),
                      reverse=reverse)
    return np.asarray(out)
