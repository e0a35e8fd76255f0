"""Stage-split profile of the fused 8-face overlay render on the real chip.

Times each stage of the render_lit_faces pipeline at the full 8-face scale
(846,720 triangles on the 720x1088 canvas) with the slope method from
bench.py (on-device fori_loop + per-iteration perturbation + scalar fetch,
two trip counts), to decide where the face-count-adaptivity work should go
(round-2 VERDICT weak item 1: flat 161 ms/frame regardless of face count).

Every large array rides as a jit ARGUMENT — closing over the 846K-triangle
topology (or the 3DMM basis) inlines tens of MB of literals into the HLO,
which over the remote-compile tunnel costs minutes per program (the reason
the first version of this script never finished a compile).

Stages:
  full      render_lit_faces (normals + lighting + binned raster)
  raster    rasterize_buffers_tiled only (plane setup + prep + kernel)
  prep      _plane_setup + _prepare only (records, sort, maps, gather)
  sort      the packed-key lax.sort alone at T*R size
  kernel    _launch alone on prebuilt maps/records
  light     normals + Phong lighting for 8 faces

Usage: python -u scripts/prof_overlay_stages.py [--faces 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces", type=int, default=8)
    ap.add_argument("--small", type=int, default=3)
    ap.add_argument("--large", type=int, default=9)
    ap.add_argument("--stages", default="full,raster,prep,sort,kernel,light")
    ap.add_argument("--repl", default=None,
                    help="ry,rx bin-copy grid override (default "
                         "DEFAULT_REPLICATION; the adaptive full path "
                         "auto-drops to 2,2)")
    ap.add_argument("--deferred", type=int, default=0,
                    help="1: deferred-payload compact-record kernel "
                         "(tested alternative); 0: in-kernel payloads "
                         "(the default path)")
    ap.add_argument("--per-face", type=int, default=1,
                    help="1: per-face prep (_prepare_faces, the engine "
                         "path at faces>1); 0: global sort+gather")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from synergynet_tpu.core import enable_compile_cache
    enable_compile_cache()
    from synergynet_tpu.mm3d import decode_dense, load_param_pack
    from synergynet_tpu.render import raster_tiled as rt
    from synergynet_tpu.render.normals import one_ring_table
    import functools
    from synergynet_tpu.pipeline import overlay_engine as oe
    from synergynet_tpu.pipeline.overlay_engine import DEFAULT_REPLICATION
    deferred = bool(args.deferred)
    # render_lit_faces doesn't expose the kernel choice; patch its binding.
    oe.rasterize_buffers_tiled = functools.partial(
        rt.rasterize_buffers_tiled, deferred=deferred)
    render_lit_faces = oe.render_lit_faces

    pack = load_param_pack()
    mean_face = np.asarray(
        decode_dense(jnp.zeros((1, 62), jnp.float32), pack))[0].T
    tris = np.ascontiguousarray(np.asarray(pack.tri).T).astype(np.int32)
    f = args.faces
    nver = mean_face.shape[0]
    tris_all = (tris[None] + (np.arange(f, dtype=np.int32) * nver
                              )[:, None, None]).reshape(-1, 3)
    h, w = 720, 1088
    ry, rx = (DEFAULT_REPLICATION if args.repl is None
              else tuple(int(x) for x in args.repl.split(",")))
    rng = np.random.default_rng(0)
    offs = rng.uniform([60, 60], [w - 360, h - 360], (f, 2))
    verts = np.stack([
        mean_face * 2.5 + np.asarray([ox, oy, 0], np.float32)
        for ox, oy in offs]).astype(np.float32)          # (F, N, 3)
    rings = jnp.asarray(one_ring_table(tris, nver))
    tj_face = jnp.asarray(tris)
    tj_all = jnp.asarray(tris_all)
    vj = jnp.asarray(verts)
    frame = jnp.zeros((h, w, 3), jnp.uint8)
    interpret = jax.default_backend() != "tpu"

    def slope_ms(loop_fn, *arrays):
        """loop_fn(n, seed, *arrays) -> scalar; arrays are jit args, not
        consts. ``seed`` varies per outer call so repeated timings are
        distinct dispatches (the tunnel memoizes identical ones)."""
        def with_seed(n, seed, *arr):
            return loop_fn(n, *arr) + seed * 1e-12
        jloop = jax.jit(with_seed)
        t0 = time.perf_counter()
        float(jloop(2, jnp.float32(0.0), *arrays))        # compile + warm
        print(f"#   compile+warm {time.perf_counter() - t0:.1f}s",
              flush=True)

        ctr = [0]

        def run(n):
            ctr[0] += 1
            s = jnp.float32(ctr[0])
            t0 = time.perf_counter()
            float(jloop(n, s, *arrays))
            return time.perf_counter() - t0

        t_small = min(run(args.small) for _ in range(3))
        t_large = min(run(args.large) for _ in range(3))
        return (t_large - t_small) / (args.large - args.small) * 1000.0

    results = {}
    want = set(args.stages.split(","))

    if "full" in want:
        def loop_full(n, frame, vj, tj_face, tj_all, rings):
            def body(i, acc):
                ov, _ = render_lit_faces(
                    frame, vj + i.astype(jnp.float32) * 1e-6,
                    jnp.ones((f,), bool), tj_face, tj_all, rings,
                    interpret=interpret)
                return acc + ov[99, 99, 0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["full"] = round(slope_ms(loop_full, frame, vj, tj_face,
                                         tj_all, rings), 2)
        print("# full", results["full"], flush=True)

    flat = vj.reshape(-1, 3)
    colors = jnp.full((f * nver, 3), 0.5, jnp.float32)

    prep_faces = f if args.per_face else 1

    if "raster" in want:
        def loop_raster(n, flat, tj_all, colors):
            def body(i, acc):
                zb, col = rt.rasterize_buffers_tiled(
                    flat + i.astype(jnp.float32) * 1e-6, tj_all, colors,
                    h=h, w=w, ry=ry, rx=rx, interpret=interpret,
                    deferred=deferred, faces=prep_faces)
                return acc + zb[99, 99] + col[500, 500, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["raster"] = round(slope_ms(loop_raster, flat, tj_all,
                                           colors), 2)
        print("# raster", results["raster"], flush=True)

    if "prep" in want:
        def loop_prep(n, flat, tj_all, colors):
            def body(i, acc):
                rec = rt._plane_setup(flat + i.astype(jnp.float32) * 1e-6,
                                      tj_all, [colors[:, 0], colors[:, 1],
                                               colors[:, 2]])
                if prep_faces > 1:
                    c2b, cc, s0, rs = rt._prepare_faces(
                        rec, tj_all.shape[0], prep_faces,
                        h=h, w=w, ry=ry, rx=rx)
                else:
                    c2b, cc, s0, rs = rt._prepare(rec, flat, tj_all,
                                                  h=h, w=w, ry=ry, rx=rx)
                return (acc + cc.sum().astype(jnp.float32)
                        + rs[123, 7] + s0[50].astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["prep"] = round(slope_ms(loop_prep, flat, tj_all, colors), 2)
        print("# prep", results["prep"], flush=True)

    if "setup" in want:
        def loop_setup(n, flat, tj_all, colors):
            def body(i, acc):
                rec = rt._plane_setup(flat + i.astype(jnp.float32) * 1e-6,
                                      tj_all, [colors[:, 0], colors[:, 1],
                                               colors[:, 2]])
                return acc + rec[1234, 7] + rec[99, 25]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["setup"] = round(slope_ms(loop_setup, flat, tj_all,
                                          colors), 2)
        print("# setup", results["setup"], flush=True)

    # prep sub-stages on a fixed record array (binpack+sort / starts / maps
    # / gather) — mirrors _prepare's internals to localize its cost.
    if {"binsort", "starts", "gather"} & want:
        rec_fix = jax.jit(rt._plane_setup)(flat, tj_all,
                                           [colors[:, 0], colors[:, 1],
                                            colors[:, 2]])
        t = tj_all.shape[0]
        nby, nbx = -(-h // rt.TH), -(-w // rt.TW)
        nbins = nby * nbx
        tri_bits = max(1, int(t - 1).bit_length())

        def binpack_sort(rec):
            # The PRODUCTION binning (raster_tiled._clamp_and_bins) + the
            # same packed-key construction as _bin_maps — measured, not
            # re-implemented, so kernel-side changes stay profiled.
            _, bins = rt._clamp_and_bins(rec, h=h, w=w, ry=ry, rx=rx,
                                         bbox0=rt._BBOX0)
            tri_of_copy = (jnp.arange(t * ry * rx, dtype=jnp.int32)
                           // jnp.int32(ry * rx))
            return jax.lax.sort((bins << tri_bits) | tri_of_copy)

        if "binsort" in want:
            def loop_binsort(n, rec):
                def body(i, acc):
                    pk = binpack_sort(rec + i.astype(jnp.float32) * 1e-9)
                    return acc + pk[12345].astype(jnp.float32)
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            results["binsort"] = round(slope_ms(loop_binsort, rec_fix), 2)
            print("# binsort", results["binsort"], flush=True)

        packed_fix = jax.jit(binpack_sort)(rec_fix)

        if "starts" in want:
            queries = jnp.arange(nbins + 1) << tri_bits

            def loop_starts(n, packed, queries):
                def body(i, acc):
                    # xor of the low bit defeats loop-invariant hoisting
                    # without changing the work (cost identical; tiny tie
                    # inversions are irrelevant for timing)
                    s = jnp.searchsorted(packed ^ (i & 1), queries,
                                         method="compare_all")
                    return acc + s[100].astype(jnp.float32) + \
                        s[700].astype(jnp.float32) * 1e-3
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            results["starts"] = round(slope_ms(loop_starts, packed_fix,
                                               queries), 2)
            print("# starts", results["starts"], flush=True)

        if "gather" in want:
            order_fix = packed_fix & ((1 << tri_bits) - 1)

            def loop_gather(n, rec, order):
                def body(i, acc):
                    rs = jnp.pad(rec[order ^ (i & 1)],   # defeat hoisting
                                 ((0, rt.CHUNK), (0, 128 - rt.REC_W)))
                    return acc + rs[123, 7] + rs[9999, 3]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            results["gather"] = round(slope_ms(loop_gather, rec_fix,
                                               order_fix), 2)
            print("# gather", results["gather"], flush=True)

    # _prepare_faces sub-stages (the engine path at faces>1): per-face
    # packed sort, per-face segment starts, per-face static-slice gathers,
    # chunk maps. Mirrors raster_tiled._prepare_faces piece by piece.
    if {"psort", "pstarts", "pgather", "pmaps"} & want and f > 1:
        rec_fix = jax.jit(rt._plane_setup)(flat, tj_all,
                                           [colors[:, 0], colors[:, 1],
                                            colors[:, 2]])
        t = tj_all.shape[0]
        t1 = t // f
        rcount = ry * rx
        n1 = t1 * rcount
        nby, nbx = -(-h // rt.TH), -(-w // rt.TW)
        nbins = nby * nbx
        tri_bits = max(1, int(t1 - 1).bit_length())
        tri_of_copy = (jnp.arange(n1, dtype=jnp.int32)
                       // jnp.int32(rcount))

        def pf_sort(rec):
            _, bins = rt._clamp_and_bins(rec, h=h, w=w, ry=ry, rx=rx,
                                         bbox0=rt._BBOX0)
            bins2 = bins.reshape(f, n1)
            return jax.lax.sort((bins2 << tri_bits) | tri_of_copy[None, :],
                                dimension=1)

        if "psort" in want:
            def loop_psort(n, rec):
                def body(i, acc):
                    pk = pf_sort(rec + i.astype(jnp.float32) * 1e-9)
                    return acc + pk[3, 12345].astype(jnp.float32)
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            results["psort"] = round(slope_ms(loop_psort, rec_fix), 2)
            print("# psort", results["psort"], flush=True)

        packed_fix = jax.jit(pf_sort)(rec_fix)
        seg_queries = (jnp.arange(nbins + 1, dtype=jnp.int32) << tri_bits)

        if "pstarts" in want:
            def loop_pstarts(n, packed):
                def body(i, acc):
                    s = jax.vmap(lambda k: jnp.searchsorted(
                        k, seg_queries, method="compare_all"))(
                            packed ^ (i & 1))
                    return acc + s[3, 100].astype(jnp.float32)
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            results["pstarts"] = round(slope_ms(loop_pstarts, packed_fix),
                                       2)
            print("# pstarts", results["pstarts"], flush=True)

        if "pgather" in want:
            order_fix = packed_fix & ((1 << tri_bits) - 1)    # (F, n1)

            def loop_pgather(n, rec, order):
                def body(i, acc):
                    o = order ^ (i & 1)
                    parts = [jax.lax.slice(
                        rec, (k * t1, 0), ((k + 1) * t1, rt.REC_W)
                    )[o[k]] for k in range(f)]
                    rs = jnp.pad(jnp.concatenate(parts, axis=0),
                                 ((0, rt.CHUNK), (0, 128 - rt.REC_W)))
                    return acc + rs[123, 7] + rs[9999, 3]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            results["pgather"] = round(
                slope_ms(loop_pgather, rec_fix, order_fix), 2)
            print("# pgather", results["pgather"], flush=True)

        if "pmaps" in want:
            starts_fix = jax.vmap(lambda k: jnp.searchsorted(
                k, seg_queries, method="compare_all"))(
                    packed_fix).astype(jnp.int32)

            def loop_pmaps(n, starts):
                def body(i, acc):
                    st = starts + (i & 1)
                    counts = st[:, 1:] - st[:, :-1]
                    counts_bf = counts.T.reshape(-1)
                    nchunks = -(-counts_bf // rt.CHUNK)
                    sidx = jnp.arange(nbins * f, dtype=jnp.int32)
                    nchunks = jnp.where((sidx % f == 0) & (nchunks == 0),
                                        1, nchunks)
                    chunk_start = jnp.concatenate(
                        [jnp.zeros(1, jnp.int32),
                         jnp.cumsum(nchunks).astype(jnp.int32)])
                    total_chunks_max = t * rcount // rt.CHUNK + nbins * f + 1
                    cd = jnp.arange(total_chunks_max, dtype=jnp.int32)
                    c2s = jnp.clip(jnp.searchsorted(
                        chunk_start, cd, side="right",
                        method="compare_all") - 1,
                        0, nbins * f - 1).astype(jnp.int32)
                    in_use = cd < chunk_start[-1]
                    ccount = jnp.where(
                        in_use,
                        jnp.clip(counts_bf[c2s]
                                 - (cd - chunk_start[c2s]) * rt.CHUNK,
                                 0, rt.CHUNK), 0).astype(jnp.int32)
                    c2b = jnp.where(in_use, c2s // f, nbins - 1)
                    segf = c2s % f
                    segb = c2s // f
                    seg_start = st.reshape(-1)[segf * (nbins + 1) + segb]
                    src0 = jnp.clip(
                        segf * n1 + seg_start
                        + (cd - chunk_start[c2s]) * rt.CHUNK,
                        0, t * rcount)
                    return (acc + ccount.sum().astype(jnp.float32)
                            + src0[50].astype(jnp.float32)
                            + c2b[17].astype(jnp.float32))
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            results["pmaps"] = round(slope_ms(loop_pmaps, starts_fix), 2)
            print("# pmaps", results["pmaps"], flush=True)

    # Prefix timing: cumulative prefixes of the per-face prep chain, every
    # large intermediate consumed by a FULL sum (the pointwise-consumption
    # stages above can be DCE'd to near-zero — a gather whose output is
    # read at 2 elements legally collapses). Stage cost = difference of
    # consecutive prefixes; the sum passes are shared so they cancel.
    if "prefix" in want and f > 1:
        t = tj_all.shape[0]
        t1 = t // f
        rcount = ry * rx
        n1 = t1 * rcount
        nby, nbx = -(-h // rt.TH), -(-w // rt.TW)
        nbins = nby * nbx
        tri_bits = max(1, int(t1 - 1).bit_length())
        tri_of_copy8 = (jnp.arange(n1, dtype=jnp.int32)
                        // jnp.int32(rcount))
        seg_queries = (jnp.arange(nbins + 1, dtype=jnp.int32) << tri_bits)

        def chain(flat_v, colors, depth):
            out = jnp.float32(0.0)
            rec = rt._plane_setup(flat_v, tj_all,
                                  [colors[:, 0], colors[:, 1],
                                   colors[:, 2]])
            if depth == 1:
                return out + rec.sum()
            rec, bins = rt._clamp_and_bins(rec, h=h, w=w, ry=ry, rx=rx,
                                           bbox0=rt._BBOX0)
            bins2 = bins.reshape(f, n1)
            packed = jax.lax.sort(
                (bins2 << tri_bits) | tri_of_copy8[None, :], dimension=1)
            if depth == 2:
                return out + rec.sum() + packed.sum().astype(jnp.float32)
            order_tri = packed & ((1 << tri_bits) - 1)
            starts = jax.vmap(lambda k: jnp.searchsorted(
                k, seg_queries, method="compare_all"))(
                    packed).astype(jnp.int32)
            if depth == 3:
                return (out + rec.sum() + order_tri.sum().astype(jnp.float32)
                        + starts.sum().astype(jnp.float32))
            parts = [jax.lax.slice(
                rec, (k * t1, 0), ((k + 1) * t1, rt.REC_W)
            )[order_tri[k]] for k in range(f)]
            rec_sorted = jnp.pad(jnp.concatenate(parts, axis=0),
                                 ((0, rt.CHUNK), (0, 128 - rt.REC_W)))
            if depth == 4:
                return (out + rec_sorted.sum()
                        + starts.sum().astype(jnp.float32))
            counts = starts[:, 1:] - starts[:, :-1]
            counts_bf = counts.T.reshape(-1)
            nchunks = -(-counts_bf // rt.CHUNK)
            sidx = jnp.arange(nbins * f, dtype=jnp.int32)
            nchunks = jnp.where((sidx % f == 0) & (nchunks == 0), 1,
                                nchunks)
            chunk_start = jnp.concatenate(
                [jnp.zeros(1, jnp.int32),
                 jnp.cumsum(nchunks).astype(jnp.int32)])
            total_chunks_max = t * rcount // rt.CHUNK + nbins * f + 1
            cd = jnp.arange(total_chunks_max, dtype=jnp.int32)
            c2s = jnp.clip(jnp.searchsorted(chunk_start, cd, side="right",
                                            method="compare_all") - 1,
                           0, nbins * f - 1).astype(jnp.int32)
            in_use = cd < chunk_start[-1]
            ccount = jnp.where(
                in_use,
                jnp.clip(counts_bf[c2s] - (cd - chunk_start[c2s]) * rt.CHUNK,
                         0, rt.CHUNK), 0).astype(jnp.int32)
            c2b = jnp.where(in_use, c2s // f, nbins - 1).astype(jnp.int32)
            segf = c2s % f
            segb = c2s // f
            seg_start = starts.reshape(-1)[segf * (nbins + 1) + segb]
            src0 = jnp.clip(
                segf * n1 + seg_start + (cd - chunk_start[c2s]) * rt.CHUNK,
                0, t * rcount).astype(jnp.int32)
            if depth == 5:
                return (out + rec_sorted.sum()
                        + ccount.sum().astype(jnp.float32)
                        + src0.sum().astype(jnp.float32)
                        + c2b.sum().astype(jnp.float32))
            zb, pays = rt._launch(c2b, ccount, src0, rec_sorted,
                                  h=h, w=w, n_payload=3,
                                  interpret=interpret)
            return out + zb.sum() + pays.sum()

        names = ["setup", "sort", "starts", "gather", "maps", "kernel"]
        prev = None
        for depth in range(1, 7):
            def loop_pref(n, flat_v, colors, depth=depth):
                def body(i, acc):
                    return acc + chain(
                        flat_v + i.astype(jnp.float32) * 1e-6, colors,
                        depth)
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            ms = slope_ms(loop_pref, flat, colors)
            results[f"prefix{depth}"] = round(ms, 2)
            delta = ms - prev if prev is not None else ms
            print(f"# prefix{depth} ({names[depth - 1]}) {ms:.2f}"
                  f"  [+{delta:.2f}]", flush=True)
            prev = ms

    if "sort" in want:
        t_r = tris_all.shape[0] * ry * rx
        keys = jnp.asarray(rng.integers(0, 2**30, t_r, dtype=np.int32))

        def loop_sort(n, keys):
            def body(i, acc):
                s = lax.sort(keys ^ i)
                return acc + s[12345].astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["sort"] = round(slope_ms(loop_sort, keys), 2)
        print("# sort", results["sort"], flush=True)

    if "kernel" in want:
        rec0 = jax.jit(rt._plane_setup)(flat, tj_all,
                                        [colors[:, 0], colors[:, 1],
                                         colors[:, 2]])
        prep = jax.jit(lambda r, fl, tj: rt._prepare(
            r, fl, tj, h=h, w=w, ry=ry, rx=rx))(rec0, flat, tj_all)
        c2b, cc, s0, rs = [jnp.asarray(x) for x in prep]

        def loop_kernel(n, c2b, cc, s0, rs):
            def body(i, acc):
                zb, pays = rt._launch(c2b, cc, s0,
                                      rs + i.astype(jnp.float32) * 1e-9,
                                      h=h, w=w, n_payload=3,
                                      interpret=interpret)
                return acc + zb[99, 99] + pays[0, 500, 500]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["kernel"] = round(slope_ms(loop_kernel, c2b, cc, s0, rs), 2)
        print("# kernel", results["kernel"], flush=True)

    if "light" in want:
        from synergynet_tpu.render.lighting import (OVERLAY_LIGHT_CFG,
                                                    compute_vertex_light)
        from synergynet_tpu.render.normals import get_normal_rings

        def loop_light(n, vj, tj_face, rings):
            def body(i, acc):
                v = vj + i.astype(jnp.float32) * 1e-6
                nrm = jax.vmap(
                    lambda vv: get_normal_rings(vv, tj_face, rings))(v)
                lit = jax.vmap(lambda vv, nn: compute_vertex_light(
                    vv, nn, **OVERLAY_LIGHT_CFG))(v, nrm)
                return acc + lit[0, 99, 0] + nrm[-1, 5000, 1]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["light"] = round(slope_ms(loop_light, vj, tj_face, rings), 2)
        print("# light", results["light"], flush=True)

    print(json.dumps({"faces": f, "canvas": [h, w], "deferred": deferred,
                      "per_face": bool(args.per_face),
                      "replication": [ry, rx], "ms": results}))


if __name__ == "__main__":
    main()
