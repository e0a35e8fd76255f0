"""Renderer benchmark: tiled Pallas rasterizer on the real TPU chip.

Times the full overlay-render hot path (vertex normals -> Phong lighting ->
tile-binned Pallas z-buffer rasterize, one jitted program) on the actual
BFM mesh (53,215 vertices / 105,840 triangles — the per-face render scale
of reference Sim3DR/tests/test.cpp:116-117) at two canvases:

- 480x640 with a ~260-px face (the reference demo's typical overlay), and
- 720x1088 with a ~420-px face (the detector canvas scale).

Baseline: the reference's complete overlay chain measured on this
machine's host CPU at the same scale (docs/RENDERER.md has the harness):
C++ ``_get_normal`` 3.3 ms + numpy Phong lighting 53.1 ms (the code
between the two Cython calls, Sim3DR/lighting.py:37-63) + C++
``_rasterize`` 9.7-20.7 ms (-O3 -march=native; best observed used) =
66.1 ms/frame. The rasterize kernel alone (9.67 ms best-case) is also
recorded in "extra" since it is the only native part. The round-1 XLA
segment-reduce resolve measured ~36 ms for the rasterize stage alone.

Timing methodology is bench.py's: the measured loop runs ON DEVICE
(lax.fori_loop, per-iteration vertex perturbation), outputs reduce to a
scalar whose host fetch forces completion, and per-frame time is the slope
between two trip counts (the tunnel memoizes identical dispatches and
resolves block_until_ready early, so naive timing lies).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference C++ ms / our ms (>1 means faster than the C++).
"""

import json
import time

import numpy as np

REFERENCE_RASTER_MS_480 = 9.67   # scalar _rasterize, this machine, -O3
REFERENCE_CHAIN_MS_480 = 66.05   # _get_normal + numpy Phong + _rasterize
N_SMALL, N_LARGE = 4, 20


def _measure(render_ms_fn, n_small=N_SMALL, n_large=N_LARGE):
    t_small = min(render_ms_fn(n_small) for _ in range(3))
    t_large = min(render_ms_fn(n_large) for _ in range(3))
    return (t_large - t_small) / (n_large - n_small) * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from synergynet_tpu.core import enable_compile_cache
    enable_compile_cache()
    from synergynet_tpu.mm3d import decode_dense, load_param_pack
    from synergynet_tpu.render import RenderPipeline, OVERLAY_LIGHT_CFG
    from synergynet_tpu.render.raster_tiled import replication_for

    pack = load_param_pack()
    mean_face = np.asarray(
        decode_dense(jnp.zeros((1, 62), jnp.float32), pack))[0].T  # (N, 3)
    tris = np.ascontiguousarray(np.asarray(pack.tri).T).astype(np.int32)
    tj = jnp.asarray(tris)
    pipe = RenderPipeline(**OVERLAY_LIGHT_CFG)

    results = {}
    for label, (h, w, scale, off) in {
        "480x640": (480, 640, 2.2, (180.0, 80.0, 0.0)),
        "720x1088": (720, 1088, 3.5, (350.0, 120.0, 0.0)),
    }.items():
        verts = (mean_face * scale + np.asarray(off, np.float32)
                 ).astype(np.float32)
        ry, rx = replication_for(verts, tris)
        vj = jnp.asarray(verts)
        bg = jnp.zeros((h, w, 3), jnp.uint8)

        if label == "480x640" and jax.default_backend() == "tpu":
            # On-chip correctness gate before any timing (round-2 VERDICT
            # weak item 6): all tiled-kernel parity tests run in Pallas
            # interpreter mode on CPU; assert the compiled Mosaic lowering
            # against the independent fragment-window path where it
            # actually executes.
            from synergynet_tpu.render.raster import (rasterize_buffers,
                                                      window_for)
            from synergynet_tpu.render.raster_tiled import (
                rasterize_buffers_tiled)
            cols = np.tile(np.linspace(0.1, 0.9, verts.shape[0]
                                       )[:, None], (1, 3)).astype(np.float32)
            zt, ct = rasterize_buffers_tiled(
                verts, tris, cols, h=h, w=w, ry=ry, rx=rx, interpret=False)
            wh, ww = window_for(verts, tris)
            zw, cw_ = rasterize_buffers(
                jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(cols),
                h=h, w=w, win_h=wh, win_w=ww)
            # Same contract as tests/test_raster_tiled.py::
            # test_matches_segment_reduce_buffers: the two paths regroup
            # the barycentric arithmetic differently, so knife-edge pixels
            # can flip coverage in the last ulp; everything else must agree.
            zt_, zw_ = np.asarray(zt), np.asarray(zw)
            same = np.isclose(zt_, zw_, atol=1e-3)
            frac = float(same.mean())
            assert frac > 0.999, f"on-chip z parity: only {frac:.5f} agree"
            ok = same & (zt_ > -9e7)
            np.testing.assert_allclose(np.asarray(ct)[ok],
                                       np.asarray(cw_)[ok], atol=1e-3)
            print(f"# on-chip tiled-vs-window parity OK "
                  f"({(1 - frac) * 100:.4f}% knife-edge flips)", flush=True)
        from synergynet_tpu.render.normals import one_ring_table
        rings = one_ring_table(tris, verts.shape[0])
        program = pipe._program(h, w, (ry, rx), textured=False,
                                tiled=jax.default_backend() == "tpu")

        @jax.jit
        def loop(n, vj=vj, bg=bg, program=program, rings=rings):
            def body(i, acc):
                out = program(vj + i.astype(jnp.float32) * 1e-6, tj, bg,
                              None, rings)
                return acc + out[99, 99, 0].astype(jnp.float32) \
                    + out[h // 2, w // 2, 1].astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(2))                                  # compile + warm

        def run(n, loop=loop):
            t0 = time.perf_counter()
            float(loop(n))
            return time.perf_counter() - t0

        results[label] = round(_measure(run), 2)

    ms = results["480x640"]
    print(json.dumps({
        "metric": "lit-overlay render ms/frame @480x640 (53215-vert/"
                  "105840-tri BFM mesh, normals+Phong+tiled-Pallas "
                  "z-buffer; 720x1088 in extra)",
        "value": ms,
        "unit": "ms/frame",
        "vs_baseline": round(REFERENCE_CHAIN_MS_480 / ms, 3),
        "extra": {"ms_720x1088": results["720x1088"],
                  "reference_full_chain_ms_480x640": REFERENCE_CHAIN_MS_480,
                  "reference_cpp_rasterize_only_ms": REFERENCE_RASTER_MS_480},
    }))


if __name__ == "__main__":
    main()
