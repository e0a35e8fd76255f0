"""Single-chip end-to-end throughput benchmark (driver contract).

Measures faces/sec for the public single-program serving path
(:class:`synergynet_tpu.pipeline.FusedFrameEngine`) on one TPU chip — the
BASELINE.json north-star metric (detect + regress + reconstruct):

    720x1088 frame -> FaceBoxes detect (s2d stem, anchor decode, top-k,
    fixpoint greedy NMS) -> top-8 rois squared -> on-device bilinear crop
    -> MobileNetV2 SynergyNet (bf16) -> 62-d 3DMM params -> 68-landmark
    decode + dense 53,215-vertex mesh (Pallas fused decode) + pose, all in
    ONE jitted program per frame.

The reference's headline claim is 3000 fps on a laptop RTX 2080 for the
alignment stage alone (reference README.md:31); the build target is >=5000
faces/sec/chip for the full pipeline (BASELINE.json).

Timing methodology: the remote-TPU tunnel resolves ``block_until_ready``
before device completion and memoizes repeated identical executions, so the
measured loop runs ON DEVICE (``lax.fori_loop``; each iteration perturbs
the frame so no two are identical) and reduces all outputs to a scalar
checksum whose host fetch forces completion. Per-iteration time is the
slope between two trip counts, cancelling dispatch/fetch overhead.

Two configurations are measured — one frame per dispatch and BATCH frames
per dispatch (the vmapped multi-stream program, which the round-3 sweep
showed keeps scaling to B=128) — and the better faces/sec is the headline;
both appear under "extra".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def _note(msg):
    """Progress marker on stderr (stdout stays the one JSON line)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()

BASELINE_FPS = 3000.0   # reference README.md:31 (RTX 2080, alignment only)
FACES_PER_FRAME = 8
# B=1 trip counts: at ~0.55 ms/frame the 10/50 counts of rounds 1-3 put
# the slope span (~22 ms) at the scale of the tunnel's RTT jitter, giving
# a +-8% fps_b1 spread across rounds (VERDICT r3 weak #4). 50/250 spans
# ~110 ms per estimate, so per-fetch jitter divides out ~5x.
N_SMALL, N_LARGE = 50, 250
# Multi-stream serving: B frames per dispatch through the head-vmapped /
# tail-flattened batch program (pipeline/api.py::_fused_batch_program).
# Round-3 sweep (bench_serving.py / BENCH_SERVING.json): throughput keeps
# rising to B=128 (30.7K faces/s vs ~15-18K at B=1; 33.8K after the
# decode-bandwidth fix — docs/SERVING.md), so the headline reports the
# better of the two; both appear in "extra".
BATCH = 128
NB_SMALL, NB_LARGE = 4, 16


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from synergynet_tpu.core import enable_compile_cache
    enable_compile_cache()
    from synergynet_tpu.detect import FaceBoxes
    from synergynet_tpu.detect.detector import CANVAS
    from synergynet_tpu.detect.net import space_to_depth
    from synergynet_tpu.pipeline import FusedFrameEngine, SynergyNet3DMM

    ch, cw = CANVAS
    rng = np.random.default_rng(0)
    frame_np = rng.integers(0, 255, (ch, cw, 3)).astype(np.float32)
    frame = jnp.asarray(frame_np)
    true_hw = jnp.asarray([ch, cw], jnp.int32)

    def build(stem_mode):
        detector = FaceBoxes(dtype=jnp.bfloat16, stem_mode=stem_mode)
        api = SynergyNet3DMM(dtype=jnp.bfloat16, detector=detector)
        engine = FusedFrameEngine(api, detector=detector,
                                  max_faces=FACES_PER_FRAME)
        program = engine._program

        @jax.jit
        def bench_loop(variables, det_vars, pack, basis_w, basis_u,
                       anchors, frame, frame_s2d, true_hw, n_iters):
            def body(i, acc):
                c = i.astype(jnp.float32) * 1e-3          # defeat memoization
                outs = program(variables, det_vars, pack, basis_w, basis_u,
                               anchors, frame + c, frame_s2d + c, true_hw)
                scores, n_faces, rois, p62, lmk, dense, angles, t3d = outs
                return (acc + jnp.sum(lmk * lmk) * 1e-6
                        + jnp.sum(dense * dense) * 1e-9
                        + jnp.sum(angles) + jnp.sum(t3d)
                        + jnp.sum(scores) + n_faces.astype(jnp.float32))
            return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        frame_s2d = jnp.asarray(np.ascontiguousarray(
            space_to_depth(frame_np, detector.stem_r)))
        args = (api.variables, detector.variables, *engine.pack_args,
                frame, frame_s2d, true_hw)
        return detector, api, engine, bench_loop, frame_s2d, args

    # Compile + warmup. One experimental kernel must never zero out the
    # round's headline (VERDICT r4 item 8): pin the proven XLA stem
    # explicitly rather than trusting whatever the library default is —
    # a future default flip cannot change what this bench measures.
    _note("compiling B=1 fused program (stem pinned to XLA)")
    (detector, api, engine, bench_loop, frame_s2d,
     args) = build("xla")
    float(bench_loop(*args, 2))
    _note("B=1 compiled; measuring slopes")

    def run(n):
        t0 = time.perf_counter()
        float(bench_loop(*args, n))                       # scalar fetch = sync
        return time.perf_counter() - t0

    # Five independent slope estimates, interleaved so chip contention
    # spreads across all of them; report the median with the band in
    # "extra" (the shared chip shows large run-to-run variance).
    slopes = []
    for _ in range(5):
        t_small = min(run(N_SMALL) for _ in range(2))
        t_large = min(run(N_LARGE) for _ in range(2))
        slopes.append((t_large - t_small) / (N_LARGE - N_SMALL))
    fps_all = sorted(FACES_PER_FRAME / s for s in slopes)
    fps = fps_all[len(fps_all) // 2]

    # Multi-stream stage: B frames per dispatch through the vmapped fused
    # program. The batch is materialized ON DEVICE from the single
    # uploaded frame (the tunnel uploads at ~37 MB/s; a 1.2 GB f32 batch
    # would cost ~30 s host->device).
    fps_batch, batch_err = 0.0, None
    try:
        from synergynet_tpu.pipeline.api import _fused_batch_program
        bprog = _fused_batch_program(engine)

        @jax.jit
        def make_batch(frame, frame_s2d, true_hw):
            d = jnp.arange(BATCH, dtype=jnp.float32)[:, None, None, None] * 0.1
            return (frame[None] + d, frame_s2d[None] + d,
                    jnp.tile(true_hw[None], (BATCH, 1)))

        fb, sb, hb = make_batch(frame, frame_s2d, true_hw)

        @jax.jit
        def bench_loop_b(variables, det_vars, pack, basis_w, basis_u,
                         anchors, fb, sb, hb, n_iters):
            def body(i, acc):
                c = i.astype(jnp.float32) * 1e-3
                outs = bprog(variables, det_vars, pack, basis_w, basis_u,
                             anchors, fb + c, sb + c, hb)
                scores, n_faces, rois, p62, lmk, dense, angles, t3d = outs
                return (acc + jnp.sum(lmk * lmk) * 1e-6
                        + jnp.sum(dense * dense) * 1e-9
                        + jnp.sum(angles) + jnp.sum(scores))
            return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        bargs = (api.variables, detector.variables, *engine.pack_args,
                 fb, sb, hb)
        _note(f"compiling B={BATCH} batch program")
        float(bench_loop_b(*bargs, 1))                    # compile + warmup
        _note("batch program compiled; measuring slopes")

        def run_b(n):
            t0 = time.perf_counter()
            float(bench_loop_b(*bargs, n))
            return time.perf_counter() - t0

        bslopes = []
        for _ in range(3):
            t_s = min(run_b(NB_SMALL) for _ in range(2))
            t_l = min(run_b(NB_LARGE) for _ in range(2))
            bslopes.append((t_l - t_s) / (NB_LARGE - NB_SMALL))
        fps_b_all = sorted(BATCH * FACES_PER_FRAME / s for s in bslopes)
        fps_batch = fps_b_all[len(fps_b_all) // 2]
    except Exception as e:                                # pragma: no cover
        batch_err = f"{type(e).__name__}: {e}"[:200]

    best = max(fps, fps_batch)
    best_b = 1 if fps >= fps_batch else BATCH
    print(json.dumps({
        "metric": "faces/sec/chip end-to-end (detect + crop + regress + "
                  "68-lmk + dense-mesh + pose, 8 faces/frame @720x1088, "
                  "best dispatch batch)",
        "value": round(best, 1),
        "unit": "faces/sec",
        "vs_baseline": round(best / BASELINE_FPS, 3),
        "extra": {"fps_b1": round(fps, 1),
                  "fps_b1_min": round(fps_all[0], 1),
                  "fps_b1_max": round(fps_all[-1], 1),
                  "fps_b1_spread_pct": round(
                      100.0 * (fps_all[-1] - fps_all[0]) / fps, 1),
                  "note": "residual b1 spread is shared-chip contention",
                  "n_slope_estimates": len(fps_all),
                  "fps_batched": round(fps_batch, 1),
                  "dispatch_batch": best_b,
                  "batch_error": batch_err,
                  "stem_mode": "xla (pinned)"},
    }))


if __name__ == "__main__":
    main()
