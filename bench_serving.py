"""Multi-stream serving benchmark (VERDICT round-1 item 6).

Measures the vmapped multi-frame serving path —
``FusedFrameEngine.process_batch`` (pipeline/api.py): B full 720x1088
frames -> detect -> crop -> regress -> 68-lmk + dense mesh + pose for
8 faces each, in ONE dispatch — at B = 1/4/8, against the single-frame
fused program. Timing is bench.py's on-device fori_loop slope.

Prints one JSON line per batch size plus a headline line
(faces/sec at the best B, vs the reference's 3000 fps RTX 2080 claim for
the alignment stage alone, reference README.md:31).
"""

import json
import time

import numpy as np

BASELINE_FPS = 3000.0
FACES_PER_FRAME = 8
N_SMALL, N_LARGE = 5, 25


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8,16,32,64,128",
                    help="comma list of frame-batch sizes to sweep "
                         "(each is a fresh program compile over the "
                         "tunnel — trim for quick re-measurements)")
    args = ap.parse_args()
    batches = tuple(int(x) for x in args.batches.split(","))

    import jax
    import jax.numpy as jnp
    from jax import lax
    from synergynet_tpu.core import enable_compile_cache
    enable_compile_cache()
    from synergynet_tpu.detect import FaceBoxes
    from synergynet_tpu.detect.detector import CANVAS
    from synergynet_tpu.detect.net import space_to_depth
    from synergynet_tpu.pipeline import FusedFrameEngine, SynergyNet3DMM

    detector = FaceBoxes(dtype=jnp.bfloat16)
    api = SynergyNet3DMM(dtype=jnp.bfloat16, detector=detector)
    engine = FusedFrameEngine(api, detector=detector,
                              max_faces=FACES_PER_FRAME)
    ch, cw = CANVAS
    rng = np.random.default_rng(0)

    results = {}
    best = (0.0, None)
    # Round 2's sweep capped at B=8: the program then inlined the 25 MB
    # 3DMM basis as HLO literals and B=16 blew the remote-compile
    # request-size limit (HTTP 413). The constants now ride as jit
    # arguments (pipeline/api.py pack_args), so the program is ~KBs and
    # the sweep extends until compute stops scaling.
    for b in batches:
        frames = rng.integers(0, 255, (b, ch, cw, 3)).astype(np.float32)
        s2d = np.stack([np.ascontiguousarray(
            space_to_depth(f, detector.stem_r)) for f in frames])
        hw = np.tile([[ch, cw]], (b, 1)).astype(np.int32)
        fj, sj, hj = jnp.asarray(frames), jnp.asarray(s2d), jnp.asarray(hw)

        if b == 1:
            prog = engine._program
            fargs = (fj[0], sj[0], hj[0])
        else:
            if engine._batch_program is None:
                from synergynet_tpu.pipeline.api import _fused_batch_program
                engine._batch_program = _fused_batch_program(engine)
            prog = engine._batch_program
            fargs = (fj, sj, hj)

        @jax.jit
        def loop(n, variables, det_vars, pack, bw, bu, anchors, f, s, hwv,
                 prog=prog):
            def body(i, acc):
                c = i.astype(jnp.float32) * 1e-3
                outs = prog(variables, det_vars, pack, bw, bu, anchors,
                            f + c, s + c, hwv)
                scores, n_faces, rois, p62, lmk, dense, angles, t3d = outs
                return (acc + jnp.sum(lmk * lmk) * 1e-6
                        + jnp.sum(dense * dense) * 1e-9 + jnp.sum(angles))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        largs = (api.variables, detector.variables, *engine.pack_args,
                 *fargs)
        try:
            float(loop(2, *largs))
        except Exception as e:                     # record a real ceiling
            print(json.dumps({"batch_frames": b,
                              "error": type(e).__name__}), flush=True)
            break

        def run(n):
            t0 = time.perf_counter()
            float(loop(n, *largs))
            return time.perf_counter() - t0

        per_dispatch = -1.0
        for _attempt in range(3):       # tunnel noise can invert the slope
            t_small = min(run(N_SMALL) for _ in range(3))
            t_large = min(run(N_LARGE) for _ in range(3))
            per_dispatch = (t_large - t_small) / (N_LARGE - N_SMALL)
            if per_dispatch > 0:
                break
        if per_dispatch <= 0:
            print(json.dumps({"batch_frames": b,
                              "error": "nonpositive slope"}), flush=True)
            continue
        fps = b * FACES_PER_FRAME / per_dispatch
        results[b] = {"ms_per_dispatch": round(per_dispatch * 1000, 2),
                      "faces_per_sec": round(fps, 0)}
        print(json.dumps({"batch_frames": b, **results[b]}), flush=True)
        if fps > best[0]:
            best = (fps, b)

    # MFU at the best configuration from XLA's own cost model of the
    # single-frame program (flops per frame; v5e bf16 peak 197 TFLOP/s).
    extra = {"sweep": results}
    try:
        lowered = engine._program.lower(
            api.variables, detector.variables, *engine.pack_args,
            jnp.zeros((ch, cw, 3), jnp.float32),
            jnp.zeros((ch // 4, cw // 4, 48), jnp.float32),
            jnp.zeros((2,), jnp.int32))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_frame = float(cost.get("flops", 0.0))
        frames_per_sec = best[0] / FACES_PER_FRAME
        extra["flops_per_frame"] = flops_frame
        extra["mfu_bf16_pct"] = round(
            100.0 * flops_frame * frames_per_sec / 197e12, 3)
    except Exception as e:
        extra["mfu_error"] = type(e).__name__
    print(json.dumps({
        "metric": f"multi-stream faces/sec/chip (B={best[1]} frames x "
                  f"{FACES_PER_FRAME} faces, fused detect+regress+decode)",
        "value": round(best[0], 1),
        "unit": "faces/sec",
        "vs_baseline": round(best[0] / BASELINE_FPS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
