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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 3000.0   # reference README.md:31 (RTX 2080, alignment only)
FACES_PER_FRAME = 8
N_SMALL, N_LARGE = 10, 50


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

    detector = FaceBoxes(dtype=jnp.bfloat16)
    api = SynergyNet3DMM(dtype=jnp.bfloat16, detector=detector)
    engine = FusedFrameEngine(api, detector=detector,
                              max_faces=FACES_PER_FRAME)
    program = engine._program
    ch, cw = CANVAS

    @jax.jit
    def bench_loop(variables, det_vars, pack, basis_w, basis_u, anchors,
                   frame, frame_s2d, true_hw, n_iters):
        def body(i, acc):
            c = i.astype(jnp.float32) * 1e-3              # defeat memoization
            outs = program(variables, det_vars, pack, basis_w, basis_u,
                           anchors, frame + c, frame_s2d + c, true_hw)
            scores, n_faces, rois, p62, lmk, dense, angles, t3d = outs
            return (acc + jnp.sum(lmk * lmk) * 1e-6
                    + jnp.sum(dense * dense) * 1e-9
                    + jnp.sum(angles) + jnp.sum(t3d)
                    + jnp.sum(scores) + n_faces.astype(jnp.float32))
        return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    frame_np = rng.integers(0, 255, (ch, cw, 3)).astype(np.float32)
    frame = jnp.asarray(frame_np)
    frame_s2d = jnp.asarray(np.ascontiguousarray(space_to_depth(frame_np)))
    true_hw = jnp.asarray([ch, cw], jnp.int32)
    args = (api.variables, detector.variables, *engine.pack_args,
            frame, frame_s2d, true_hw)

    float(bench_loop(*args, 2))                           # compile + warmup

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
    print(json.dumps({
        "metric": "faces/sec/chip end-to-end (detect + crop + regress + "
                  "68-lmk + dense-mesh + pose, 8 faces/frame @720x1088)",
        "value": round(fps, 1),
        "unit": "faces/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "extra": {"fps_min": round(fps_all[0], 1),
                  "fps_max": round(fps_all[-1], 1),
                  "n_slope_estimates": len(fps_all)},
    }))


if __name__ == "__main__":
    main()
