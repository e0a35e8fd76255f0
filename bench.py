"""Single-chip end-to-end throughput benchmark (driver contract).

Measures faces/sec for the full serving path on one TPU chip — the
BASELINE.json north-star metric (detect + regress + reconstruct):

    720x1088 frame -> FaceBoxes detect (anchor decode, top-k, greedy NMS)
    -> top-8 rois squared -> on-device bilinear crop to 8x120x120
    -> MobileNetV2 SynergyNet -> 62-d 3DMM params
    -> 68-landmark decode + dense 53,215-vertex mesh (Pallas fused decode)
    -> pose angles

Every stage runs in ONE jitted program per frame; the host never touches
pixels between detection and reconstruction. The reference's headline claim
is 3000 fps on a laptop RTX 2080 for the alignment stage alone (reference
README.md:31); the build target is >=5000 faces/sec/chip for the full
pipeline (BASELINE.json).

Timing methodology: the remote-TPU tunnel resolves ``block_until_ready``
before device completion and memoizes repeated identical executions, so
the measured loop runs ON DEVICE (``lax.fori_loop``; each iteration
perturbs the frame so no two are identical) and reduces all outputs to a
scalar checksum whose host fetch forces completion. Per-iteration time is
the slope between two trip counts, cancelling dispatch/fetch overhead.

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
    from synergynet_tpu.detect.anchors import decode_boxes, generate_anchors
    from synergynet_tpu.detect.detector import (BGR_MEAN, CANVAS,
                                                NMS_THRESHOLD, NMS_TOP_K)
    from synergynet_tpu.detect.net import (FaceBoxesNet, space_to_depth,
                                           variables_to_s2d)
    from synergynet_tpu.detect.nms import greedy_nms_mask
    from synergynet_tpu.detect.torch_import import load_faceboxes_variables
    from synergynet_tpu.mm3d import (load_param_pack, decode_landmarks,
                                     pose_from_param)
    from synergynet_tpu.nn import SynergyNet, init_synergy_variables
    from synergynet_tpu.ops import decode_dense_fast
    from synergynet_tpu.pipeline import crop_resize_matmul, square_rois

    pack = load_param_pack()
    model = SynergyNet(arch="mobilenet_v2", dtype=jnp.bfloat16)
    variables = init_synergy_variables(model, jax.random.PRNGKey(0))
    det_net = FaceBoxesNet(dtype=jnp.bfloat16, stem_s2d=True)
    det_vars = variables_to_s2d(load_faceboxes_variables())
    ch, cw = CANVAS
    anchors = jnp.asarray(generate_anchors(ch, cw))

    det_mean = jnp.asarray(np.tile(BGR_MEAN, 16), jnp.float32)

    def detect(frame_s2d):
        """s2d-packed (H/4, W/4, 48) frame -> top FACES_PER_FRAME rois."""
        x = frame_s2d - det_mean
        loc, conf = det_net.apply(det_vars, x[None], train=False)
        scores = jax.nn.softmax(conf[0], axis=-1)[:, 1]
        boxes = decode_boxes(loc[0], anchors) * jnp.asarray(
            [cw, ch, cw, ch], jnp.float32)
        top_scores, idx = lax.top_k(scores, NMS_TOP_K)
        top_boxes = boxes[idx]
        keep = greedy_nms_mask(top_boxes, top_scores > 0.05, NMS_THRESHOLD)
        order = jnp.argsort(~keep, stable=True)[:FACES_PER_FRAME]
        return top_boxes[order]

    def faces_pipeline(frame_f32, frame_s2d):
        rois = square_rois(detect(frame_s2d))
        crops = crop_resize_matmul(frame_f32, rois)      # (F, 120, 120, 3)
        x = (crops - 127.5) / 128.0
        param62, _ = model.apply(variables, x, train=False)
        param62 = param62.astype(jnp.float32)
        lmk = decode_landmarks(param62, pack)
        dense = decode_dense_fast(param62, pack)
        angles, t3d = pose_from_param(param62, pack)
        return lmk, dense, angles, t3d

    @jax.jit
    def bench_loop(frame, frame_s2d, n_iters):
        def body(i, acc):
            c = i.astype(jnp.float32) * 1e-3              # defeat memoization
            lmk, dense, angles, t3d = faces_pipeline(frame + c,
                                                     frame_s2d + c)
            return (acc + jnp.sum(lmk * lmk) * 1e-6
                    + jnp.sum(dense * dense) * 1e-9
                    + jnp.sum(angles) + jnp.sum(t3d))
        return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    frame_np = rng.integers(0, 255, (ch, cw, 3)).astype(np.float32)
    frame = jnp.asarray(frame_np)
    frame_s2d = jnp.asarray(np.ascontiguousarray(space_to_depth(frame_np)))

    float(bench_loop(frame, frame_s2d, 2))                # compile + warmup

    def run(n):
        t0 = time.perf_counter()
        float(bench_loop(frame, frame_s2d, n))            # scalar fetch = sync
        return time.perf_counter() - t0

    t_small = min(run(N_SMALL) for _ in range(3))
    t_large = min(run(N_LARGE) for _ in range(3))
    per_frame = (t_large - t_small) / (N_LARGE - N_SMALL)

    fps = FACES_PER_FRAME / per_frame
    print(json.dumps({
        "metric": "faces/sec/chip end-to-end (detect + crop + regress + "
                  "68-lmk + dense-mesh + pose, 8 faces/frame @720x1088)",
        "value": round(fps, 1),
        "unit": "faces/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
