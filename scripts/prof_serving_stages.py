"""Per-stage slope profile of the fused serving program (real chip).

Decomposes FusedFrameEngine's program (pipeline/api.py::_build) into its
pipeline stages and slope-times each in isolation at a configurable frame
batch, using bench.py's on-device fori_loop + scalar-fetch methodology
(the tunnel memoizes identical dispatches and resolves block_until_ready
early — see CLAUDE.md):

  detnet    FaceBoxes conv net on the s2d canvas (the full-frame convs)
  detpost   softmax + box decode + top_k + fixpoint NMS + face ordering
  crop      square_rois + crop_resize_matmul (frame -> 8x120x120 crops)
  backbone  MobileNetV2 bf16 on the (B*8, 120, 120, 3) crop batch
  decode    62-param -> 68-lmk + fused dense 53K-vert mesh + pose + roi
            rescale
  full      the whole vmapped batch program (bench_serving.py's number)

Stage times should roughly sum to "full"; the gap is XLA fusion overlap
across stage boundaries. Run while no other TPU process is active.

Usage: python scripts/prof_serving_stages.py --batch 32 [--stages ...]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

FACES = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--large", type=int, default=16)
    ap.add_argument("--stages",
                    default="detnet,detpost,crop,crophyb,backbone,decode,"
                            "full,fullhyb")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    want = set(args.stages.split(","))
    b = args.batch

    import jax
    import jax.numpy as jnp
    from jax import lax
    from synergynet_tpu.core import enable_compile_cache
    enable_compile_cache()
    from synergynet_tpu.detect import FaceBoxes
    from synergynet_tpu.detect.anchors import decode_boxes
    from synergynet_tpu.detect.detector import (BGR_MEAN, CANVAS,
                                                NMS_THRESHOLD, NMS_TOP_K,
                                                VIS_THRESHOLD)
    from synergynet_tpu.detect.net import space_to_depth
    from synergynet_tpu.detect.nms import greedy_nms_mask
    from synergynet_tpu.mm3d.codec import decode_landmarks, rescale_to_roi
    from synergynet_tpu.mm3d.pose import pose_from_param, \
        rescale_pose_to_roi
    from synergynet_tpu.pipeline import FusedFrameEngine, SynergyNet3DMM
    from synergynet_tpu.pipeline.api import _fused_batch_program
    from synergynet_tpu.pipeline.device_crop import (crop_resize_hybrid,
                                                     crop_resize_matmul,
                                                     square_rois)

    detector = FaceBoxes(dtype=jnp.bfloat16)
    api = SynergyNet3DMM(dtype=jnp.bfloat16, detector=detector)
    engine = FusedFrameEngine(api, detector=detector, max_faces=FACES)
    ch, cw = CANVAS
    rng = np.random.default_rng(0)

    frame_np = rng.integers(0, 255, (ch, cw, 3)).astype(np.float32)
    frame = jnp.asarray(frame_np)
    s2d_np = np.ascontiguousarray(space_to_depth(frame_np,
                                                 detector.stem_r))
    true_hw = jnp.asarray([ch, cw], jnp.int32)

    @jax.jit
    def make_batch(frame, s2d):
        d = jnp.arange(b, dtype=jnp.float32)[:, None, None, None] * 0.1
        return (frame[None] + d, s2d[None] + d,
                jnp.tile(true_hw[None], (b, 1)))

    fb, sb, hb = make_batch(frame, jnp.asarray(s2d_np))
    det_mean = jnp.asarray(np.tile(BGR_MEAN, detector.stem_r ** 2),
                           jnp.float32)

    def slope_ms(loop_fn, *arrs):
        def run(n):
            t0 = time.perf_counter()
            float(loop_fn(jnp.int32(n), *arrs))
            return time.perf_counter() - t0

        float(loop_fn(jnp.int32(1), *arrs))            # compile + warm
        best = []
        for _ in range(args.reps):
            ts = min(run(args.small) for _ in range(2))
            tl = min(run(args.large) for _ in range(2))
            best.append((tl - ts) / (args.large - args.small) * 1e3)
        best.sort()
        return best[len(best) // 2]

    results = {}

    if "detnet" in want:
        @jax.jit
        def loop_detnet(n, sb):
            def body(i, acc):
                x = sb + i.astype(jnp.float32) * 1e-3 - det_mean
                loc, conf = jax.vmap(
                    lambda xx: detector.net.apply(
                        detector.variables, xx[None], train=False))(x)
                return acc + jnp.sum(loc) * 1e-6 + jnp.sum(conf) * 1e-6
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["detnet"] = round(slope_ms(loop_detnet, sb), 3)
        print("# detnet", results["detnet"], flush=True)

    # detnet prefix sub-stages: cumulative times; per-segment cost is the
    # delta between consecutive prefixes (stem1 = conv1+pool, stem2 =
    # +conv2+pool, inception = +3 blocks, sources = +conv3/4; heads =
    # detnet - sources). XLA fuses each prefix independently, so deltas
    # are approximate but attribute where detnet's time concentrates.
    for pref in ("conv1", "stem1", "stem2", "inception", "sources"):
        key = f"det{pref}"
        if key not in want:
            continue

        def make_loop(pref):
            @jax.jit
            def loop_pref(n, sb):
                def body(i, acc):
                    x = sb + i.astype(jnp.float32) * 1e-3 - det_mean
                    y = jax.vmap(
                        lambda xx: detector.net.apply(
                            detector.variables, xx[None], train=False,
                            upto=pref))(x)
                    return acc + jnp.sum(y.astype(jnp.float32)) * 1e-6
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            return loop_pref
        results[key] = round(slope_ms(make_loop(pref), sb), 3)
        print(f"# {key}", results[key], flush=True)

    # Precompute loc/conf once for the post stage.
    if "detpost" in want:
        @jax.jit
        def detnet_once(sb):
            x = sb - det_mean
            return jax.vmap(lambda xx: detector.net.apply(
                detector.variables, xx[None], train=False))(x)
        loc_b, conf_b = detnet_once(sb)

        def post_one(loc, conf, anchors, c):
            scores = jax.nn.softmax(conf[0] + c, axis=-1)[:, 1]
            boxes = decode_boxes(loc[0], anchors) * jnp.asarray(
                [cw, ch, cw, ch], jnp.float32)
            ok = scores > 0.05
            scores = jnp.where(ok, scores, -1.0)
            top_scores, idx = jax.lax.top_k(scores, NMS_TOP_K)
            top_boxes = boxes[idx]
            keep = greedy_nms_mask(top_boxes, top_scores > 0.0,
                                   NMS_THRESHOLD)
            keep &= top_scores > VIS_THRESHOLD
            order = jnp.argsort(~keep, stable=True)[:FACES]
            return top_boxes[order], jnp.where(
                keep[order], top_scores[order], -1.0)

        @jax.jit
        def loop_post(n, loc_b, conf_b, anchors):
            def body(i, acc):
                c = i.astype(jnp.float32) * 1e-5
                bx, sc = jax.vmap(
                    lambda l, cf: post_one(l, cf, anchors, c))(loc_b, conf_b)
                return acc + jnp.sum(bx) * 1e-6 + jnp.sum(sc)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["detpost"] = round(
            slope_ms(loop_post, loc_b, conf_b, detector.anchors), 3)
        print("# detpost", results["detpost"], flush=True)

    rois_np = rng.uniform([100, 100, 260, 260], [160, 160, 380, 380],
                          (b, FACES, 4)).astype(np.float32)
    rois_b = jnp.asarray(rois_np)

    if "crop" in want:
        @jax.jit
        def loop_crop(n, fb, rois_b):
            def body(i, acc):
                c = i.astype(jnp.float32) * 1e-3
                crops = jax.vmap(crop_resize_matmul)(fb + c, rois_b)
                return acc + jnp.sum(crops) * 1e-9
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["crop"] = round(slope_ms(loop_crop, fb, rois_b), 3)
        print("# crop", results["crop"], flush=True)

    if "crophyb" in want:
        @jax.jit
        def loop_crop_h(n, fb, rois_b):
            def body(i, acc):
                c = i.astype(jnp.float32) * 1e-3
                crops = jax.vmap(crop_resize_hybrid)(fb + c, rois_b)
                return acc + jnp.sum(crops) * 1e-9
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["crophyb"] = round(slope_ms(loop_crop_h, fb, rois_b), 3)
        print("# crophyb", results["crophyb"], flush=True)

    crops_np = rng.integers(0, 255, (b * FACES, 120, 120, 3)
                            ).astype(np.float32)
    crops_b = jnp.asarray(crops_np)

    if "backbone" in want:
        @jax.jit
        def loop_bb(n, crops_b):
            def body(i, acc):
                xn = (crops_b + i.astype(jnp.float32) * 1e-3 - 127.5) / 128.0
                p62, _ = api.model.apply(api.variables, xn, train=False)
                return acc + jnp.sum(p62.astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["backbone"] = round(slope_ms(loop_bb, crops_b), 3)
        print("# backbone", results["backbone"], flush=True)

    if "decode" in want:
        p62_np = rng.normal(0, 0.4, (b * FACES, 62)).astype(np.float32)
        p62_b = jnp.asarray(p62_np)
        rois_flat = jnp.asarray(rois_np.reshape(b * FACES, 4))
        pack_dev, basis_w, basis_u = api.pack_args

        @jax.jit
        def loop_dec(n, p62_b, rois_flat, pack, basis_w, basis_u):
            def body(i, acc):
                p = p62_b + i.astype(jnp.float32) * 1e-4
                lmk = rescale_to_roi(decode_landmarks(p, pack), rois_flat)
                dense = rescale_to_roi(
                    api._decode_dense_in_program(p, pack, basis_w, basis_u),
                    rois_flat)
                ang, t3d = pose_from_param(p, pack)
                t3d = rescale_pose_to_roi(t3d, rois_flat)
                return (acc + jnp.sum(lmk) * 1e-6 + jnp.sum(dense) * 1e-9
                        + jnp.sum(ang) + jnp.sum(t3d) * 1e-3)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["decode"] = round(
            slope_ms(loop_dec, p62_b, rois_flat, pack_dev, basis_w,
                     basis_u), 3)
        print("# decode", results["decode"], flush=True)

    if "full" in want:
        prog = _fused_batch_program(engine)

        @jax.jit
        def loop_full(n, fb, sb, hb, variables, det_vars, pack, bw, bu,
                      anchors):
            def body(i, acc):
                c = i.astype(jnp.float32) * 1e-3
                outs = prog(variables, det_vars, pack, bw, bu, anchors,
                            fb + c, sb + c, hb)
                scores, n_faces, rois, p62, lmk, dense, angles, t3d = outs
                return (acc + jnp.sum(lmk * lmk) * 1e-6
                        + jnp.sum(dense * dense) * 1e-9 + jnp.sum(angles))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["full"] = round(
            slope_ms(loop_full, fb, sb, hb, api.variables,
                     detector.variables, *engine.pack_args), 3)
        print("# full", results["full"], flush=True)

    if "fullhyb" in want:
        eng_h = FusedFrameEngine(api, detector=detector, max_faces=FACES,
                                 crop_mode="hybrid")
        prog_h = _fused_batch_program(eng_h)

        @jax.jit
        def loop_full_h(n, fb, sb, hb, variables, det_vars, pack, bw, bu,
                        anchors):
            def body(i, acc):
                c = i.astype(jnp.float32) * 1e-3
                outs = prog_h(variables, det_vars, pack, bw, bu, anchors,
                              fb + c, sb + c, hb)
                scores, n_faces, rois, p62, lmk, dense, angles, t3d = outs
                return (acc + jnp.sum(lmk * lmk) * 1e-6
                        + jnp.sum(dense * dense) * 1e-9 + jnp.sum(angles))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        results["fullhyb"] = round(
            slope_ms(loop_full_h, fb, sb, hb, api.variables,
                     detector.variables, *eng_h.pack_args), 3)
        print("# fullhyb", results["fullhyb"], flush=True)

    ms_frame = {k: round(v / b, 4) for k, v in results.items()}
    print(json.dumps({"batch": b, "faces_per_frame": FACES,
                      "ms_per_dispatch": results,
                      "ms_per_frame": ms_frame}))


if __name__ == "__main__":
    main()
