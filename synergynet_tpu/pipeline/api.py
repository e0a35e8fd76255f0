"""Packaged inference API: image -> (landmarks, dense meshes, poses).

The TPU-native equivalent of the reference's pip-packaged
``synergy3DMM.SynergyNet.get_all_outputs`` (reference synergy3DMM.py:
167-207), with the per-face serial CPU loop re-designed as one batched
device program:

reference                               this framework
---------                               --------------
FaceBoxes() rebuilt per call (Q8)       detector constructed once
per-face: crop -> resize -> tensor      host crops all faces, stacks to a
  -> forward -> numpy decode              padded batch bucket
4 decode copies, numpy per face         ONE jitted program: normalize ->
                                          backbone -> 62 params -> 68-lmk +
                                          dense decode + pose + roi rescale
                                          for every face at once

Crop semantics are preserved exactly: square rois from the y-extent with
1.2 margin (synergy3DMM.py:181-185), zero-padded crop
(utils/inference.py:95-125), LANCZOS4 resize to 120x120, (x - 127.5)/128
normalization of BGR pixels. Batch sizes are padded to power-of-two buckets
so only a handful of programs are ever compiled.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synergynet_tpu.mm3d import (
    ParamPack, load_param_pack, decode_landmarks, pose_from_param,
    rescale_to_roi, device_pack,
)
from synergynet_tpu.mm3d.codec import decode_dense
from synergynet_tpu.ops.fused_decode import (decode_dense_fused,
                                             get_decode_basis, DecodeBasis)
from synergynet_tpu.mm3d.crop import square_box, crop_img
from synergynet_tpu.mm3d.pose import rescale_pose_to_roi
from synergynet_tpu.nn import SynergyNet, init_synergy_variables

MAX_FACES_PER_BATCH = 16


def _bucket(n: int, cap: int = MAX_FACES_PER_BATCH) -> int:
    b = 1
    while b < min(n, cap):
        b *= 2
    return b


def preprocess_crops(img_bgr: np.ndarray, roi_boxes: Sequence[np.ndarray],
                     interpolation: str = "lanczos4") -> np.ndarray:
    """Crop + resize every roi to a (N, 120, 120, 3) uint8 stack.

    ``interpolation``: 'lanczos4' (packaged API, synergy3DMM.py:188) or
    'linear' (demo script, singleImage.py:77 — quirk Q7).
    """
    import cv2
    flag = {"lanczos4": cv2.INTER_LANCZOS4,
            "linear": cv2.INTER_LINEAR}[interpolation]
    crops = [cv2.resize(crop_img(img_bgr, rb), dsize=(120, 120),
                        interpolation=flag) for rb in roi_boxes]
    return np.stack(crops).astype(np.uint8)


class SynergyNet3DMM:
    """Construct once; call :meth:`get_all_outputs` per image.

    ``variables`` may come from training, a checkpoint, the string
    ``"trained"`` (loads the shipped full-recipe weights from the
    ``synergynet_tpu/assets/trained/`` package data — the role of the
    reference's released ``pretrained/best.pth.tar``, reference
    synergy3DMM.py:95-104; works for wheel installs too), or (default)
    deterministic random init so the pipeline runs without any checkpoint
    at all.
    """

    def __init__(self, arch: str = "mobilenet_v2",
                 variables: Optional[dict] = None,
                 pack: Optional[ParamPack] = None,
                 detector=None,
                 dtype: jnp.dtype = jnp.float32,
                 seed: int = 0):
        self.pack = pack if pack is not None else load_param_pack()
        self.model = SynergyNet(arch=arch, dtype=dtype)
        if isinstance(variables, str):
            if variables != "trained":
                raise ValueError(f"unknown variables spec {variables!r} "
                                 "(only 'trained' is recognised)")
            from synergynet_tpu.core.checkpoint import load_shipped_trained
            variables = load_shipped_trained(arch)
        elif variables is None:
            variables = init_synergy_variables(
                self.model, jax.random.PRNGKey(seed))
        self.variables = variables
        self._detector = detector
        # The 3DMM constants ride as jit ARGUMENTS, not closures: closing
        # over the numpy pack inlines the 25 MB dense basis into every
        # program as HLO literals (~65 MB of program text — minutes of
        # upload per compile on a remote-compile link, and request-size
        # caps at large batch). See mm3d.assets.device_pack.
        self._use_fused = jax.default_backend() == "tpu"
        if self._use_fused:
            b = get_decode_basis(self.pack)
            self._basis_w, self._basis_u, self._basis_nver = b.w, b.u, b.nver
            # The fused program reads the dense basis ONLY through
            # basis_w/basis_u (the Pallas-tiled relayout above); the pack's
            # own u/w_shp/w_exp leaves would be a duplicate ~50 MB HBM
            # upload (~1.3 s on the 37 MB/s tunnel) held for the engine's
            # life. Ship zero-row placeholders instead — every jitted
            # consumer of the pack (dewhiten, sparse *_base decode, crop
            # rescale) touches other leaves.
            import numpy as _np
            slim = self.pack._replace(
                u=_np.zeros((0, 1), _np.float32),
                w_shp=_np.zeros((0, self.pack.w_shp.shape[1]), _np.float32),
                w_exp=_np.zeros((0, self.pack.w_exp.shape[1]), _np.float32))
            self._pack_dev = device_pack(slim)
        else:   # unused dummy args keep one program signature per backend
            self._pack_dev = device_pack(self.pack)
            self._basis_w = jnp.zeros((3, 128, 50), jnp.float32)
            self._basis_u = jnp.zeros((3, 128), jnp.float32)
            self._basis_nver = 128
        self.pack_args = (self._pack_dev, self._basis_w, self._basis_u)
        self._program = self._build_program()

    @property
    def detector(self):
        if self._detector is None:
            from synergynet_tpu.detect import FaceBoxes
            self._detector = FaceBoxes()
        return self._detector

    def _decode_dense_in_program(self, param62, pack, basis_w, basis_u):
        """Dense decode inside a traced program: Pallas fused kernel on
        TPU, XLA codec elsewhere — basis arrays are traced arguments."""
        if self._use_fused:
            return decode_dense_fused(
                param62, DecodeBasis(basis_w, basis_u, self._basis_nver),
                pack)
        return decode_dense(param62, pack)

    def _build_program(self):
        model = self.model
        decode_dense_in = self._decode_dense_in_program

        @jax.jit
        def program(variables, pack, basis_w, basis_u, crops_u8, roi_boxes):
            """(N,120,120,3) uint8 BGR + (N,4) rois -> all outputs in
            original-image coordinates."""
            x = (crops_u8.astype(jnp.float32) - 127.5) / 128.0
            param62, _ = model.apply(variables, x, train=False)
            param62 = param62.astype(jnp.float32)
            lmk = rescale_to_roi(decode_landmarks(param62, pack), roi_boxes)
            dense = rescale_to_roi(
                decode_dense_in(param62, pack, basis_w, basis_u), roi_boxes)
            angles, t3d = pose_from_param(param62, pack)
            t3d = rescale_pose_to_roi(t3d, roi_boxes)
            return param62, lmk, dense, angles, t3d

        return program

    def process_crops(self, crops_u8: np.ndarray, roi_boxes: np.ndarray):
        """Batched core: returns (param62, lmk, dense, angles, t3d) numpy
        arrays, leading dim = number of faces. Pads to a bucket internally."""
        n = crops_u8.shape[0]
        if n == 0:
            # Keep the 5-tuple-of-arrays contract at zero faces (round-5
            # review: the empty chunk loop used to return []).
            nl = len(self.pack.keypoints) // 3
            nv = self.pack.w_shp.shape[0] // 3
            return (np.zeros((0, 62), np.float32),
                    np.zeros((0, 3, nl), np.float32),
                    np.zeros((0, 3, nv), np.float32),
                    np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.float32))
        b = _bucket(max(n, 1))
        out = []
        for start in range(0, n, b):
            chunk = slice(start, min(start + b, n))
            cc = crops_u8[chunk]
            rr = np.asarray(roi_boxes[chunk], np.float32)[:, :4]
            pad = b - cc.shape[0]
            if pad:
                cc = np.concatenate([cc, np.zeros((pad,) + cc.shape[1:],
                                                  cc.dtype)])
                rr = np.concatenate([rr, np.tile([[0, 0, 120, 120]],
                                                 (pad, 1)).astype(np.float32)])
            keep = b - pad
            res = self._program(self.variables, *self.pack_args,
                                jnp.asarray(cc), jnp.asarray(rr))
            out.append([np.asarray(r)[:keep] for r in res])
        return [np.concatenate(parts) for parts in zip(*out)]

    def get_all_outputs(self, img_bgr: np.ndarray,
                        rects: Optional[Sequence] = None,
                        interpolation: str = "lanczos4"
                        ) -> Tuple[List, List, List]:
        """Reference-compatible: (pts_res, vertices_lst, poses) where each
        element i is ((3,68) landmarks, (3,53215) vertices,
        [angles (3,), t3d (3,)]) for face i, in original-image coordinates."""
        if rects is None:
            rects = self.detector(img_bgr)
        if len(rects) == 0:
            return [], [], []
        roi_boxes = np.stack([square_box(r) for r in rects])
        crops = preprocess_crops(img_bgr, roi_boxes, interpolation)
        _, lmk, dense, angles, t3d = self.process_crops(crops, roi_boxes)
        pts_res = [lmk[i] for i in range(len(rects))]
        vertices_lst = [dense[i] for i in range(len(rects))]
        poses = [[angles[i], t3d[i]] for i in range(len(rects))]
        return pts_res, vertices_lst, poses


class FusedFrameEngine:
    """Single-program serving path: full frame -> faces, never leaving the
    device between stages (the configuration the end-to-end benchmark
    measures): detect (s2d FaceBoxes) -> square rois -> on-device bilinear
    crop (cv2 INTER_LINEAR semantics, quirk Q7's demo-script variant) ->
    regress -> 68-lmk + dense + pose, for a fixed faces-per-frame budget.

    Host work per frame: optional downscale + canvas paste + s2d packing
    (memcpy-class), then one dispatch.

    ``crop_mode`` stays ``"matmul"`` by default: the on-chip A/B
    (scripts/prof_serving_stages.py, B=32) measured the dense interp
    matmul at 2.08 ms vs 12.40 ms for the 6x-fewer-FLOPs "hybrid" row
    gather — the matmul rides the MXU, the gather serializes (full
    numbers in device_crop.crop_resize_hybrid's docstring).
    """

    def __init__(self, api: "SynergyNet3DMM", detector=None,
                 max_faces: int = 8, crop_mode: str = "matmul"):
        from synergynet_tpu.detect import FaceBoxes
        self.api = api
        self.detector = detector or FaceBoxes()
        if not self.detector.stem_s2d:
            raise ValueError("FusedFrameEngine requires an s2d detector")
        if crop_mode not in ("matmul", "hybrid"):
            raise ValueError(f"crop_mode {crop_mode!r}")
        self.crop_mode = crop_mode
        self.max_faces = max_faces
        # jit-argument constants: 3DMM pack + dense basis + anchors (see
        # SynergyNet3DMM — keeping them out of the program shrinks the HLO
        # from ~65 MB of inlined literals to kilobytes).
        self.pack_args = (*api.pack_args, self.detector.anchors)
        self._program = self._build()
        self._batch_program = None

    def process_batch(self, frames_f32, frames_s2d, true_hws):
        """Batched serving: (B, 720, 1088, 3) frames (+ their s2d packing
        and true extents) -> per-frame stacked outputs in one dispatch."""
        if self._batch_program is None:
            self._batch_program = _fused_batch_program(self)
        return self._batch_program(self.api.variables,
                                   self.detector.variables,
                                   *self.pack_args,
                                   frames_f32, frames_s2d, true_hws)

    def _build(self):
        from synergynet_tpu.detect.anchors import decode_boxes
        from synergynet_tpu.detect.detector import (BGR_MEAN, CANVAS,
                                                    CONFIDENCE_THRESHOLD,
                                                    NMS_THRESHOLD, NMS_TOP_K,
                                                    VIS_THRESHOLD)
        from synergynet_tpu.detect.nms import greedy_nms_mask
        from synergynet_tpu.pipeline.device_crop import (crop_resize_hybrid,
                                                         crop_resize_matmul,
                                                         square_rois)
        crop_fn = (crop_resize_hybrid if self.crop_mode == "hybrid"
                   else crop_resize_matmul)
        api, det = self.api, self.detector
        f_max = self.max_faces
        ch, cw = CANVAS
        det_mean = jnp.asarray(np.tile(BGR_MEAN, det.stem_r ** 2),
                               jnp.float32)
        model = api.model
        decode_dense_in = api._decode_dense_in_program

        def head(variables, det_vars, anchors, frame, frame_s2d, true_hw):
            """Detect + crop + regress: frame -> (scores, n, rois, param62).
            Kept separate from the decode tail so the batched program can
            vmap it per frame while running the decode on the flattened
            (B*max_faces) face axis (see _fused_batch_program)."""
            x = frame_s2d - det_mean
            loc, conf = det.net.apply(det_vars, x[None], train=False)
            scores = jax.nn.softmax(conf[0], axis=-1)[:, 1]
            boxes = decode_boxes(loc[0], anchors) * jnp.asarray(
                [cw, ch, cw, ch], jnp.float32)
            th = true_hw[0].astype(jnp.float32)
            tw = true_hw[1].astype(jnp.float32)
            cx = (boxes[:, 0] + boxes[:, 2]) / 2
            cy = (boxes[:, 1] + boxes[:, 3]) / 2
            ok = (cx < tw) & (cy < th) & (scores > CONFIDENCE_THRESHOLD)
            scores = jnp.where(ok, scores, -1.0)
            top_scores, idx = jax.lax.top_k(scores, NMS_TOP_K)
            top_boxes = boxes[idx]
            keep = greedy_nms_mask(top_boxes, top_scores > 0.0,
                                   NMS_THRESHOLD)
            keep &= top_scores > VIS_THRESHOLD
            order = jnp.argsort(~keep, stable=True)[:f_max]
            face_boxes = top_boxes[order]
            face_scores = jnp.where(keep[order], top_scores[order], -1.0)
            n_faces = jnp.sum(face_scores > 0)

            rois = square_rois(face_boxes)
            crops = crop_fn(frame, rois)
            xn = (crops - 127.5) / 128.0
            param62, _ = model.apply(variables, xn, train=False)
            param62 = param62.astype(jnp.float32)
            return face_scores, n_faces, rois, param62

        def tail(param62, rois, pack, basis_w, basis_u):
            """Decode: flat (N, 62) params + (N, 4) rois -> lmk/dense/pose.
            Row-independent, so it computes the same values whether N is
            one frame's faces or a whole batch's flattened face axis."""
            lmk = rescale_to_roi(decode_landmarks(param62, pack), rois)
            dense = rescale_to_roi(
                decode_dense_in(param62, pack, basis_w, basis_u), rois)
            angles, t3d = pose_from_param(param62, pack)
            t3d = rescale_pose_to_roi(t3d, rois)
            return lmk, dense, angles, t3d

        @jax.jit
        def program(variables, det_vars, pack, basis_w, basis_u, anchors,
                    frame, frame_s2d, true_hw):
            face_scores, n_faces, rois, param62 = head(
                variables, det_vars, anchors, frame, frame_s2d, true_hw)
            lmk, dense, angles, t3d = tail(param62, rois, pack,
                                           basis_w, basis_u)
            return (face_scores, n_faces, rois, param62, lmk, dense,
                    angles, t3d)

        self._head_fn, self._tail_fn = head, tail
        return program

    def __call__(self, img_bgr: np.ndarray) -> Tuple[List, List, List]:
        """Reference-format (pts_res, vertices_lst, poses) in original-image
        coordinates."""
        canvas, packed, true_hw, scale = prepare_frame(
            img_bgr, self.detector.stem_r)
        out = self._program(self.api.variables, self.detector.variables,
                            *self.pack_args,
                            jnp.asarray(canvas), jnp.asarray(packed),
                            true_hw)
        scores, n, rois, p62, lmk, dense, angles, t3d = map(np.asarray, out)
        return unpack_face_outputs(int(n), lmk, dense, angles, t3d, scale)


def prepare_frame(img_bgr: np.ndarray, stem_r: int):
    """Fit an arbitrary BGR frame onto the fixed detector canvas.

    Returns (canvas f32 (CH,CW,3), s2d-packed canvas, true_hw int32 (2,),
    scale) — the shared host-side front end of FusedFrameEngine and
    FusedOverlayEngine (kept in ONE place so the fit/pack rules cannot
    diverge between the engines; round-5 review).

    Known optimization, deliberately not taken this round: both tensors
    ship as float32 (~18 MB/frame over the ~37 MB/s tunnel, ~0.5 s); a
    uint8 upload with the f32 cast inside the program would cut that 4x
    (the convention everywhere else — CLAUDE.md). It changes the compiled
    program signature of the flagship serving path, so per the round-4
    lesson it must land WITH an on-chip validation + bench re-warm, not
    as a late edit. The on-device measured loop (bench.py) is unaffected
    either way — this is per-call host latency only."""
    import cv2
    from synergynet_tpu.detect.detector import CANVAS, _fit_scale
    from synergynet_tpu.detect.net import space_to_depth

    h, w = img_bgr.shape[:2]
    scale = _fit_scale(h, w)
    img_s = (cv2.resize(img_bgr, (int(scale * w), int(scale * h)))
             if scale != 1.0 else img_bgr)
    hs, ws = img_s.shape[:2]
    ch, cw = CANVAS
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:min(hs, ch), :min(ws, cw)] = img_s[:ch, :cw]
    packed = np.ascontiguousarray(space_to_depth(canvas, stem_r))
    return canvas, packed, jnp.asarray([hs, ws], jnp.int32), scale


def unpack_face_outputs(n: int, lmk, dense, angles, t3d, scale: float):
    """Canvas -> original coordinates for the first ``n`` fused-program
    faces: x, y by 1/scale; z too — the decode scaled z by the roi extent
    measured in canvas pixels, and the reference's z scale is measured in
    original pixels (utils/inference.py:136). t3d z stays unscaled like
    the reference's predict_pose (utils/inference.py:151-153)."""
    inv = 1.0 / scale
    pts, verts, poses = [], [], []
    for i in range(n):
        pts.append(lmk[i] * inv)
        verts.append(dense[i] * inv)
        t = t3d[i].copy()
        t[:2] *= inv
        poses.append([angles[i], t])
    return pts, verts, poses


def _fused_batch_program(engine: "FusedFrameEngine"):
    """Multi-stream serving program: B frames x max_faces in one dispatch.

    The detect+crop+regress head vmaps over the frame axis, but the decode
    tail runs ONCE on the flattened (B*max_faces) face axis: under a
    vmapped tail the Pallas dense-decode kernel sees 8 rows per frame and
    re-streams the full (3, Npad, 50) basis from HBM for every frame
    (~4 GB of pure re-read traffic per B=128 dispatch, measured ~16% of
    the program); flat, the kernel auto-sizes its batch tile
    (ops/fused_decode._auto_batch_tile) and reads the basis B*8/128 times
    instead. Row-independent math, so the flat tail computes the same
    values as the vmapped form — tested to 1e-3 on the CPU mesh
    (tests/test_pipeline.py::test_process_batch_matches_single, XLA codec
    path) and the Pallas tile equivalence at bt>8 in interpret mode
    (tests/test_ops.py::test_auto_tile_large_batch).
    """
    head, tail = engine._head_fn, engine._tail_fn
    f_max = engine.max_faces

    @jax.jit
    def batch_program(variables, det_vars, pack, basis_w, basis_u, anchors,
                      frames, frames_s2d, true_hws):
        face_scores, n_faces, rois, param62 = jax.vmap(
            head, in_axes=(None, None, None, 0, 0, 0))(
                variables, det_vars, anchors, frames, frames_s2d, true_hws)
        b = frames.shape[0]
        lmk, dense, angles, t3d = tail(
            param62.reshape(b * f_max, param62.shape[-1]),
            rois.reshape(b * f_max, rois.shape[-1]),
            pack, basis_w, basis_u)
        unflat = lambda x: x.reshape(b, f_max, *x.shape[1:])
        return (face_scores, n_faces, rois, param62, unflat(lmk),
                unflat(dense), unflat(angles), unflat(t3d))

    return batch_program
