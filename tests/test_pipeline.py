"""Pipeline tests: crop semantics vs reference rules, batched API, obj
writers, UV mapper, drawing smoke tests."""

import os

import numpy as np
import pytest

from synergynet_tpu.mm3d.crop import square_box, crop_img
from synergynet_tpu.pipeline import (
    SynergyNet3DMM, preprocess_crops, write_obj, write_obj_with_colors,
    UVTextureMapper, draw_axis, viz_bbox,
)


class TestCrop:
    def test_square_box_reference_rule(self):
        rect = [10.0, 20.0, 110.0, 140.0, 0.9]
        rb = square_box(rect)
        # side from y-extent: 120 * 1.2 // 2 = 72
        assert rb.tolist() == [60 - 72, 80 - 72, 60 + 72, 80 + 72]

    def test_crop_img_zero_pads(self):
        img = np.arange(100, dtype=np.uint8).reshape(10, 10)
        img3 = np.stack([img] * 3, -1)
        out = crop_img(img3, [-2, -2, 5, 5])
        assert out.shape == (7, 7, 3)
        assert (out[:2] == 0).all() and (out[:, :2] == 0).all()
        np.testing.assert_array_equal(out[2:, 2:, 0], img[:5, :5])

    def test_preprocess_stack_shape(self):
        img = np.random.default_rng(0).integers(
            0, 255, (200, 300, 3), np.uint8)
        rois = [np.array([10, 10, 80, 80]), np.array([50, 40, 180, 170])]
        crops = preprocess_crops(img, rois)
        assert crops.shape == (2, 120, 120, 3) and crops.dtype == np.uint8


class TestAPI:
    @pytest.fixture(scope="class")
    def api(self, request):
        return SynergyNet3DMM()

    def test_get_all_outputs_with_rects(self, api):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (240, 320, 3), np.uint8)
        rects = [[40.0, 50.0, 140.0, 160.0, 0.99],
                 [160.0, 60.0, 240.0, 150.0, 0.90]]
        pts, verts, poses = api.get_all_outputs(img, rects=rects)
        assert len(pts) == len(verts) == len(poses) == 2
        assert pts[0].shape == (3, 68)
        assert verts[0].shape[0] == 3 and verts[0].shape[1] > 50000
        angles, t3d = poses[0]
        assert angles.shape == (3,) and t3d.shape == (3,)
        # landmarks land inside (a margin of) the roi box
        rb = square_box(rects[0])
        assert pts[0][0].min() > rb[0] - 60 and pts[0][0].max() < rb[2] + 60

    def test_empty_rects(self, api):
        img = np.zeros((100, 100, 3), np.uint8)
        assert api.get_all_outputs(img, rects=[]) == ([], [], [])

    def test_process_crops_zero_faces(self, api):
        """The public batched API keeps its 5-tuple-of-arrays contract at
        n=0 (round-5 review: the empty chunk loop returned [])."""
        out = api.process_crops(np.zeros((0, 120, 120, 3), np.uint8),
                                np.zeros((0, 4), np.float32))
        p62, lmk, dense, angles, t3d = out
        assert p62.shape == (0, 62) and lmk.shape[0] == 0
        assert dense.shape[0] == 0 and angles.shape == (0, 3)
        assert t3d.shape == (0, 3)

    def test_bucket_padding_consistent(self, api):
        """3 faces (padded to bucket 4) must equal the same faces run alone."""
        rng = np.random.default_rng(2)
        crops = rng.integers(0, 255, (3, 120, 120, 3), np.uint8)
        rois = np.asarray([[0, 0, 120, 120]] * 3, np.float32)
        full = api.process_crops(crops, rois)
        single = api.process_crops(crops[1:2], rois[1:2])
        np.testing.assert_allclose(full[1][1], single[1][0], atol=2e-4)


class TestOutputs:
    def test_write_obj_roundtrip(self, tmp_path):
        v = np.random.default_rng(0).normal(0, 1, (3, 5)).astype(np.float32)
        t = np.array([[1, 2], [2, 3], [3, 4]], np.int32)
        p = write_obj(str(tmp_path / "mesh"), v, t)
        lines = open(p).read().strip().splitlines()
        assert len(lines) == 7
        assert lines[0].startswith("v ")
        assert lines[-2] == "f 3 2 1" and lines[-1] == "f 4 3 2"

    def test_write_obj_with_colors(self, tmp_path):
        v = np.zeros((3, 4), np.float32)
        t = np.array([[1], [2], [3]], np.int32)
        c = np.full((4, 3), 128, np.uint8)
        p = write_obj_with_colors(str(tmp_path / "m.obj"), v, t, c)
        lines = open(p).read().strip().splitlines()
        assert lines[0].count(" ") == 6 and lines[-1] == "f 1 2 3"

    def test_write_obj_with_colors_texture(self, tmp_path):
        """mtl-textured obj writer (reference rasterize_kernel.cpp:464-512,
        round-2 VERDICT item 8): mtllib header, colored v lines, vt lines,
        usemtl, reversed v/vt faces, companion .mtl."""
        from synergynet_tpu.pipeline import write_obj_with_colors_texture
        v = np.arange(12, dtype=np.float32).reshape(3, 4)
        t = np.array([[1, 2], [2, 3], [3, 4]], np.int32)
        c = np.full((4, 3), 0.5, np.float32)
        uv = np.linspace(0, 1, 8, dtype=np.float32).reshape(4, 2)
        p = write_obj_with_colors_texture(str(tmp_path / "tex.obj"),
                                          v, t, c, uv)
        lines = open(p).read().strip().splitlines()
        assert lines[0] == "mtllib tex.mtl"
        assert lines[1].startswith("v ") and lines[1].count(" ") == 6
        assert sum(ln.startswith("vt ") for ln in lines) == 4
        assert "usemtl FaceTexture" in lines
        assert lines[-2] == "f 3/3 2/2 1/1" and lines[-1] == "f 4/4 3/3 2/2"
        mtl = open(str(tmp_path / "tex.mtl")).read()
        assert "newmtl FaceTexture" in mtl and "map_Kd" in mtl

    def test_uv_mapper_lookup_and_trim(self):
        m = UVTextureMapper.synthetic(nver=500)
        tex = np.random.default_rng(0).integers(
            0, 255, (256, 256, 3), np.uint8)
        colors = m.colors_from_texture(tex)
        assert colors.shape == (500, 3)
        assert (m.coord_u >= 0).all() and (m.coord_u <= 255).all()


class TestDraw:
    def test_draw_axis_and_bbox(self):
        img = np.zeros((100, 100, 3), np.uint8)
        pts = np.random.default_rng(0).uniform(20, 80, (3, 68))
        out = draw_axis(img.copy(), 10.0, -5.0, 3.0, pts)
        assert out.sum() > 0
        out2 = viz_bbox(img.copy(), [[10, 10, 60, 60, 0.9]])
        assert out2.sum() > 0


class TestDeviceCrop:
    def test_matches_host_cv2_chain(self):
        import cv2
        import jax.numpy as jnp
        from synergynet_tpu.pipeline import crop_resize_bilinear
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (300, 400, 3), np.uint8)
        rois = [[40., 30., 200., 190.],    # downscale
                [-20., -10., 140., 150.],  # out-of-bounds zero pad
                [10., 10., 70., 70.],      # upscale
                [40.2, 30.7, 199.6, 190.49]]  # fractional
        got = np.asarray(crop_resize_bilinear(
            jnp.asarray(img, jnp.float32), jnp.asarray(rois)))
        for i, roi in enumerate(rois):
            want = cv2.resize(crop_img(img, roi), (120, 120),
                              interpolation=cv2.INTER_LINEAR)
            assert np.abs(got[i] - want).max() < 1.0, roi

    def test_hybrid_matches_matmul_and_cv2(self):
        """crop_resize_hybrid (row gather + lerp, column matmul) must
        reproduce crop_resize_matmul's output to float32 rounding and stay
        within the same <1 LSB envelope vs the host cv2 chain."""
        import cv2
        import jax.numpy as jnp
        from synergynet_tpu.pipeline import (crop_resize_hybrid,
                                             crop_resize_matmul)
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (300, 400, 3), np.uint8)
        rois = [[40., 30., 200., 190.],
                [-20., -10., 140., 150.],   # zero pad
                [10., 10., 70., 70.],       # upscale
                [40.2, 30.7, 199.6, 190.49],
                [250., 180., 460., 390.]]   # runs off bottom-right
        imj = jnp.asarray(img, jnp.float32)
        rj = jnp.asarray(rois)
        got_h = np.asarray(crop_resize_hybrid(imj, rj))
        got_m = np.asarray(crop_resize_matmul(imj, rj))
        np.testing.assert_allclose(got_h, got_m, atol=1e-3)
        for i, roi in enumerate(rois):
            want = cv2.resize(crop_img(img, roi), (120, 120),
                              interpolation=cv2.INTER_LINEAR)
            assert np.abs(got_h[i] - want).max() < 1.0, roi

    def test_square_rois_matches_host(self):
        import jax.numpy as jnp
        from synergynet_tpu.pipeline import square_rois
        rects = np.asarray([[10., 20., 110., 140.],
                            [0., 0., 33., 77.]], np.float32)
        got = np.asarray(square_rois(jnp.asarray(rects)))
        for i in range(2):
            np.testing.assert_allclose(got[i], square_box(rects[i]))


class TestFusedFrameEngine:
    def test_matches_two_stage_path(self):
        """The single-program engine must agree with the two-stage API
        (device crop uses INTER_LINEAR like the demo script, so compare
        against the linear interpolation path)."""
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect.detector import FaceBoxes
        from synergynet_tpu.detect.torch_import import random_init_variables
        from synergynet_tpu.pipeline import FusedFrameEngine, SynergyNet3DMM

        # Rig the heads deterministically: zero loc (boxes == anchors,
        # well-formed) and sparse strong conf positives.
        v = jax.device_get(random_init_variables())
        for i in range(3):
            k = v["params"][f"loc{i}"]
            k["kernel"] = jnp.zeros_like(k["kernel"])
            k["bias"] = jnp.zeros_like(k["bias"])
            c = v["params"][f"conf{i}"]
            c["kernel"] = jnp.zeros_like(c["kernel"])
            bias = np.tile([2.0, -2.0], np.shape(c["bias"])[0] // 2)
            c["bias"] = jnp.asarray(bias, jnp.float32)
        b = np.array(v["params"]["conf0"]["bias"])
        b[1::42] = 6.0          # sparse strong positives
        v["params"]["conf0"]["bias"] = jnp.asarray(b)
        det = FaceBoxes(variables=v)

        api = SynergyNet3DMM(detector=det)
        eng = FusedFrameEngine(api, detector=det)
        img = np.random.default_rng(3).integers(
            0, 255, (480, 640, 3), np.uint8)

        pts_f, verts_f, poses_f = eng(img)
        rects = det(img)[:eng.max_faces]
        pts_h, verts_h, poses_h = api.get_all_outputs(
            img, rects=rects, interpolation="linear")

        assert len(pts_f) > 0
        assert len(pts_f) == len(pts_h)
        for a, b2 in zip(pts_f, pts_h):
            np.testing.assert_allclose(a, b2, rtol=1e-2, atol=0.5)
        np.testing.assert_allclose(poses_f[0][0], poses_h[0][0],
                                   rtol=1e-2, atol=0.2)


class TestBatchedFrames:
    def test_process_batch_matches_single(self):
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect.detector import CANVAS, FaceBoxes
        from synergynet_tpu.detect.net import space_to_depth
        from synergynet_tpu.detect.torch_import import random_init_variables
        from synergynet_tpu.pipeline import FusedFrameEngine, SynergyNet3DMM

        det = FaceBoxes(variables=random_init_variables())
        api = SynergyNet3DMM(detector=det)
        eng = FusedFrameEngine(api, detector=det, max_faces=4)
        ch, cw = CANVAS
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (2, ch, cw, 3)).astype(np.float32)
        packed = np.ascontiguousarray(space_to_depth(frames, det.stem_r))
        hws = np.asarray([[ch, cw]] * 2, np.int32)

        batched = eng.process_batch(jnp.asarray(frames), jnp.asarray(packed),
                                    jnp.asarray(hws))
        single = eng._program(api.variables, det.variables, *eng.pack_args,
                              jnp.asarray(frames[1]), jnp.asarray(packed[1]),
                              jnp.asarray(hws[1]))
        for b, s in zip(batched, single):
            np.testing.assert_allclose(np.asarray(b)[1], np.asarray(s),
                                       rtol=1e-3, atol=1e-3)


class TestFusedEngineScaling:
    def test_downscaled_frame_coordinates(self):
        """A frame larger than the canvas must come back in original-image
        coordinates, z included (matching the two-stage path)."""
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect.detector import FaceBoxes
        from synergynet_tpu.detect.torch_import import random_init_variables
        from synergynet_tpu.pipeline import FusedFrameEngine, SynergyNet3DMM

        v = jax.device_get(random_init_variables())
        for i in range(3):
            k = v["params"][f"loc{i}"]
            k["kernel"] = jnp.zeros_like(k["kernel"])
            k["bias"] = jnp.zeros_like(k["bias"])
            c = v["params"][f"conf{i}"]
            c["kernel"] = jnp.zeros_like(c["kernel"])
            bias = np.tile([2.0, -2.0], np.shape(c["bias"])[0] // 2)
            c["bias"] = jnp.asarray(bias, jnp.float32)
        b = np.array(v["params"]["conf0"]["bias"])
        b[1::42] = 6.0
        v["params"]["conf0"]["bias"] = jnp.asarray(b)
        det = FaceBoxes(variables=v)

        api = SynergyNet3DMM(detector=det)
        eng = FusedFrameEngine(api, detector=det)
        img = np.random.default_rng(4).integers(
            0, 255, (1440, 1920, 3), np.uint8)   # 2x the canvas -> scale 0.5

        pts_f, verts_f, poses_f = eng(img)
        rects = det(img)[:eng.max_faces]
        pts_h, verts_h, _ = api.get_all_outputs(img, rects=rects,
                                                interpolation="linear")
        assert len(pts_f) == len(pts_h) > 0
        for a, b2 in zip(pts_f, pts_h):
            np.testing.assert_allclose(a, b2, rtol=2e-2, atol=1.0)
