"""Native C++ runtime tests: build, and parity with the numpy oracle and
JAX implementations."""

import numpy as np
import pytest

from synergynet_tpu.native import (
    build_native, native_available, rasterize_cpu, vertex_normals_cpu,
    nms_cpu,
)
from tests.oracles import oracle_rasterize, oracle_get_normal
from tests.test_render import random_mesh
from tests.test_detect import nms_greedy_oracle


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ build unavailable")


class TestNativeRasterize:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        verts, tris, colors = random_mesh(rng)
        bg = rng.integers(0, 255, (32, 32, 3), np.uint8)
        want_img, want_depth = oracle_rasterize(bg, verts, tris, colors,
                                                alpha=1.0)
        got_img, got_depth = rasterize_cpu(verts, tris, colors, bg,
                                           alpha=1.0)
        np.testing.assert_allclose(got_depth, want_depth, rtol=1e-4,
                                   atol=1e-3)
        diff = np.abs(got_img.astype(int) - want_img.astype(int))
        assert (diff > 1).mean() < 0.003

    def test_reverse(self):
        rng = np.random.default_rng(2)
        verts, tris, colors = random_mesh(rng)
        bg = np.zeros((32, 32, 3), np.uint8)
        a, _ = rasterize_cpu(verts, tris, colors, bg)
        b, _ = rasterize_cpu(verts, tris, colors, bg, reverse=True)
        np.testing.assert_array_equal(a, b[::-1])


class TestNativeNormals:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        verts, tris, _ = random_mesh(rng, nver=30, ntri=50)
        tris[:30, 1] = np.arange(30) % 30
        want = oracle_get_normal(verts, tris)
        got = vertex_normals_cpu(verts, tris)
        finite = np.isfinite(want).all(1)
        np.testing.assert_allclose(got[finite], want[finite], rtol=1e-4,
                                   atol=1e-5)


class TestNativeNMS:
    def test_matches_oracle(self):
        rng = np.random.default_rng(3)
        n = 300
        xy = rng.uniform(0, 200, (n, 2))
        wh = rng.uniform(5, 80, (n, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        dets = np.concatenate([boxes, scores[:, None]], 1)
        got = nms_cpu(dets, 0.3)
        order = np.argsort(-scores, kind="stable")
        keep_mask = nms_greedy_oracle(boxes[order], 0.3)
        want = [int(i) for i in order[keep_mask]]
        assert got == want

    def test_matches_jax_nms(self):
        from synergynet_tpu.detect import nms_indices
        rng = np.random.default_rng(4)
        n = 150
        xy = rng.uniform(0, 100, (n, 2))
        wh = rng.uniform(5, 50, (n, 2))
        dets = np.concatenate(
            [xy, xy + wh, rng.uniform(0, 1, (n, 1))], 1).astype(np.float32)
        assert nms_cpu(dets, 0.3) == nms_indices(dets, 0.3)


class TestNativeTexture:
    def test_matches_window_texture_path(self):
        import jax.numpy as jnp
        from synergynet_tpu import native
        from synergynet_tpu.render.raster import blend_uint8
        from synergynet_tpu.render.texture import rasterize_texture_buffers
        if not native.native_available():
            native.build_native()
        rng = np.random.default_rng(11)
        nver, ntri = 40, 60
        verts = np.stack([rng.uniform(1, 28, nver), rng.uniform(1, 28, nver),
                          rng.uniform(-5, 5, nver)], 1).astype(np.float32)
        tris = rng.integers(0, nver, (ntri, 3)).astype(np.int32)
        uv = rng.uniform(0, 1, (nver, 2)).astype(np.float32)
        texture = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        bg = rng.integers(0, 255, (32, 32, 3), np.uint8)
        for bilinear in (True, False):
            got, _ = native.render_texture_cpu(verts, tris, uv, texture, bg,
                                               bilinear=bilinear)
            zbuf, color = rasterize_texture_buffers(
                jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(uv),
                jnp.asarray(texture), h=32, w=32, win_h=32, win_w=32,
                bilinear=bilinear)
            want = np.asarray(blend_uint8(jnp.asarray(bg), zbuf, color, 1.0))
            close = (np.abs(got.astype(int) - want.astype(int)) <= 1).all(-1)
            assert close.mean() > 0.99, f"bilinear={bilinear}"
