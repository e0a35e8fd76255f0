"""Renderer tests: sort-based rasterizer + normals + lighting vs the
sequential numpy oracle re-derived from the reference C++ kernel."""

import numpy as np
import pytest

import jax.numpy as jnp

from synergynet_tpu.render import (
    rasterize, rasterize_buffers, blend_uint8, get_normal, get_tri_normal,
    get_ver_normal, RenderPipeline, window_for, DEPTH_INIT,
)
from tests.oracles import oracle_rasterize, oracle_get_normal


def random_mesh(rng, nver=40, ntri=60, extent=28.0, zspan=5.0):
    verts = np.stack([
        rng.uniform(1, extent, nver),
        rng.uniform(1, extent, nver),
        rng.uniform(-zspan, zspan, nver),
    ], 1).astype(np.float32)
    tris = rng.integers(0, nver, (ntri, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, (nver, 3)).astype(np.float32)
    return verts, tris, colors


class TestRasterize:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_oracle_alpha1(self, seed):
        """With alpha=1 every repeated blend fully overwrites, so the
        sequential oracle and the single-blend winner resolve identically."""
        rng = np.random.default_rng(seed)
        verts, tris, colors = random_mesh(rng)
        bg = rng.integers(0, 255, (32, 32, 3), np.uint8)
        want_img, want_depth = oracle_rasterize(bg, verts, tris, colors)
        got = rasterize(verts, tris, colors, bg=bg, alpha=1.0)
        zbuf, _ = rasterize_buffers(
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(colors),
            h=32, w=32, win_h=32, win_w=32)
        # XLA fuses the barycentric arithmetic into FMAs, so interpolated
        # depths differ from strict-fp32 numpy at the ~1e-4 level.
        np.testing.assert_allclose(np.asarray(zbuf), want_depth,
                                   rtol=1e-3, atol=2e-3)
        # uint8 equality modulo truncation knife-edges; the rare FMA-level
        # depth tie can also flip a winner, so allow isolated outliers.
        diff = np.abs(got.astype(int) - want_img.astype(int))
        assert (diff > 1).mean() < 0.003
        assert (diff > 0).mean() < 0.03

    def test_alpha_blend_nonoverlapping(self):
        """alpha<1 matches exactly when no pixel is written twice."""
        verts = np.array([[2, 2, 0], [12, 2, 0], [2, 12, 0],
                          [20, 20, 0], [30, 20, 0], [20, 30, 0]], np.float32)
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        colors = np.tile(np.array([[0.9, 0.2, 0.5]], np.float32), (6, 1))
        bg = np.full((40, 40, 3), 100, np.uint8)
        want, _ = oracle_rasterize(bg, verts, tris, colors, alpha=0.5)
        got = rasterize(verts, tris, colors, bg=bg, alpha=0.5)
        np.testing.assert_array_equal(got, want)

    def test_reverse_flips_rows(self):
        rng = np.random.default_rng(3)
        verts, tris, colors = random_mesh(rng)
        bg = np.zeros((32, 32, 3), np.uint8)
        a = rasterize(verts, tris, colors, bg=bg, alpha=1.0)
        b = rasterize(verts, tris, colors, bg=bg, alpha=1.0, reverse=True)
        np.testing.assert_array_equal(a, b[::-1])

    def test_depth_test_prefers_near(self):
        # Two stacked triangles; z=+5 must win regardless of order.
        verts = np.array([[2, 2, 5], [20, 2, 5], [2, 20, 5],
                          [2, 2, -5], [20, 2, -5], [2, 20, -5]], np.float32)
        colors = np.array([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)
        bg = np.zeros((24, 24, 3), np.uint8)
        for tris in ([[0, 1, 2], [3, 4, 5]], [[3, 4, 5], [0, 1, 2]]):
            out = rasterize(verts, np.asarray(tris, np.int32), colors, bg=bg)
            assert out[5, 5, 0] == 255 and out[5, 5, 1] == 0

    def test_window_for_covers_all(self):
        rng = np.random.default_rng(5)
        verts, tris, _ = random_mesh(rng, extent=20)
        wh, ww = window_for(verts, tris)
        xs = verts[:, 0][tris]
        ys = verts[:, 1][tris]
        assert ww >= (np.ceil(xs.max(1)) - np.floor(xs.min(1))).max()
        assert wh >= (np.ceil(ys.max(1)) - np.floor(ys.min(1))).max()

    def test_small_window_crops_but_safe(self):
        rng = np.random.default_rng(6)
        verts, tris, colors = random_mesh(rng)
        out = rasterize(verts, tris, colors, bg=np.zeros((32, 32, 3), np.uint8),
                        window=(2, 2))
        assert out.shape == (32, 32, 3)


class TestNormals:
    def test_get_normal_matches_oracle(self):
        rng = np.random.default_rng(0)
        verts, tris, _ = random_mesh(rng, nver=30, ntri=50)
        # ensure every vertex belongs to a triangle to avoid oracle NaNs
        tris[:10, 0] = np.arange(10)
        tris[:30, 1] = np.arange(30) % 30
        want = oracle_get_normal(verts, tris)
        got = np.asarray(get_normal(jnp.asarray(verts), jnp.asarray(tris)))
        finite = np.isfinite(want).all(1)
        assert finite.sum() > 20
        np.testing.assert_allclose(got[finite], want[finite],
                                   rtol=1e-4, atol=1e-5)

    def test_tri_normal_normalized(self):
        rng = np.random.default_rng(1)
        verts, tris, _ = random_mesh(rng)
        n = np.asarray(get_tri_normal(jnp.asarray(verts), jnp.asarray(tris),
                                      normalize=True))
        norms = np.linalg.norm(n, axis=1)
        ok = norms > 0.5
        np.testing.assert_allclose(norms[ok], 1.0, atol=1e-5)

    def test_ver_normal_guarded(self):
        verts = jnp.asarray(np.zeros((4, 3), np.float32))
        tris = jnp.asarray(np.array([[0, 1, 2]], np.int32))
        tri_n = get_tri_normal(verts, tris)
        out = np.asarray(get_ver_normal(tri_n, tris, 4))
        assert np.isfinite(out).all()


class TestLighting:
    def test_pipeline_runs_and_lights_mesh(self):
        rng = np.random.default_rng(2)
        verts, tris, _ = random_mesh(rng, nver=60, ntri=90, extent=28)
        bg = np.zeros((32, 32, 3), np.uint8)
        pipe = RenderPipeline()
        out = pipe(verts, tris, bg)
        assert out.shape == bg.shape and out.dtype == np.uint8
        assert out.max() > 0    # something was drawn and lit

    def test_ambient_only_constant_color(self):
        verts = np.array([[2, 2, 0], [25, 2, 0], [2, 25, 0]], np.float32)
        tris = np.array([[0, 1, 2]], np.int32)
        pipe = RenderPipeline(intensity_ambient=0.5, intensity_directional=0,
                              intensity_specular=0)
        out = pipe(verts, tris, np.zeros((30, 30, 3), np.uint8))
        drawn = out[out.sum(-1) > 0]
        assert len(drawn) > 0
        np.testing.assert_array_equal(drawn, 127)   # trunc(255 * 0.5)


class TestTextureRender:
    def test_uv_mapping_picks_right_texels(self):
        from synergynet_tpu.render import render_texture
        # One big triangle; corners map to distinct texture corners.
        verts = np.array([[2, 2, 0], [28, 2, 0], [2, 28, 0]], np.float32)
        tris = np.array([[0, 1, 2]], np.int32)
        # u right, v up; texture row 0 is v=1 (top)
        uv = np.array([[0, 1], [1, 1], [0, 0]], np.float32)
        tex = np.zeros((64, 64, 3), np.float32)
        tex[:32, :32] = [1, 0, 0]       # top-left = red
        tex[:32, 32:] = [0, 1, 0]       # top-right = green
        tex[32:, :32] = [0, 0, 1]       # bottom-left = blue
        out = render_texture(verts, tris, uv, tex,
                             np.zeros((32, 32, 3), np.uint8),
                             window=(32, 32), bilinear=False)
        assert tuple(out[3, 3]) == (255, 0, 0)      # near corner 0: red
        assert tuple(out[3, 24]) == (0, 255, 0)     # near corner 1: green
        assert tuple(out[24, 3]) == (0, 0, 255)     # near corner 2: blue

    def test_bilinear_smooth(self):
        from synergynet_tpu.render import render_texture
        verts = np.array([[0, 0, 0], [31, 0, 0], [0, 31, 0],
                          [31, 31, 0]], np.float32)
        tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
        uv = np.array([[0, 1], [1, 1], [0, 0], [1, 0]], np.float32)
        ramp = np.linspace(0, 1, 16)[None, :, None] * np.ones((16, 16, 3))
        out = render_texture(verts, tris, uv, ramp.astype(np.float32),
                             np.zeros((32, 32, 3), np.uint8),
                             window=(32, 32))
        row = out[16, 1:30, 0].astype(int)
        assert (np.diff(row) >= 0).all() and row[-1] > row[0] + 100

    def test_uint8_texture_accepted(self):
        from synergynet_tpu.render import render_texture
        verts = np.array([[2, 2, 0], [20, 2, 0], [2, 20, 0]], np.float32)
        tris = np.array([[0, 1, 2]], np.int32)
        uv = np.array([[0.5, 0.5]] * 3, np.float32)
        tex = np.full((8, 8, 3), 200, np.uint8)
        out = render_texture(verts, tris, uv, tex,
                             np.zeros((24, 24, 3), np.uint8), window=(32, 32))
        drawn = out[out.sum(-1) > 0]
        assert len(drawn) and (np.abs(drawn.astype(int) - 200) <= 1).all()
