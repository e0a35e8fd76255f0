"""Tiled Pallas rasterizer tests (interpret mode on the CPU mesh): oracle
parity, equivalence with the round-1 segment-reduce resolve, the
no-size-cap guarantee (VERDICT round-1 item 5), and visibility buffers."""

import numpy as np
import pytest

import jax.numpy as jnp

from synergynet_tpu.render import (
    DEPTH_INIT, rasterize_buffers, rasterize_tiled, rasterize_buffers_tiled,
    rasterize_triangles, rasterize_triangles_tiled, replication_for,
)
from tests.oracles import oracle_rasterize


def random_mesh(rng, nver=40, ntri=60, extent=28.0, zspan=5.0):
    verts = np.stack([
        rng.uniform(1, extent, nver),
        rng.uniform(1, extent, nver),
        rng.uniform(-zspan, zspan, nver),
    ], 1).astype(np.float32)
    tris = rng.integers(0, nver, (ntri, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, (nver, 3)).astype(np.float32)
    return verts, tris, colors


class TestTiledRasterize:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_oracle_alpha1(self, seed):
        rng = np.random.default_rng(seed)
        verts, tris, colors = random_mesh(rng)
        bg = rng.integers(0, 255, (32, 32, 3), np.uint8)
        want, want_depth = oracle_rasterize(bg, verts, tris, colors)
        got = rasterize_tiled(verts, tris, colors, bg=bg, alpha=1.0)
        diff = np.abs(got.astype(int) - want.astype(int))
        # Plane-equation evaluation regroups the barycentric arithmetic, so
        # knife-edge pixels can flip exactly like the FMA effects the
        # segment-reduce path documents; allow the same isolated outliers.
        assert (diff > 1).mean() < 0.003
        assert (diff > 0).mean() < 0.03

    def test_matches_segment_reduce_buffers(self):
        """Same zbuf/color as the round-1 resolve on a shared mesh."""
        rng = np.random.default_rng(5)
        verts, tris, colors = random_mesh(rng, nver=80, ntri=150)
        ry, rx = replication_for(verts, tris)
        zt, ct = rasterize_buffers_tiled(
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(colors),
            h=32, w=32, ry=ry, rx=rx, interpret=True)
        zs, cs = rasterize_buffers(
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(colors),
            h=32, w=32, win_h=32, win_w=32)
        zt, zs = np.asarray(zt), np.asarray(zs)
        same = np.isclose(zt, zs, atol=1e-3)
        assert same.mean() > 0.995          # knife-edge winner flips only
        ok = same & (zt > DEPTH_INIT)
        np.testing.assert_allclose(np.asarray(ct)[ok], np.asarray(cs)[ok],
                                   atol=1e-3)

    def test_no_size_cap_on_giant_triangles(self):
        """Triangles far larger than the round-1 32-px window render whole
        (VERDICT item 5: no silent fragment loss at any scale)."""
        h = w = 200
        verts = np.asarray([
            [5.0, 5.0, 1.0], [195.0, 5.0, 1.0], [5.0, 195.0, 1.0],   # giant
            [60.0, 60.0, 5.0], [80.0, 60.0, 5.0], [60.0, 80.0, 5.0],  # near
        ], np.float32)
        tris = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        colors = np.asarray([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)
        ry, rx = replication_for(verts, tris)
        assert ry >= 200 // 8 and rx >= 2    # replication sized to the data
        out = rasterize_tiled(verts, tris, colors, height=h, width=w,
                              replication=(ry, rx))
        # whole giant triangle covered: spot-check far-apart interior pixels
        for y, x in [(10, 10), (10, 180), (180, 10), (95, 95)]:
            assert tuple(out[y, x]) == (255, 0, 0), (y, x, out[y, x])
        # nearer triangle wins its area
        assert tuple(out[65, 65]) == (0, 255, 0)
        # oracle agreement across the full frame
        want, _ = oracle_rasterize(np.zeros((h, w, 3), np.uint8),
                                   verts, tris, colors)
        diff = np.abs(out.astype(int) - want.astype(int))
        # A ~270-px hypotenuse has ~270 knife-edge pixels where the affine
        # plane evaluation vs the oracle's per-pixel dots differ in the
        # last ulp; those coverage flips are the only allowed mismatches.
        assert (diff > 1).mean() < 0.0025

    @pytest.mark.parametrize("seed", [0, 11])
    def test_deferred_matches_inkernel_payloads(self, seed):
        """The deferred-payload path (z + winner id kernel, per-pixel plane
        eval) must reproduce the in-kernel payload path: identical depth
        buffer (same records, same merge rule) and matching colors up to
        FMA regrouping of the same plane formula."""
        rng = np.random.default_rng(seed)
        verts, tris, colors = random_mesh(rng, nver=80, ntri=150)
        ry, rx = replication_for(verts, tris)
        zd, cd = rasterize_buffers_tiled(
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(colors),
            h=32, w=32, ry=ry, rx=rx, interpret=True, deferred=True)
        zk, ck = rasterize_buffers_tiled(
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(colors),
            h=32, w=32, ry=ry, rx=rx, interpret=True, deferred=False)
        np.testing.assert_array_equal(np.asarray(zd), np.asarray(zk))
        np.testing.assert_allclose(np.asarray(cd), np.asarray(ck),
                                   atol=1e-4)

    def test_deferred_auto_replication_matches(self):
        rng = np.random.default_rng(13)
        verts, tris, colors = random_mesh(rng, nver=60, ntri=90, extent=20)
        za, ca = rasterize_buffers_tiled(
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(colors),
            h=32, w=32, ry=8, rx=2, interpret=True, deferred=True,
            auto_replication=True)
        zf, cf = rasterize_buffers_tiled(
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(colors),
            h=32, w=32, ry=8, rx=2, interpret=True, deferred=True)
        np.testing.assert_array_equal(np.asarray(za), np.asarray(zf))
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cf),
                                   atol=1e-5)

    @pytest.mark.parametrize("auto", [False, True])
    def test_multiface_prep_bit_identical(self, auto):
        """faces=F (per-face sorts + per-face small-slice gathers,
        _prepare_faces) must be BIT-identical to the global prep: the
        (bin, face, tri) chunk order it feeds the unchanged kernel equals
        the global path's (bin, global-tri) order."""
        rng = np.random.default_rng(21)
        F, T1, V1 = 4, 120, 50
        h, w = 96, 200
        tris = rng.integers(0, V1, (T1, 3)).astype(np.int32)
        verts, cols = [], []
        for _ in range(F):
            off = rng.uniform([0, 0, 0], [w - 40, h - 40, 5])
            verts.append(rng.uniform(0, 40, (V1, 3)) + off)
            cols.append(rng.uniform(0, 1, (V1, 3)))
        verts = np.concatenate(verts).astype(np.float32)
        cols = np.concatenate(cols).astype(np.float32)
        tris_all = (tris[None] + (np.arange(F, dtype=np.int32) * V1
                                  )[:, None, None]).reshape(-1, 3)
        kw = dict(h=h, w=w, ry=4, rx=2, interpret=True,
                  auto_replication=auto)
        za, ca = rasterize_buffers_tiled(verts, tris_all, cols, **kw)
        zf, cf = rasterize_buffers_tiled(verts, tris_all, cols,
                                         faces=F, **kw)
        np.testing.assert_array_equal(np.asarray(za), np.asarray(zf))
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cf))
        assert (np.asarray(za) > DEPTH_INIT).any()


    def test_multiface_faces_must_divide(self):
        verts = np.zeros((6, 3), np.float32)
        tris = np.asarray([[0, 1, 2], [3, 4, 5], [0, 2, 4]], np.int32)
        with pytest.raises(ValueError, match="does not divide"):
            rasterize_buffers_tiled(verts, tris, np.zeros((6, 3)),
                                    h=16, w=16, interpret=True, faces=2)

    def test_first_triangle_wins_depth_ties(self):
        verts = np.asarray([
            [2, 2, 3.0], [26, 2, 3.0], [2, 26, 3.0],
            [2, 2, 3.0], [26, 2, 3.0], [2, 26, 3.0],
        ], np.float32)
        tris = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        colors = np.asarray([[1, 0, 0]] * 3 + [[0, 0, 1]] * 3, np.float32)
        out = rasterize_tiled(verts, tris, colors, height=28, width=28)
        drawn = out.reshape(-1, 3)[out.reshape(-1, 3).any(1)]
        assert len(drawn) and (drawn == (255, 0, 0)).all()

    def test_empty_bins_and_offscreen_triangles(self):
        """Triangles fully outside the canvas draw nothing; untouched bins
        come back as background."""
        rng = np.random.default_rng(7)
        verts, tris, colors = random_mesh(rng)
        verts[:, 0] += 500.0                  # off a 64-wide canvas
        out = rasterize_tiled(verts, tris, colors, height=48, width=64)
        assert (out == 0).all()

    def test_visibility_buffers_match_window_path(self):
        rng = np.random.default_rng(9)
        verts, tris, colors = random_mesh(rng, nver=50, ntri=80)
        ry, rx = replication_for(verts, tris)
        ti_t, zb_t, w0_t = rasterize_triangles_tiled(
            jnp.asarray(verts), jnp.asarray(tris), h=32, w=32,
            ry=ry, rx=rx, interpret=True)
        ti_s, zb_s, w0_s = rasterize_triangles(
            jnp.asarray(verts), jnp.asarray(tris), h=32, w=32,
            win_h=32, win_w=32)
        same = np.isclose(np.asarray(zb_t), np.asarray(zb_s), atol=1e-3)
        assert same.mean() > 0.995
        agree = np.asarray(ti_t) == np.asarray(ti_s)
        assert (agree | ~same).mean() > 0.995
        ok = agree & same
        np.testing.assert_allclose(np.asarray(w0_t)[ok],
                                   np.asarray(w0_s)[ok], atol=1e-3)

    def test_alpha_blend_truncation(self):
        verts = np.asarray([[2, 2, 1.0], [26, 2, 1.0], [2, 26, 1.0]],
                           np.float32)
        tris = np.asarray([[0, 1, 2]], np.int32)
        colors = np.ones((3, 3), np.float32)
        bg = np.zeros((28, 28, 3), np.uint8)
        out = rasterize_tiled(verts, tris, colors, bg=bg, alpha=0.5)
        drawn = out.reshape(-1, 3)[out.reshape(-1, 3).any(1)]
        np.testing.assert_array_equal(drawn, 127)    # trunc(255 * 0.5)


class TestRingNormals:
    def test_matches_segment_sum_path(self):
        from synergynet_tpu.render.normals import (get_normal,
                                                   get_normal_rings,
                                                   one_ring_table)
        rng = np.random.default_rng(3)
        verts, tris, _ = random_mesh(rng, nver=60, ntri=100)
        rings = one_ring_table(tris, 60)
        a = np.asarray(get_normal(jnp.asarray(verts), jnp.asarray(tris)))
        b = np.asarray(get_normal_rings(jnp.asarray(verts),
                                        jnp.asarray(tris), rings))
        ok = np.isfinite(a).all(1)       # orphan vertices are NaN in both
        assert (np.isfinite(b).all(1) == ok).all()
        np.testing.assert_allclose(b[ok], a[ok], rtol=1e-5, atol=1e-6)

    def test_ring_table_contents(self):
        from synergynet_tpu.render.normals import one_ring_table
        tris = np.asarray([[0, 1, 2], [1, 2, 3], [0, 2, 3]], np.int32)
        rings = np.asarray(one_ring_table(tris, 5))
        t = tris.shape[0]
        for v in range(5):
            want = sorted(i for i, tr in enumerate(tris) if v in tr)
            got = sorted(x for x in rings[v] if x < t)
            assert got == want, (v, got, want)
        assert (rings[4] == t).all()      # orphan vertex: all padding


class TestRenderLitFaces:
    """Fused multi-face overlay render stage (pipeline/overlay_engine.py)
    at toy scale in interpret mode."""

    def test_valid_faces_drawn_invalid_parked(self):
        import jax.numpy as jnp
        from synergynet_tpu.pipeline.overlay_engine import render_lit_faces
        from synergynet_tpu.render.normals import one_ring_table

        rng = np.random.default_rng(2)
        nver, f = 30, 3
        # one small face mesh in a 32x128 frame
        base = np.stack([rng.uniform(4, 28, nver), rng.uniform(4, 28, nver),
                         rng.uniform(1, 6, nver)], 1).astype(np.float32)
        tris = rng.integers(0, nver, (40, 3)).astype(np.int32)
        verts = np.stack([base,
                          base + np.asarray([60, 0, 0], np.float32),
                          base + np.asarray([95, 0, 0], np.float32)])
        valid = jnp.asarray([True, True, False])
        tris_all = (tris[None] + (np.arange(f) * nver)[:, None, None]
                    ).reshape(-1, 3).astype(np.int32)
        rings = one_ring_table(tris, nver)
        frame = rng.integers(0, 120, (32, 128, 3)).astype(np.uint8)
        overlay, solid = render_lit_faces(
            jnp.asarray(frame), jnp.asarray(verts), valid,
            jnp.asarray(tris), jnp.asarray(tris_all), rings,
            alpha=0.6, replication=(8, 2), interpret=True)
        overlay, solid = np.asarray(overlay), np.asarray(solid)
        changed = (solid != frame).any(-1)
        assert changed[:, :30].any()          # face 0 drawn
        assert changed[:, 60:90].any()        # face 1 drawn
        assert not changed[:, 95:].any()      # parked face leaves no trace
        # alpha composite: unchanged background pixels stay identical
        same = ~changed
        np.testing.assert_array_equal(overlay[same], frame[same])
        # drawn pixels follow floor((1-a)*bg + a*solid + .5)
        want = np.clip(np.floor(0.4 * frame.astype(np.float64)
                                + 0.6 * solid.astype(np.float64) + 0.5),
                       0, 255).astype(np.uint8)
        np.testing.assert_array_equal(overlay, want)


    def test_adaptive_buckets_match_full_render(self):
        """render_lit_faces_adaptive must reproduce render_lit_faces for
        every face count (the lax.switch picks a smaller static bucket but
        the drawn output is identical — valid faces come first)."""
        import jax.numpy as jnp
        from synergynet_tpu.pipeline.overlay_engine import (
            render_lit_faces, render_lit_faces_adaptive)
        from synergynet_tpu.render.normals import one_ring_table

        rng = np.random.default_rng(5)
        nver, f = 25, 4
        base = np.stack([rng.uniform(4, 28, nver), rng.uniform(4, 28, nver),
                         rng.uniform(1, 6, nver)], 1).astype(np.float32)
        tris = rng.integers(0, nver, (30, 3)).astype(np.int32)
        verts = np.stack([base + np.asarray([30 * i, 0, 0], np.float32)
                          for i in range(f)])
        tris_all = (tris[None] + (np.arange(f) * nver)[:, None, None]
                    ).reshape(-1, 3).astype(np.int32)
        rings = jnp.asarray(one_ring_table(tris, nver))
        frame = rng.integers(0, 120, (32, 128, 3)).astype(np.uint8)

        for n in range(f + 1):
            valid = jnp.arange(f) < n
            want_ov, want_so = render_lit_faces(
                jnp.asarray(frame), jnp.asarray(verts), valid,
                jnp.asarray(tris), jnp.asarray(tris_all), rings,
                alpha=0.6, replication=(8, 2), interpret=True)
            got_ov, got_so = render_lit_faces_adaptive(
                jnp.asarray(frame), jnp.asarray(verts), jnp.int32(n),
                jnp.asarray(tris), jnp.asarray(tris_all), rings,
                alpha=0.6, replication=(8, 2), interpret=True)
            np.testing.assert_array_equal(np.asarray(got_so),
                                          np.asarray(want_so), err_msg=n)
            np.testing.assert_array_equal(np.asarray(got_ov),
                                          np.asarray(want_ov), err_msg=n)


class TestTiledTexture:
    def test_matches_window_texture_path(self):
        import jax.numpy as jnp
        from synergynet_tpu.render.texture import (
            rasterize_texture_buffers, rasterize_texture_buffers_tiled)
        rng = np.random.default_rng(4)
        verts, tris, _ = random_mesh(rng, nver=40, ntri=60)
        tex_coords = rng.uniform(0, 1, (40, 2)).astype(np.float32)
        texture = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        ry, rx = replication_for(verts, tris)
        zt, ct = rasterize_texture_buffers_tiled(
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(tex_coords),
            jnp.asarray(texture), h=32, w=32, ry=ry, rx=rx, interpret=True)
        zs, cs = rasterize_texture_buffers(
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(tex_coords),
            jnp.asarray(texture), h=32, w=32, win_h=32, win_w=32)
        same = np.isclose(np.asarray(zt), np.asarray(zs), atol=1e-3)
        assert same.mean() > 0.995
        ok = same & (np.asarray(zt) > DEPTH_INIT)
        np.testing.assert_allclose(np.asarray(ct)[ok], np.asarray(cs)[ok],
                                   atol=2e-2)


class TestReplicationBudget:
    """Pathological meshes (canvas-spanning triangles) must not OOM the
    binned program — entry points fall back to host paths instead."""

    def test_within_budget_math(self):
        from synergynet_tpu.render.raster_tiled import (
            REPLICATION_ROW_BUDGET, within_replication_budget)
        assert within_replication_budget(105840, 2, 2)
        assert not within_replication_budget(
            REPLICATION_ROW_BUDGET // 4 + 1, 2, 2)

    def test_rasterize_tiled_falls_back_to_native(self, monkeypatch):
        from synergynet_tpu import native
        from synergynet_tpu.render import raster_tiled
        if not native.native_available():
            native.build_native()
        rng = np.random.default_rng(7)
        verts, tris, colors = random_mesh(rng)
        bg = rng.integers(0, 255, (32, 32, 3), np.uint8)
        monkeypatch.setattr(raster_tiled, "REPLICATION_ROW_BUDGET", 10)
        with pytest.warns(RuntimeWarning, match="over budget"):
            got = rasterize_tiled(verts, tris, colors, bg=bg, alpha=1.0)
        want, _ = oracle_rasterize(bg, verts, tris, colors)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert (diff > 1).mean() < 0.003

    def test_render_texture_falls_back_to_native(self, monkeypatch):
        import jax
        from synergynet_tpu import native
        from synergynet_tpu.render import raster_tiled
        from synergynet_tpu.render.texture import render_texture
        if not native.native_available():
            native.build_native()
        rng = np.random.default_rng(8)
        verts, tris, _ = random_mesh(rng)
        tex_coords = rng.uniform(0, 1, (40, 2)).astype(np.float32)
        texture = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        bg = rng.integers(0, 255, (32, 32, 3), np.uint8)
        want = render_texture(verts, tris, tex_coords, texture, bg)
        # Pretend we are on TPU with a tiny budget: the tiled branch must
        # warn and route to the NATIVE renderer (the window path's 32-px
        # cap would silently crop the triangles that blew the budget),
        # never reaching the (un-lowerable-on-CPU) Pallas program.
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(raster_tiled, "REPLICATION_ROW_BUDGET", 10)
        with pytest.warns(RuntimeWarning, match="over budget"):
            got = render_texture(verts, tris, tex_coords, texture, bg)
        # Same math, different float regrouping: knife-edge pixels may
        # differ; everything else matches to 1 uint8 step.
        close = (np.abs(got.astype(int) - want.astype(int)) <= 1).all(-1)
        assert close.mean() > 0.99

    def test_render_texture_honors_explicit_window(self, monkeypatch):
        import jax
        from synergynet_tpu.render.texture import render_texture
        rng = np.random.default_rng(9)
        verts, tris, _ = random_mesh(rng)
        tex_coords = rng.uniform(0, 1, (40, 2)).astype(np.float32)
        texture = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        bg = rng.integers(0, 255, (32, 32, 3), np.uint8)
        want = render_texture(verts, tris, tex_coords, texture, bg,
                              window=(32, 32))
        # An explicit window must select the window path even on "tpu"
        # (previously it was silently discarded for the tiled kernel).
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        got = render_texture(verts, tris, tex_coords, texture, bg,
                             window=(32, 32))
        np.testing.assert_array_equal(got, want)

    def test_lit_pipeline_falls_back_to_native(self, monkeypatch):
        import jax
        from synergynet_tpu import native
        from synergynet_tpu.render import raster_tiled
        from synergynet_tpu.render.lighting import RenderPipeline
        if not native.native_available():
            native.build_native()
        rng = np.random.default_rng(10)
        verts, tris, _ = random_mesh(rng)
        bg = rng.integers(0, 255, (32, 32, 3), np.uint8)
        pipe = RenderPipeline()
        want = pipe(verts, tris, bg, tiled=False)
        monkeypatch.setattr(raster_tiled, "REPLICATION_ROW_BUDGET", 10)
        with pytest.warns(RuntimeWarning, match="over budget"):
            got = pipe(verts, tris, bg, tiled=True)
        close = (np.abs(got.astype(int) - want.astype(int)) <= 1).all(-1)
        assert close.mean() > 0.99
