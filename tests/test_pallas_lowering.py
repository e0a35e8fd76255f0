"""TPU Mosaic *lowering* gate for every Pallas kernel entry point.

Interpret-mode tests validate kernel math but skip Mosaic's hardware
constraints entirely (``_check_block_mappings`` and the full
jaxpr->Mosaic-module lowering only run in the TPU lowering rule). Round 4
shipped a stem kernel whose out-block column tile (34) violated the
(8, 128) divisibility rule: every interpret test passed while the real
bench died at compile time (BENCH_r04.json, VERDICT round 4 weak #1-#3).

This gate closes that class of failure without hardware:
``jax.export.export(fn, platforms=["tpu"])`` triggers
``pallas_call_tpu_lowering_rule`` -> ``lower_jaxpr_to_module`` on any host,
exercising block-mapping checks AND the Mosaic lowering of the kernel body
(unsupported ops, reshapes, dtypes). It does not run the final
Mosaic->machine-code pass (that happens in on-device XLA compilation), but
it would have caught round 4's crash in CI.

Covers all 8 ``pallas_call`` sites:
  - detect/stem_pallas.py::fused_stem1_s2d8 (at the EXACT production
    serving geometry: 720x1088 canvas -> (B, 90, 136, 192) bf16)
  - ops/fused_decode.py::_decode_dense_fused
  - render/raster_tiled.py: _launch (default, color n_payload=3 and
    visibility n_payload=2), _launch_compact (deferred); the PACK4
    packed variant was deleted after the round-5 on-chip measurement
    (docs/RENDERER.md)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export


def _assert_lowers_for_tpu(fn, *args, **kwargs):
    """Export ``fn`` for the TPU platform — raises if any pallas_call in it
    fails Mosaic lowering. Returns the exported artifact."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    return export.export(jitted, platforms=["tpu"])(*args, **kwargs)


class TestStemLowering:
    def test_production_canvas_bf16(self):
        """The serving detector's exact stem geometry (detect/detector.py
        CANVAS=720x1088, stem_r=8, bf16) must lower for TPU. This test
        FAILS on round-4 HEAD (tj=34 out-block). NOTE this gate stops at
        Mosaic lowering; infer-vector-layout and memref lowering run only
        in the real backend compile, so new kernel geometries must also
        be compile-probed on hardware (round-5 failures #2 and #3 in the
        stem_pallas.py module docstring passed here and died on-chip)."""
        from synergynet_tpu.detect.stem_pallas import fused_stem1_s2d8
        b, h8, w8, c, cout = 1, 90, 136, 192, 48
        x = jnp.zeros((b, h8, w8, c), jnp.bfloat16)
        k = jnp.zeros((2, 2, c, 4 * cout), jnp.bfloat16)
        bias = jnp.zeros((4 * cout,), jnp.bfloat16)
        _assert_lowers_for_tpu(
            lambda x, k, b: fused_stem1_s2d8(x, k, b, cout=cout),
            x, k, bias)

    def test_small_f32(self):
        from synergynet_tpu.detect.stem_pallas import fused_stem1_s2d8
        b, h8, w8, c, cout = 2, 12, 16, 192, 48
        x = jnp.zeros((b, h8, w8, c), jnp.float32)
        k = jnp.zeros((2, 2, c, 4 * cout), jnp.float32)
        bias = jnp.zeros((4 * cout,), jnp.float32)
        _assert_lowers_for_tpu(
            lambda x, k, b: fused_stem1_s2d8(x, k, b, cout=cout),
            x, k, bias)

    def test_odd_width_lowers(self):
        """The row-band design removed the column-tiling divisibility
        constraint: the out block spans the full W8, which is always a
        legal block dim — odd widths must lower too."""
        from synergynet_tpu.detect.stem_pallas import fused_stem1_s2d8
        b, h8, w8, c, cout = 1, 12, 17, 192, 48
        x = jnp.zeros((b, h8, w8, c), jnp.bfloat16)
        k = jnp.zeros((2, 2, c, 4 * cout), jnp.bfloat16)
        bias = jnp.zeros((4 * cout,), jnp.bfloat16)
        _assert_lowers_for_tpu(
            lambda x, k, b: fused_stem1_s2d8(x, k, b, cout=cout),
            x, k, bias)

    def test_pick_row_band_legality(self):
        """Every band _pick_row_band returns divides h8, and its working
        set fits the VMEM budget; production geometry gets a real band."""
        from synergynet_tpu.detect.stem_pallas import (_pick_row_band,
                                                       _round_up)
        for h8 in (12, 30, 90, 97, 180):
            hb = _pick_row_band(h8, 136, 192, 48)
            if hb is None:
                continue
            assert h8 % hb == 0, (h8, hb)
        assert _pick_row_band(90, 136, 192, 48) == 10   # production, bf16
        assert _round_up(137, 16) == 144

    def test_huge_width_falls_back(self):
        """Widths whose single-band working set exceeds VMEM must return
        None so StemS2D8 mode='pallas' can raise toward the XLA path."""
        from synergynet_tpu.detect.stem_pallas import _pick_row_band
        assert _pick_row_band(1, 100000, 192, 48) is None


class TestDecodeLowering:
    def test_serving_shape(self, small_pack):
        from synergynet_tpu.ops import build_decode_basis
        from synergynet_tpu.ops.fused_decode import _decode_dense_fused
        basis = build_decode_basis(small_pack)
        p = jnp.zeros((8, 62), jnp.float32)
        _assert_lowers_for_tpu(
            lambda p, w, u: _decode_dense_fused(
                p, w, u, small_pack, nver=basis.nver, batch_tile=8,
                vertex_tile=128, interpret=False),
            p, basis.w, basis.u)


def _mesh(rng, faces, t1=16, v1=12, h=64, w=64):
    tris = rng.integers(0, v1, (t1, 3)).astype(np.int32)
    verts, cols = [], []
    for _ in range(faces):
        off = rng.uniform([0, 0, 0], [w - 20, h - 20, 5])
        verts.append(rng.uniform(0, 20, (v1, 3)) + off)
        cols.append(rng.uniform(0, 1, (v1, 3)))
    verts = np.concatenate(verts).astype(np.float32)
    cols = np.concatenate(cols).astype(np.float32)
    tris_all = (tris[None] + (np.arange(faces, dtype=np.int32) * v1
                              )[:, None, None]).reshape(-1, 3)
    return verts, tris_all, cols


class TestRasterLowering:
    H = W = 64

    @pytest.mark.parametrize("deferred,faces", [
        (False, 1),             # default in-place path (_launch)
        (False, 4),             # per-face prep, same kernel
        (True, 1),              # deferred compact (_launch_compact)
    ])
    def test_color_paths(self, deferred, faces):
        from synergynet_tpu.render.raster_tiled import rasterize_buffers_tiled
        rng = np.random.default_rng(40 + faces + 4 * deferred)
        verts, tris, cols = _mesh(rng, faces, h=self.H, w=self.W)
        kw = dict(h=self.H, w=self.W, ry=2, rx=2)
        if not deferred:
            kw.update(faces=faces)
        _assert_lowers_for_tpu(
            jax.jit(lambda v, t, c: rasterize_buffers_tiled(
                v, t, c, deferred=deferred, **kw)),
            jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(cols))

    def test_visibility_path(self):
        from synergynet_tpu.render.raster_tiled import (
            rasterize_triangles_tiled)
        rng = np.random.default_rng(50)
        verts, tris, _ = _mesh(rng, 1, h=self.H, w=self.W)
        _assert_lowers_for_tpu(
            jax.jit(lambda v, t: rasterize_triangles_tiled(
                v, t, h=self.H, w=self.W, ry=2, rx=2)),
            jnp.asarray(verts), jnp.asarray(tris))
