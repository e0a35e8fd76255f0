"""Pallas fused-decode kernel tests (interpreter mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from synergynet_tpu.mm3d import decode_dense
from synergynet_tpu.ops import build_decode_basis, decode_dense_fused


class TestFusedDecode:
    def test_matches_codec_small_pack(self, small_pack, rng):
        basis = build_decode_basis(small_pack)
        assert basis.nver == 97 and basis.npad == 128
        p = jnp.asarray(rng.normal(0, 1, (5, 62)).astype(np.float32))
        want = np.asarray(decode_dense(p, small_pack))
        got = np.asarray(decode_dense_fused(
            p, basis, small_pack, vertex_tile=128, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_matches_codec_full_pack(self, pack, rng):
        basis = build_decode_basis(pack)
        p = jnp.asarray(rng.normal(0, 0.5, (3, 62)).astype(np.float32))
        want = np.asarray(decode_dense(p, pack))
        got = np.asarray(decode_dense_fused(p, basis, pack, interpret=True))
        assert got.shape == want.shape == (3, 3, 53215)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_batch_padding(self, small_pack, rng):
        """Batch not divisible by the batch tile pads internally and trims."""
        basis = build_decode_basis(small_pack)
        p = jnp.asarray(rng.normal(0, 1, (3, 62)).astype(np.float32))
        got3 = np.asarray(decode_dense_fused(
            p, basis, small_pack, vertex_tile=128, interpret=True))
        got1 = np.asarray(decode_dense_fused(
            p[1:2], basis, small_pack, vertex_tile=128, interpret=True))
        np.testing.assert_allclose(got3[1], got1[0], rtol=1e-5, atol=1e-5)

    def test_auto_tile_choice(self):
        from synergynet_tpu.ops.fused_decode import _auto_batch_tile
        assert _auto_batch_tile(1) == 8
        assert _auto_batch_tile(8) == 8
        assert _auto_batch_tile(12) == 16      # overshoots non-pow2 batches
        assert _auto_batch_tile(48) == 64
        assert _auto_batch_tile(100) == 128
        assert _auto_batch_tile(1024) == 128   # capped

    def test_auto_tile_large_batch(self, small_pack, rng):
        """batch_tile=None auto-sizing at a serving-scale batch: bt > 8
        combined with b % bt != 0 (b=48 -> bt=64, padded internally) —
        previously only exercised on live TPU (ADVICE round 3)."""
        basis = build_decode_basis(small_pack)
        p = jnp.asarray(rng.normal(0, 1, (48, 62)).astype(np.float32))
        want = np.asarray(decode_dense(p, small_pack))
        got = np.asarray(decode_dense_fused(
            p, basis, small_pack, batch_tile=None, vertex_tile=128,
            interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_fast_path_dispatch_cpu(self, pack, rng):
        """On CPU the fast path must fall back to the XLA codec."""
        from synergynet_tpu.ops import decode_dense_fast
        p = jnp.asarray(rng.normal(0, 0.5, (2, 62)).astype(np.float32))
        got = np.asarray(decode_dense_fast(p, pack))
        want = np.asarray(decode_dense(p, pack))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
