"""mm3d core: codec/pose/crop vs numpy oracles, asset invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergynet_tpu.mm3d import (
    NVER, NTRI, N_LMK, STD_SIZE,
    decode_landmarks, decode_dense, decode_param62, dewhiten, whiten,
    pose_from_param, p2srt, matrix_to_euler_deg, rescale_to_roi,
    rescale_pose_to_roi, square_box, crop_img,
)
from tests.oracles import (
    oracle_param2vert, oracle_p2srt, oracle_matrix2angle, oracle_rescale,
)


def _rand_params(rng, b):
    return rng.normal(0, 1, (b, 62)).astype(np.float32)


class TestCodec:
    def test_landmark_decode_matches_oracle(self, small_pack, rng):
        params = _rand_params(rng, 5)
        got = np.asarray(decode_landmarks(jnp.asarray(params), small_pack))
        assert got.shape == (5, 3, 12)
        for i in range(5):
            want = oracle_param2vert(params[i], small_pack, dense=False)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-3)

    def test_dense_decode_matches_oracle(self, small_pack, rng):
        params = _rand_params(rng, 3)
        got = np.asarray(decode_dense(jnp.asarray(params), small_pack))
        assert got.shape == (3, 3, 97)
        for i in range(3):
            want = oracle_param2vert(params[i], small_pack, dense=True)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-3)

    def test_no_transform_no_whitening(self, small_pack, rng):
        params = _rand_params(rng, 2)
        raw = np.asarray(dewhiten(jnp.asarray(params), small_pack))
        got = np.asarray(decode_param62(
            jnp.asarray(raw), small_pack, dense=False, whitening=False,
            transform=False))
        want = oracle_param2vert(params[0], small_pack, dense=False,
                                 transform=False)
        np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-3)

    def test_whiten_roundtrip(self, small_pack, rng):
        params = jnp.asarray(_rand_params(rng, 4))
        back = whiten(dewhiten(params, small_pack), small_pack)
        np.testing.assert_allclose(np.asarray(back), np.asarray(params),
                                   rtol=1e-4, atol=1e-5)

    def test_landmarks_are_keypoint_rows_of_dense(self, small_pack, rng):
        """The 68-pt decode must equal gathering keypoint vertices from the
        dense decode (the defining property of the base sub-bases)."""
        params = jnp.asarray(_rand_params(rng, 2))
        lmk = np.asarray(decode_landmarks(params, small_pack))
        dense = np.asarray(decode_dense(params, small_pack))
        kp_vert = np.asarray(small_pack.keypoints)[::3] // 3
        np.testing.assert_allclose(lmk, dense[:, :, kp_vert], rtol=1e-4,
                                   atol=1e-3)

    def test_jit_and_vmap_compatible(self, small_pack, rng):
        params = jnp.asarray(_rand_params(rng, 4))
        f = jax.jit(lambda p: decode_landmarks(p, small_pack))
        np.testing.assert_allclose(np.asarray(f(params)),
                                   np.asarray(decode_landmarks(params, small_pack)),
                                   rtol=1e-5, atol=1e-5)

    def test_rescale_to_roi(self, small_pack, rng):
        params = jnp.asarray(_rand_params(rng, 2))
        verts = decode_landmarks(params, small_pack)
        roi = np.array([[10., 20., 110., 130.], [-5., 0., 60., 70.]],
                       np.float32)
        got = np.asarray(rescale_to_roi(verts, jnp.asarray(roi)))
        for i in range(2):
            want = oracle_rescale(np.asarray(verts)[i].astype(np.float64), roi[i])
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-3)


class TestPose:
    def test_p2srt_matches_oracle(self, rng):
        P = rng.normal(0, 1, (6, 3, 4)).astype(np.float32)
        s, R, t = p2srt(jnp.asarray(P))
        for i in range(6):
            so, Ro, to = oracle_p2srt(P[i].astype(np.float64))
            np.testing.assert_allclose(float(s[i]), so, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(R)[i], Ro, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(t)[i], to, rtol=1e-5)

    def test_euler_matches_oracle(self, rng):
        # random rotations via QR
        A = rng.normal(0, 1, (8, 3, 3))
        Rs = np.linalg.qr(A)[0]
        got = np.asarray(matrix_to_euler_deg(jnp.asarray(Rs.astype(np.float32))))
        for i in range(8):
            want = oracle_matrix2angle(Rs[i])
            np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-3)

    def test_euler_gimbal_lock(self):
        R = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
        got = np.asarray(matrix_to_euler_deg(jnp.asarray(R[None])))[0]
        want = oracle_matrix2angle(R.astype(np.float64))
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_pose_from_param(self, small_pack, rng):
        params = _rand_params(rng, 3)
        ang, t3d = pose_from_param(jnp.asarray(params), small_pack)
        assert ang.shape == (3, 3) and t3d.shape == (3, 3)
        raw = np.asarray(dewhiten(jnp.asarray(params), small_pack))
        for i in range(3):
            _, Ro, to = oracle_p2srt(raw[i, :12].reshape(3, 4).astype(np.float64))
            np.testing.assert_allclose(np.asarray(ang)[i],
                                       oracle_matrix2angle(Ro), rtol=1e-3,
                                       atol=1e-3)
            np.testing.assert_allclose(np.asarray(t3d)[i], to, rtol=1e-4,
                                       atol=1e-4)

    def test_rescale_pose(self, rng):
        t3d = jnp.asarray(rng.normal(50, 10, (2, 3)).astype(np.float32))
        roi = jnp.asarray([[10., 20., 110., 130.], [0., 0., 240., 240.]])
        got = np.asarray(rescale_pose_to_roi(t3d, roi))
        t = np.asarray(t3d)
        np.testing.assert_allclose(got[0, 0], t[0, 0] * (100 / 120) + 10, rtol=1e-5)
        np.testing.assert_allclose(got[1, 1], t[1, 1] * 2 + 0, rtol=1e-5)
        np.testing.assert_allclose(got[:, 2], t[:, 2], rtol=1e-6)


class TestCrop:
    def test_square_box_y_extent_rule(self):
        rect = [10.0, 20.0, 50.0, 80.0, 0.9]
        box = square_box(rect)
        side = 80 - 20
        margin = side * 1.2 // 2
        assert box[2] - box[0] == pytest.approx(2 * margin)
        assert box[3] - box[1] == pytest.approx(2 * margin)
        assert (box[0] + box[2]) / 2 == pytest.approx(30.0)
        assert (box[1] + box[3]) / 2 == pytest.approx(50.0)

    def test_crop_inside(self, rng):
        img = rng.integers(0, 255, (100, 120, 3)).astype(np.uint8)
        out = crop_img(img, [10, 20, 60, 70, 0.5])
        np.testing.assert_array_equal(out, img[20:70, 10:60])

    def test_crop_out_of_bounds_zero_padded(self, rng):
        img = rng.integers(1, 255, (50, 50, 3)).astype(np.uint8)
        out = crop_img(img, [-10, -10, 40, 40])
        assert out.shape == (50, 50, 3)
        assert (out[:10] == 0).all() and (out[:, :10] == 0).all()
        np.testing.assert_array_equal(out[10:, 10:], img[:40, :40])

    def test_crop_rounding(self, rng):
        img = rng.integers(0, 255, (100, 100, 3)).astype(np.uint8)
        out = crop_img(img, [9.6, 19.4, 59.5, 69.5])
        np.testing.assert_array_equal(out, img[19:70, 10:60])


class TestAssets:
    def test_synthetic_shapes(self, pack):
        assert pack.u.shape == (NVER * 3, 1)
        assert pack.w_shp.shape == (NVER * 3, 40)
        assert pack.w_exp.shape == (NVER * 3, 10)
        assert pack.u_base.shape == (N_LMK * 3, 1)
        assert pack.w_shp_base.shape == (N_LMK * 3, 40)
        assert pack.w_exp_base.shape == (N_LMK * 3, 10)
        assert pack.keypoints.shape == (N_LMK * 3,)
        assert pack.param_mean.shape == (62,)
        assert pack.param_std.shape == (62,)
        assert pack.tri.shape == (3, NTRI)
        assert pack.tri.min() >= 0 and pack.tri.max() < NVER

    def test_synthetic_deterministic(self):
        from synergynet_tpu.mm3d import make_synthetic_assets
        a = make_synthetic_assets(seed=3)
        b = make_synthetic_assets(seed=3)
        np.testing.assert_array_equal(a["w_shp"], b["w_shp"])
        np.testing.assert_array_equal(a["tri"], b["tri"])

    def test_mean_face_in_crop(self, pack):
        """Zero whitened params must decode to a face inside the 120 crop."""
        v = np.asarray(decode_dense(jnp.zeros((1, 62)), pack))[0]
        assert v[0].min() > -5 and v[0].max() < STD_SIZE + 5
        assert v[1].min() > -5 and v[1].max() < STD_SIZE + 5


class TestRawBFMConvert:
    def test_trim_recipe(self, tmp_path):
        """Fabricate a raw BFM-layout .mat and check the trimming recipe
        (column truncation, 0-based indices, keypoint triplets)."""
        import scipy.io as sio
        from synergynet_tpu.mm3d.assets import convert_raw_bfm, pack_from_arrays

        rng = np.random.default_rng(0)
        nver = 30
        model = {
            "w": rng.normal(0, 1, (nver * 3, 60)).astype(np.float32),
            "w_exp": rng.normal(0, 1, (nver * 3, 29)).astype(np.float32),
            "mu_shape": rng.normal(0, 1, (nver * 3, 1)).astype(np.float32),
            "mu_exp": rng.normal(0, 1, (nver * 3, 1)).astype(np.float32),
            "tri": rng.integers(1, nver + 1, (3, 40)).astype(np.float64),
            "keypoints": (rng.choice(nver, 5, replace=False) + 1
                          )[None, :].astype(np.float64),
        }
        p = str(tmp_path / "bfm.mat")
        sio.savemat(p, {"model_refine": model})
        d = convert_raw_bfm(p)
        assert d["w_shp"].shape == (nver * 3, 40)
        assert d["w_exp"].shape == (nver * 3, 10)
        assert d["tri"].min() >= 0 and d["tri"].max() < nver
        kp = d["keypoints"]
        assert kp.shape == (15,)
        # interleaved triplets 3k, 3k+1, 3k+2
        assert ((kp.reshape(5, 3)[:, 1] - kp.reshape(5, 3)[:, 0]) == 1).all()
        assert ((kp.reshape(5, 3)[:, 2] - kp.reshape(5, 3)[:, 1]) == 1).all()
        pack = pack_from_arrays(d)
        assert pack.w_shp_base.shape == (15, 40)
