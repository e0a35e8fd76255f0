"""Detector training utilities + rasterize_triangles tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergynet_tpu.detect import (
    jaccard, encode, match, multibox_loss, center_to_corner, decode_boxes,
)


class TestBoxMath:
    def test_jaccard_known(self):
        a = jnp.asarray([[0.0, 0.0, 0.5, 0.5]])
        b = jnp.asarray([[0.25, 0.25, 0.75, 0.75], [0.0, 0.0, 0.5, 0.5]])
        iou = np.asarray(jaccard(a, b))
        assert iou[0, 1] == pytest.approx(1.0)
        assert iou[0, 0] == pytest.approx(0.0625 / (0.5 - 0.0625), rel=1e-5)

    def test_encode_decode_roundtrip(self, rng):
        anchors = jnp.asarray(np.stack([
            rng.uniform(0.2, 0.8, 50), rng.uniform(0.2, 0.8, 50),
            rng.uniform(0.05, 0.3, 50), rng.uniform(0.05, 0.3, 50)],
            1).astype(np.float32))
        gt = np.array(center_to_corner(anchors))
        gt += rng.normal(0, 0.01, gt.shape).astype(np.float32)
        loc_t = encode(jnp.asarray(gt), anchors)
        back = np.asarray(decode_boxes(loc_t, anchors))
        np.testing.assert_allclose(back, gt, atol=1e-5)

    def test_match_claims_best_anchor(self):
        anchors = jnp.asarray([[0.25, 0.25, 0.2, 0.2],
                               [0.75, 0.75, 0.2, 0.2],
                               [0.5, 0.5, 0.1, 0.1]], jnp.float32)
        gt = jnp.asarray([[0.16, 0.16, 0.34, 0.34]], jnp.float32)  # near a0
        loc_t, labels = match(gt, jnp.asarray([True]), anchors,
                              iou_threshold=0.9)
        labels = np.asarray(labels)
        assert labels[0] == 1          # bipartite claim survives threshold
        assert labels[1] == 0 and labels[2] == 0

    def test_match_padding_ignored(self):
        anchors = jnp.asarray([[0.5, 0.5, 0.5, 0.5]], jnp.float32)
        gt = jnp.asarray([[0.25, 0.25, 0.75, 0.75],
                          [0.0, 0.0, 1.0, 1.0]], jnp.float32)
        _, l_valid = match(gt, jnp.asarray([True, False]), anchors)
        _, l_all = match(gt, jnp.asarray([True, True]), anchors)
        assert np.asarray(l_valid)[0] == 1

    def test_match_padded_row_cannot_steal_anchor_zero(self):
        """Padded GT rows argmax to anchor 0 on their all-(-1) IoU row; the
        redirect (round-5 review) must keep them from racing a valid GT
        whose best anchor IS anchor 0 — the valid claim always wins."""
        anchors = jnp.asarray([[0.1, 0.1, 0.2, 0.2],
                               [0.8, 0.8, 0.2, 0.2]], jnp.float32)
        gt = jnp.asarray([[0.02, 0.02, 0.18, 0.18],      # best = anchor 0
                          [0.0, 0.0, 0.0, 0.0]], jnp.float32)   # padding
        loc_t, labels = match(gt, jnp.asarray([True, False]), anchors,
                              iou_threshold=0.9)
        assert np.asarray(labels)[0] == 1   # claim survived the pad row
        # And the regression target is the valid GT's box, not the pad's.
        back = np.asarray(decode_boxes(loc_t, anchors))
        np.testing.assert_allclose(back[0], np.asarray(gt[0]), atol=1e-5)

    def test_multibox_loss_finite_and_ordered(self, rng):
        b, a = 2, 64
        loc_pred = jnp.asarray(rng.normal(0, 0.1, (b, a, 4)), jnp.float32)
        conf = jnp.asarray(rng.normal(0, 1, (b, a, 2)), jnp.float32)
        loc_t = jnp.asarray(rng.normal(0, 0.1, (b, a, 4)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 2, (b, a)), jnp.int32)
        out = multibox_loss(loc_pred, conf, loc_t, labels)
        assert np.isfinite(out["loss_total"])
        # perfect loc pred lowers the loc term
        out2 = multibox_loss(loc_t, conf, loc_t, labels)
        assert out2["loss_loc"] < out["loss_loc"] + 1e-6


class TestRasterizeTriangles:
    def test_buffers(self):
        from synergynet_tpu.render import rasterize_triangles
        verts = np.array([[2, 2, 5], [20, 2, 5], [2, 20, 5],
                          [4, 4, -5], [22, 4, -5], [4, 22, -5]], np.float32)
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        tid, z, w0 = rasterize_triangles(
            jnp.asarray(verts), jnp.asarray(tris), h=24, w=24,
            win_h=32, win_w=32)
        tid = np.asarray(tid)
        z = np.asarray(z)
        assert tid[5, 5] == 0 and z[5, 5] == pytest.approx(5.0, abs=1e-4)
        assert (tid == -1).any() and (tid == 1).any()
        w0 = np.asarray(w0)
        drawn = tid >= 0
        assert (w0[drawn] >= -1e-5).all() and (w0[drawn] <= 1 + 1e-5).all()


class TestDetectorTrainer:
    def test_loss_decreases(self):
        """A few dozen steps on the synthetic bright-box data must reduce
        the multibox loss."""
        from synergynet_tpu.detect import DetectorTrainer
        tr = DetectorTrainer(image_size=(128, 128), lr=5e-3)
        hist = tr.fit_synthetic(steps=30, batch=8, seed=0)
        first = np.mean([h["loss_total"] for h in hist[:5]])
        last = np.mean([h["loss_total"] for h in hist[-5:]])
        assert np.isfinite(last)
        assert last < first

    def test_trained_detector_fires_on_box(self):
        """After training, the detector should score a bright box region
        higher than background (sanity, not accuracy)."""
        import jax.numpy as jnp
        from synergynet_tpu.detect import DetectorTrainer
        from synergynet_tpu.detect.trainer import (
            make_synthetic_detection_batch)
        tr = DetectorTrainer(image_size=(128, 128), lr=5e-3)
        tr.fit_synthetic(steps=40, batch=8, seed=1)
        rng = np.random.default_rng(99)
        b = make_synthetic_detection_batch(rng, 1, (128, 128), max_faces=1)
        import jax
        loc, conf = tr.net.apply(tr.variables, jnp.asarray(b["images"]),
                                 train=False)
        scores = np.asarray(jax.nn.softmax(conf[0], -1)[:, 1])
        assert np.isfinite(scores).all()
        assert scores.max() > scores.mean()
