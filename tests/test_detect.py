"""Detection stack tests: anchors vs loop oracle, NMS vs sequential greedy
oracle, net shape contract, end-to-end detector on synthetic weights."""

import math
from itertools import product

import numpy as np
import pytest

from synergynet_tpu.detect import (
    FaceBoxesNet, generate_anchors, num_anchors, greedy_nms_mask,
    nms_indices, pairwise_iou,
)
from synergynet_tpu.detect.anchors import STEPS, MIN_SIZES, _DENSE_OFFSETS


def anchors_loop_oracle(img_h, img_w):
    """Literal re-derivation of the reference PriorBox nested loops
    (reference FaceBoxes/utils/prior_box.py:20-48)."""
    anchors = []
    fms = [(math.ceil(img_h / s), math.ceil(img_w / s)) for s in STEPS]
    for k, (fh, fw) in enumerate(fms):
        for i, j in product(range(fh), range(fw)):
            for ms in MIN_SIZES[k]:
                s_kx, s_ky = ms / img_w, ms / img_h
                offs = _DENSE_OFFSETS.get(ms)
                if offs is not None:
                    cxs = [(j + o) * STEPS[k] / img_w for o in offs]
                    cys = [(i + o) * STEPS[k] / img_h for o in offs]
                    for cy, cx in product(cys, cxs):
                        anchors.append([cx, cy, s_kx, s_ky])
                else:
                    cx = (j + 0.5) * STEPS[k] / img_w
                    cy = (i + 0.5) * STEPS[k] / img_h
                    anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, np.float32)


def nms_greedy_oracle(boxes, thresh):
    """Sequential greedy NMS keep-mask on score-sorted boxes (reference
    FaceBoxes/utils/nms/cpu_nms.pyx:17-67 semantics, +1 inclusive areas)."""
    n = len(boxes)
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    keep = np.ones(n, bool)
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if not keep[j]:
                continue
            xx1, yy1 = max(x1[i], x1[j]), max(y1[i], y1[j])
            xx2, yy2 = min(x2[i], x2[j]), min(y2[i], y2[j])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            if inter / (areas[i] + areas[j] - inter) >= thresh:
                keep[j] = False
    return keep


class TestAnchors:
    @pytest.mark.parametrize("hw", [(720, 1088), (256, 320), (100, 130)])
    def test_matches_loop_oracle(self, hw):
        got = generate_anchors(*hw)
        want = anchors_loop_oracle(*hw)
        assert got.shape == want.shape == (num_anchors(*hw), 4)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    def test_cell_layout(self):
        a = generate_anchors(256, 256)
        # first cell of map 1: 16 dense 32-px + 4 dense 64-px + 1 128-px
        assert np.allclose(a[:16, 2] * 256, 32)
        assert np.allclose(a[16:20, 2] * 256, 64)
        assert np.allclose(a[20, 2] * 256, 128)


class TestNMS:
    def test_matches_sequential_oracle(self, rng):
        import jax.numpy as jnp
        for trial in range(5):
            n = 200
            xy = rng.uniform(0, 200, (n, 2))
            wh = rng.uniform(5, 80, (n, 2))
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            scores = np.sort(rng.uniform(0, 1, n))[::-1].astype(np.float32)
            want = nms_greedy_oracle(boxes, 0.3)
            got = np.asarray(greedy_nms_mask(
                jnp.asarray(boxes), jnp.ones(n, bool), 0.3))
            np.testing.assert_array_equal(got, want)

    def test_padding_never_kept_or_suppresses(self, rng):
        import jax.numpy as jnp
        boxes = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                           np.float32)
        valid = jnp.asarray([True, False, True])
        keep = np.asarray(greedy_nms_mask(jnp.asarray(boxes), valid, 0.3))
        assert keep.tolist() == [True, False, True]

    def test_host_api_order(self, rng):
        dets = np.asarray([
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],     # suppressed by first
            [50, 50, 60, 60, 0.95],
        ], np.float32)
        assert nms_indices(dets, 0.3) == [2, 0]

    def test_iou_inclusive_areas(self):
        import jax.numpy as jnp
        b = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])
        assert float(pairwise_iou(b)[0, 0]) == pytest.approx(1.0)


class TestNet:
    def test_output_matches_anchor_count(self):
        import jax
        import jax.numpy as jnp
        h, w = 128, 256
        net = FaceBoxesNet()
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, h, w, 3)), train=False)
        loc, conf = net.apply(variables, jnp.zeros((2, h, w, 3)), train=False)
        a = num_anchors(h, w)
        assert loc.shape == (2, a, 4)
        assert conf.shape == (2, a, 2)


class TestDetector:
    def test_end_to_end_synthetic(self):
        from synergynet_tpu.detect.torch_import import random_init_variables
        from synergynet_tpu.detect.detector import FaceBoxes
        det = FaceBoxes(variables=random_init_variables())
        img = np.random.default_rng(0).integers(
            0, 255, (480, 640, 3), np.uint8)
        out = det(img)
        assert isinstance(out, list)
        for b in out:
            assert len(b) == 5 and b[4] > 0.5

    def test_torch_import_tree_matches(self):
        import jax
        from synergynet_tpu.detect.torch_import import (
            _default_torch_path, convert_torch_state_dict,
            random_init_variables)
        path = _default_torch_path()
        if path is None:
            pytest.skip("no FaceBoxes torch checkpoint available")
        import torch
        sd = torch.load(path, map_location="cpu")
        got = convert_torch_state_dict(sd)
        want = random_init_variables()
        flat_got = {"/".join(map(str, k)): v.shape for k, v in
                    jax.tree_util.tree_flatten_with_path(got)[0]}
        flat_want = {"/".join(map(str, k)): v.shape for k, v in
                     jax.tree_util.tree_flatten_with_path(want)[0]}
        got_keys = {k for k in flat_got}
        want_keys = {k for k in flat_want}
        assert got_keys == want_keys
        for k in want_keys:
            assert flat_got[k] == flat_want[k], k


class TestS2DStem:
    def test_s2d_net_matches_standard(self):
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect.net import (space_to_depth,
                                               variables_to_s2d)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 50, (1, 128, 256, 3)).astype(np.float32))
        net = FaceBoxesNet()
        v = net.init(jax.random.PRNGKey(0), x, train=False)
        loc, conf = net.apply(v, x, train=False)
        net2 = FaceBoxesNet(stem_s2d=True)
        loc2, conf2 = net2.apply(variables_to_s2d(v), space_to_depth(x),
                                 train=False)
        np.testing.assert_allclose(np.asarray(loc), np.asarray(loc2),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(conf), np.asarray(conf2),
                                   atol=2e-4)

    def test_detector_s2d_equals_plain(self):
        """The wrapper gives identical detections with either stem."""
        from synergynet_tpu.detect.torch_import import random_init_variables
        from synergynet_tpu.detect.detector import FaceBoxes
        img = np.random.default_rng(6).integers(
            0, 255, (480, 640, 3), np.uint8)
        v = random_init_variables()
        a = FaceBoxes(variables=v, stem_s2d=False).detect_raw(img)
        b = FaceBoxes(variables=v, stem_s2d=True).detect_raw(img)
        assert a[1] == b[1]
        np.testing.assert_allclose(a[0][:a[1]], b[0][:b[1]], rtol=1e-4,
                                   atol=1e-2)

    def test_s2d8_net_matches_standard(self):
        """The deep-s2d stem (stem_r=8: phase-packed conv1 + shifted-max
        pool, net.py) is exactly the standard folded net."""
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect.net import (fold_bn_variables,
                                               fold_to_s2d8,
                                               space_to_depth)
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.normal(0, 50, (1, 128, 256, 3)).astype(np.float32))
        net = FaceBoxesNet()
        v = net.init(jax.random.PRNGKey(7), x, train=False)
        v["batch_stats"] = jax.tree.map(
            lambda a: a + jnp.asarray(
                np.random.default_rng(8).uniform(0.1, 0.5, a.shape),
                a.dtype),
            v["batch_stats"])
        loc, conf = net.apply(v, x, train=False)
        net8 = FaceBoxesNet(stem_s2d=True, folded=True, stem_r=8)
        v8 = fold_to_s2d8(fold_bn_variables(v))
        loc2, conf2 = net8.apply(v8, space_to_depth(x, 8), train=False)
        np.testing.assert_allclose(np.asarray(loc), np.asarray(loc2),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(conf), np.asarray(conf2),
                                   atol=2e-4)

    def test_detector_s2d8_equals_r4(self):
        from synergynet_tpu.detect.torch_import import random_init_variables
        from synergynet_tpu.detect.detector import FaceBoxes
        img = np.random.default_rng(13).integers(
            0, 255, (480, 640, 3), np.uint8)
        v = random_init_variables()
        a = FaceBoxes(variables=v, stem_r=4).detect_raw(img)
        det8 = FaceBoxes(variables=v, stem_r=8)
        assert det8.stem_r == 8
        b = det8.detect_raw(img)
        assert a[1] == b[1]
        np.testing.assert_allclose(a[0][:a[1]], b[0][:b[1]], rtol=1e-4,
                                   atol=1e-2)

    def test_s2d8_pallas_matches_xla(self):
        """The fused Pallas stem kernel (interpret mode) vs the XLA
        conv + phase-pool oracle, on a slice of the real canvas geometry
        with negative activations in play. Checked BOTH as a single band
        (what _pick_row_band auto-selects at h8=12) and with hb=4 (3
        bands), so the i>0 band-boundary path — top-halo-row recompute
        and the `row > 0 or i > 0` mask — is numerically exercised (at
        the production h8=90 the kernel runs 9+ bands)."""
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect.net import StemS2D8
        from synergynet_tpu.detect.stem_pallas import fused_stem1_s2d8
        rng = np.random.default_rng(14)
        # (B, 90, 136, 192) is the real serving shape but slow in
        # interpret mode; w8=136 matches production, h8=12 is a band-
        # logic-equivalent slice.
        x = jnp.asarray(rng.normal(0, 30, (2, 12, 136, 192))
                        .astype(np.float32))
        stem = StemS2D8()
        v = stem.init(jax.random.PRNGKey(1), x)
        v = jax.tree.map(
            lambda a: a + jnp.asarray(
                np.random.default_rng(15).normal(0, 0.05, a.shape)
                .astype(np.float32)), v)
        ref = stem.apply(v, x, mode="xla")
        got = stem.apply(v, x, mode="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)
        multi = fused_stem1_s2d8(x, v["params"]["kernel"],
                                 v["params"]["bias"], interpret=True, hb=4)
        np.testing.assert_allclose(np.asarray(multi), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    def test_s2d8_pallas_band_fallback(self, monkeypatch):
        """A geometry with no VMEM-sized row band silently takes the XLA
        path under mode="pallas" (the wired fallback CLAUDE.md's kernel
        policy requires) instead of raising at trace time."""
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect import stem_pallas
        from synergynet_tpu.detect.net import StemS2D8
        x = jnp.asarray(np.random.default_rng(16)
                        .normal(0, 30, (1, 8, 24, 192)).astype(np.float32))
        stem = StemS2D8()
        v = stem.init(jax.random.PRNGKey(2), x)
        ref = stem.apply(v, x, mode="xla")
        monkeypatch.setattr(stem_pallas, "_pick_row_band",
                            lambda *a, **k: None)
        got = stem.apply(v, x, mode="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_s2d8_requires_fold(self):
        """stem_r=8 without folding falls back to the r=4 stem (the
        unfolded topology keeps BN ahead of the phase pack)."""
        from synergynet_tpu.detect.torch_import import random_init_variables
        from synergynet_tpu.detect.detector import FaceBoxes
        det = FaceBoxes(variables=random_init_variables(), fold_bn=False,
                        stem_r=8)
        assert det.stem_r == 4
        import jax.numpy as jnp
        import pytest as _pytest
        net8 = FaceBoxesNet(stem_s2d=True, folded=False, stem_r=8)
        with _pytest.raises(ValueError):
            net8.apply({"params": {}}, jnp.zeros((1, 16, 16, 192)),
                       train=False)


class TestSoftNMS:
    """soft_nms vs a faithful simulation of the reference cpu_soft_nms
    (FaceBoxes/utils/nms/cpu_nms.pyx:70-163) — VERDICT round-1 item 8."""

    @staticmethod
    def _random_dets(rng, n=120, spread=160.0):
        xy = rng.uniform(0, spread, (n, 2))
        wh = rng.uniform(8, 60, (n, 2))
        scores = rng.uniform(0.02, 1.0, (n, 1))
        return np.concatenate([xy, xy + wh, scores], 1).astype(np.float32)

    @pytest.mark.parametrize("method", ["hard", "linear", "gaussian"])
    def test_matches_reference_simulation(self, rng, method):
        from synergynet_tpu.detect import soft_nms
        from tests.oracles import oracle_soft_nms
        for trial in range(4):
            dets = self._random_dets(rng)
            got = soft_nms(dets, sigma=0.5, iou_threshold=0.3,
                           score_threshold=0.05, method=method)
            want = oracle_soft_nms(dets, sigma=0.5, nt=0.3,
                                   threshold=0.05, method=method)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_clustered_faces(self, rng):
        """Overlapping clusters: gaussian decay keeps decayed duplicates."""
        from synergynet_tpu.detect import soft_nms
        from tests.oracles import oracle_soft_nms
        centers = rng.uniform(30, 300, (12, 2))
        rows = []
        for c in centers:
            for _ in range(10):
                jit = rng.normal(0, 3, 2)
                wh = rng.uniform(30, 44, 2)
                s = rng.uniform(0.3, 1.0)
                rows.append([*(c + jit - wh / 2), *(c + jit + wh / 2), s])
        dets = np.asarray(rows, np.float32)
        got = soft_nms(dets, method="gaussian", score_threshold=0.01)
        want = oracle_soft_nms(dets, method="gaussian", threshold=0.01)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestCrowdedFrame:
    """>NMS_TOP_K above-threshold candidates must not diverge from the
    reference's top-5000 procedure — VERDICT round-1 item 7."""

    @staticmethod
    def reference_procedure(boxes, scores):
        """Literal tail of reference FaceBoxes/FaceBoxes.py:110-143:
        conf > 0.05, sort desc, top 5000, greedy NMS 0.3, keep 750,
        score > 0.5."""
        inds = scores > 0.05
        b, s = boxes[inds], scores[inds]
        order = np.argsort(-s, kind="stable")[:5000]
        b, s = b[order], s[order]
        keep = nms_greedy_oracle(b.astype(np.float64), 0.3)
        b, s = b[keep][:750], s[keep][:750]
        vis = s > 0.5
        return np.concatenate([b[vis], s[vis, None]], 1)

    def test_3000_candidates_match_reference(self, rng):
        import jax.numpy as jnp
        from synergynet_tpu.detect import select_detections
        from synergynet_tpu.detect.detector import NMS_TOP_K

        # 60 "faces" x 50 anchor candidates each = 3000 above-threshold.
        centers = rng.uniform(50, 900, (60, 2))
        boxes, scores = [], []
        for ci, c in enumerate(centers):
            best = rng.uniform(0.6, 1.0)
            for k in range(50):
                jit = rng.normal(0, 4, 2)
                wh = rng.uniform(36, 52, 2)
                boxes.append([*(c + jit - wh / 2), *(c + jit + wh / 2)])
                # one strong candidate per face, the rest decaying
                scores.append(best if k == 0
                              else rng.uniform(0.06, 0.55))
        boxes = np.asarray(boxes, np.float32)
        scores = np.asarray(scores, np.float32)
        assert (scores > 0.05).sum() > NMS_TOP_K

        want = self.reference_procedure(boxes, scores)

        masked = np.where(scores > 0.05, scores, -1.0).astype(np.float32)
        dets, count = select_detections(
            jnp.asarray(boxes), jnp.asarray(masked), NMS_TOP_K)
        got = np.asarray(dets)[:int(count)]

        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


class TestFoldBN:
    """BN-folded inference net (net.fold_bn_variables) vs the standard
    topology — exact affine algebra, so parity is float-rounding level.
    The wrapper folds by default, so the golden-parity tests in
    test_reference_parity.py exercise the folded path with real weights."""

    def test_folded_net_matches_standard(self):
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect.net import fold_bn_variables

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(0, 50, (1, 128, 256, 3)).astype(np.float32))
        net = FaceBoxesNet()
        v = net.init(jax.random.PRNGKey(3), x, train=False)
        # Perturb BN stats away from init so the fold is non-trivial.
        v = jax.tree.map(lambda a: a, v)
        v["batch_stats"] = jax.tree.map(
            lambda a: a + jnp.asarray(
                np.random.default_rng(4).uniform(0.1, 0.5, a.shape),
                a.dtype),
            v["batch_stats"])
        loc, conf = net.apply(v, x, train=False)
        folded = FaceBoxesNet(folded=True)
        loc2, conf2 = folded.apply(fold_bn_variables(v), x, train=False)
        np.testing.assert_allclose(np.asarray(loc), np.asarray(loc2),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(conf), np.asarray(conf2),
                                   rtol=1e-5, atol=1e-4)

    def test_prefolded_tree_constructor(self):
        """FaceBoxes accepts an already-BN-folded tree (conv bias present,
        no batch_stats) under every stem config, honoring the r8 request
        instead of crashing on a dropped bias (round-5 review), and its
        detections match the raw-tree wrapper's."""
        from synergynet_tpu.detect.detector import FaceBoxes
        from synergynet_tpu.detect.net import fold_bn_variables
        from synergynet_tpu.detect.torch_import import random_init_variables

        raw = random_init_variables(seed=7)
        img = np.random.default_rng(11).integers(
            0, 255, (200, 300, 3), np.uint8)
        ref = FaceBoxes(variables=raw).detect_raw(img)
        for kw in ({"stem_r": 8}, {"stem_r": 4}, {"stem_s2d": False,
                                                  "stem_r": 1}):
            det = FaceBoxes(variables=fold_bn_variables(raw), **kw)
            if kw.get("stem_r") == 8:
                assert det.stem_r == 8        # honored, not downgraded
            got = det.detect_raw(img)
            assert got[1] == ref[1]
            np.testing.assert_allclose(np.asarray(got[0][:got[1]]),
                                       np.asarray(ref[0][:ref[1]]),
                                       rtol=1e-4, atol=1e-2)

    def test_folded_s2d_net_matches(self):
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect.net import (fold_bn_variables,
                                               space_to_depth,
                                               variables_to_s2d)
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.normal(0, 50, (1, 128, 256, 3)).astype(np.float32))
        net = FaceBoxesNet()
        v = net.init(jax.random.PRNGKey(5), x, train=False)
        loc, conf = net.apply(v, x, train=False)
        folded = FaceBoxesNet(stem_s2d=True, folded=True)
        v2 = fold_bn_variables(variables_to_s2d(v))
        loc2, conf2 = folded.apply(v2, space_to_depth(x), train=False)
        np.testing.assert_allclose(np.asarray(loc), np.asarray(loc2),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(conf), np.asarray(conf2),
                                   atol=2e-4)

    def test_detector_folded_equals_unfolded(self):
        from synergynet_tpu.detect.torch_import import random_init_variables
        from synergynet_tpu.detect.detector import FaceBoxes
        img = np.random.default_rng(11).integers(
            0, 255, (480, 640, 3), np.uint8)
        v = random_init_variables()
        a = FaceBoxes(variables=v, fold_bn=False).detect_raw(img)
        b = FaceBoxes(variables=v, fold_bn=True).detect_raw(img)
        assert a[1] == b[1]
        np.testing.assert_allclose(a[0][:a[1]], b[0][:b[1]], rtol=1e-4,
                                   atol=1e-2)

    def test_folded_train_mode_raises(self):
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.detect.net import fold_bn_variables
        net = FaceBoxesNet()
        x = jnp.zeros((1, 128, 128, 3))
        v = net.init(jax.random.PRNGKey(0), x, train=False)
        folded = FaceBoxesNet(folded=True)
        with pytest.raises(ValueError):
            folded.apply(fold_bn_variables(v), x, train=True,
                         mutable=["batch_stats"])
