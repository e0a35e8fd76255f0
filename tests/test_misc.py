"""Soft-NMS, profiling utilities, viz dump, schedule parity tests."""

import os

import numpy as np
import pytest


class TestSoftNMS:
    def test_hard_method_matches_greedy(self, rng):
        from synergynet_tpu.detect import soft_nms, nms_indices
        n = 80
        xy = rng.uniform(0, 100, (n, 2))
        wh = rng.uniform(10, 50, (n, 2))
        dets = np.concatenate(
            [xy, xy + wh, rng.uniform(0.2, 1, (n, 1))], 1).astype(np.float32)
        hard = soft_nms(dets, method="hard", iou_threshold=0.3,
                        score_threshold=1e-6)
        want = dets[nms_indices(dets, 0.3)]
        np.testing.assert_allclose(hard[:, :4], want[:, :4], atol=1e-5)

    def test_gaussian_decays_but_keeps(self):
        from synergynet_tpu.detect import soft_nms
        dets = np.asarray([[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8]],
                          np.float32)
        out = soft_nms(dets, method="gaussian", score_threshold=1e-4)
        assert len(out) == 2
        assert out[1, 4] < 0.8          # decayed, not suppressed


class TestProfiling:
    def test_stage_timer(self):
        import time
        from synergynet_tpu.core import StageTimer
        t = StageTimer(sync=False)
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            time.sleep(0.01)
        assert t.counts["a"] == 2
        assert t.totals["a"] >= 0.02
        assert "a:" in t.report()

    def test_measure(self):
        import jax
        import jax.numpy as jnp
        from synergynet_tpu.core import measure
        f = jax.jit(lambda x: x * 2 + 1)
        r = measure(f, jnp.ones((8, 8)), iters=5)
        assert r["sec_per_call"] > 0 and r["calls_per_sec"] > 0

    def test_annotate_and_memory_stats(self):
        from synergynet_tpu.core import annotate, device_memory_stats
        with annotate("test-span"):
            pass
        assert isinstance(device_memory_stats(), dict)


class TestEvaluateVizDump:
    def test_dump_viz(self, tmp_path):
        from synergynet_tpu.cli.evaluate import main
        out = str(tmp_path / "viz")
        main(["-n", "8", "--batch-size", "8", "--dump-viz", out])
        files = os.listdir(out)
        assert len(files) == 8


class TestSchedule:
    def test_reference_lr_rule(self):
        """Epoch-indexed factors replicate main_train.py:74-94: damped
        during warmup, base until milestone 1, then 0.2^i."""
        from synergynet_tpu.train import step_decay_lr
        fn = step_decay_lr(base_lr=0.08, milestones=(48, 64), warmup=5)
        import numpy as np
        assert float(fn(1)) == pytest.approx(0.08 * 0.2)
        assert float(fn(5)) == pytest.approx(0.08 * 0.2)
        assert float(fn(6)) == pytest.approx(0.08)
        assert float(fn(48)) == pytest.approx(0.08)
        assert float(fn(49)) == pytest.approx(0.08 * 0.2)
        assert float(fn(64)) == pytest.approx(0.08 * 0.2)
        assert float(fn(65)) == pytest.approx(0.08 * 0.04)
