"""Evaluation math vs per-sample reference-style oracles."""

from math import sqrt

import numpy as np

from synergynet_tpu.evals import (
    calc_nme, analyze_by_yaw, format_nme_report, foe_mae, format_foe_report,
)


def _oracle_nme_single(fit, gt, roi):
    """Reference benchmark_aflw2000.py:107-139 single-sample."""
    fit = fit.copy().astype(np.float64)[:2]
    sx, sy, ex, ey = roi
    fit[0, :] = fit[0, :] * ((ex - sx) / 120) + sx
    fit[1, :] = fit[1, :] * ((ey - sy) / 120) + sy
    minx, maxx = gt[0].min(), gt[0].max()
    miny, maxy = gt[1].min(), gt[1].max()
    llength = sqrt((maxx - minx) * (maxy - miny))
    dis = np.mean(np.sqrt(((fit - gt[:2]) ** 2).sum(0)))
    return dis / llength


class TestNME:
    def test_matches_oracle(self, rng):
        n = 7
        fit = rng.normal(60, 20, (n, 3, 68))
        gt = rng.normal(200, 50, (n, 2, 68))
        roi = np.stack([
            rng.uniform(0, 50, n), rng.uniform(0, 50, n),
            rng.uniform(150, 300, n), rng.uniform(150, 300, n)], axis=1)
        got = calc_nme(fit, gt, roi)
        for i in range(n):
            want = _oracle_nme_single(fit[i], gt[i], roi[i])
            np.testing.assert_allclose(got[i], want, rtol=1e-5)

    def test_perfect_prediction_zero(self, rng):
        gt = rng.normal(200, 50, (3, 2, 68))
        roi = np.tile([0., 0., 240., 240.], (3, 1))
        # crop-space fit that maps exactly onto gt
        fit = gt / 2.0
        got = calc_nme(fit, gt, roi)
        np.testing.assert_allclose(got, 0, atol=1e-9)

    def test_yaw_bins(self):
        nme = np.array([.01, .02, .03, .04, .05, .06], np.float32)
        yaws = np.array([10, -20, 45, -50, 70, -80])
        a = analyze_by_yaw(nme, yaws)
        np.testing.assert_allclose(a["[ 0, 30]"]["mean"], 1.5)
        np.testing.assert_allclose(a["[30, 60]"]["mean"], 3.5)
        np.testing.assert_allclose(a["[60, 90]"]["mean"], 5.5)
        np.testing.assert_allclose(a["mean_of_means"], 3.5)
        assert a["[ 0, 30]"]["count"] == 2

    def test_report_format(self):
        a = analyze_by_yaw(np.full(6, .034, np.float32),
                           np.array([10, 20, 40, 50, 70, 80]))
        s = format_nme_report(a)
        assert "[ 0, 30]\tMean: 3.400" in s
        assert "[ 0, 90]\tMean: 3.400" in s


class TestFOE:
    def test_swap_and_skip(self):
        pred = np.array([[10., 20., 30.],    # rx, ry, rz
                         [99., 99., 99.],    # to be skipped
                         [1., 2., 3.]])
        gt = np.array([[20., 10., 30.],      # pitch, yaw, roll
                       [2., 1., 3.]])
        r = foe_mae(pred, gt, skip_indices=np.array([1]))
        # after swap pred -> [[20,10,30],[2,1,3]] == gt exactly
        assert r["mae_mean"] == 0.0

    def test_mae_values(self):
        pred = np.array([[0., 0., 0.]])
        gt = np.array([[3., 6., 9.]])        # pitch, yaw, roll
        r = foe_mae(pred, gt)
        assert r["mae_pitch"] == 3.0 and r["mae_yaw"] == 6.0
        assert r["mae_roll"] == 9.0
        np.testing.assert_allclose(r["mae_mean"], 6.0)
        assert "Mean MAE = 6.000" in format_foe_report(r)

    def test_shape_mismatch_raises(self):
        import pytest
        with pytest.raises(ValueError):
            foe_mae(np.zeros((3, 3)), np.zeros((2, 3)))
