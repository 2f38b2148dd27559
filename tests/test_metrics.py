"""Metric tests: PSNR math vs hand computation, Bjøntegaard sanity
(SURVEY.md §4: metric cross-validation is the reference's main QA)."""

import numpy as np
import pytest

from lcpcga_tpu.eval.bjontegaard import BjontegaardModel, bd_psnr, bd_rate
from lcpcga_tpu.eval.metrics import PointCloudMetric, rgb_to_yuv_uint8


def test_identical_clouds_perfect():
    rng = np.random.default_rng(0)
    pts = np.unique(rng.integers(0, 100, (500, 3)), axis=0).astype(np.float64)
    cols = rng.random((pts.shape[0], 3))
    m = PointCloudMetric(pts, cols, pts, cols)
    res, _ = m.compute_pointcloud_metrics()
    assert res["sym_mse"] == 0.0
    assert res["sym_psnr_mse"] > 100
    assert res["sym_y_psnr"] > 100  # same colors after 8-bit rounding


def test_known_offset_psnr():
    """Single-axis offset of 1: per-axis-mean MSE = 1/3 (reference quirk)."""
    pts = np.stack([np.arange(100) * 5, np.zeros(100), np.zeros(100)], axis=1).astype(float)
    cols = np.full((100, 3), 0.5)
    shifted = pts.copy()
    shifted[:, 1] += 1.0
    m = PointCloudMetric(pts, cols, shifted, cols, resolution=1023)
    res, _ = m.compute_pointcloud_metrics()
    np.testing.assert_allclose(res["AB_mse"], 1.0 / 3.0, rtol=1e-9)
    np.testing.assert_allclose(
        res["AB_psnr_mse"], 10 * np.log10(1023**2 * 3), rtol=1e-9
    )
    # Symmetric = min of directions (reference contract)
    assert res["sym_psnr_mse"] == min(res["AB_psnr_mse"], res["BA_psnr_mse"])


def test_color_psnr_brute():
    rng = np.random.default_rng(1)
    pts = np.unique(rng.integers(0, 64, (300, 3)), axis=0).astype(float)
    c1 = rng.random((pts.shape[0], 3))
    c2 = np.clip(c1 + rng.normal(0, 0.05, c1.shape), 0, 1)
    m = PointCloudMetric(pts, c1, pts, c2)
    res, _ = m.compute_pointcloud_metrics()
    yuv1 = rgb_to_yuv_uint8(c1)
    yuv2 = rgb_to_yuv_uint8(c2)
    expect = ((yuv1[:, 0] - yuv2[:, 0]) ** 2).mean()
    np.testing.assert_allclose(res["AB_y_mse"], expect, rtol=1e-9)


def test_duplicate_color_averaging():
    """A source point equidistant to two recon points averages their colors."""
    src = np.array([[10.0, 0.0, 0.0]])
    src_c = np.array([[0.5, 0.5, 0.5]])
    rec = np.array([[9.0, 0.0, 0.0], [11.0, 0.0, 0.0]])
    rec_c = np.array([[0.2, 0.2, 0.2], [0.8, 0.8, 0.8]])
    m = PointCloudMetric(src, src_c, rec, rec_c)
    res, _ = m.compute_pointcloud_metrics(drop_duplicates=False)
    # averaged color = (first + (c1 + c2)) / 3 with reference's n+1 rule
    # first occurrence is one of the two; avg = (c_first + 0.2 + 0.8)/3
    yuv_src = rgb_to_yuv_uint8(src_c)
    got_mse = res["AB_y_mse"]
    for first in (0.2, 0.8):
        avg = (first + 1.0) / 3
        yuv_avg = rgb_to_yuv_uint8(np.array([[avg] * 3]))
        if np.isclose(got_mse, ((yuv_src[0, 0] - yuv_avg[0, 0]) ** 2), rtol=1e-6):
            break
    else:
        pytest.fail(f"unexpected duplicate-averaged mse {got_mse}")


def test_bd_identical_zero():
    rates = [100, 200, 400, 800]
    psnr = [30, 33, 36, 38]
    assert abs(bd_psnr(rates, psnr, rates, psnr)) < 1e-9
    assert abs(bd_rate(rates, psnr, rates, psnr)) < 1e-9


def test_bd_shifted():
    rates = [100, 200, 400, 800]
    psnr = np.array([30.0, 33.0, 36.0, 38.0])
    up = psnr + 1.0
    assert abs(bd_psnr(rates, psnr, rates, up) - 1.0) < 1e-6
    # doubling rate at same psnr => +100% bd-rate
    r2 = [r * 2 for r in rates]
    assert abs(bd_rate(rates, psnr, r2, psnr) - 100.0) < 1e-6
    assert abs(bd_rate(r2, psnr, rates, psnr) + 50.0) < 1e-6


def test_bd_model_interpolation():
    rates = [100, 200, 400, 800]
    psnr = [30, 33, 36, 38]
    m = BjontegaardModel(rates, psnr)
    np.testing.assert_allclose(m.psnr_at(200), 33, atol=1e-6)
    np.testing.assert_allclose(m.rate_at(36), 400, rtol=1e-6)
