"""Image PSNR / SSIM (numpy; no scikit-image in the environment).

Used by the view-dependent evaluation the reference scores with
skimage (/root/reference/evaluate_view_dep.py:195-296). SSIM follows
Wang et al. 2004 with skimage-compatible defaults (gaussian window
sigma 1.5, truncated at 3.5 sigma, K1=0.01, K2=0.03).
"""

from __future__ import annotations

import numpy as np


def rgb2yuv_image(img: np.ndarray) -> np.ndarray:
    """float [0,1] HxWx3 RGB -> YUV (skimage convention: U,V centered at 0)."""
    m = np.array(
        [
            [0.299, 0.587, 0.114],
            [-0.14714119, -0.28886916, 0.43601035],
            [0.61497538, -0.51496512, -0.10001026],
        ]
    )
    return img @ m.T


def psnr(ref: np.ndarray, test: np.ndarray, data_range: float = 1.0) -> float:
    mse = np.mean((ref.astype(np.float64) - test.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(data_range**2 / mse))


def _gaussian_kernel(sigma: float = 1.5, truncate: float = 3.5) -> np.ndarray:
    r = int(truncate * sigma + 0.5)
    x = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _filter2(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 2D convolution with reflect padding."""
    r = len(k) // 2
    p = np.pad(img, ((r, r), (r, r)), mode="reflect")
    p = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 0, p)
    p = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 1, p)
    return p


def ssim(ref: np.ndarray, test: np.ndarray, data_range: float = 1.0,
         channel_axis: int | None = None, sigma: float = 1.5) -> float:
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    if channel_axis is not None:
        chans = ref.shape[channel_axis]
        vals = [
            ssim(np.take(ref, c, channel_axis), np.take(test, c, channel_axis),
                 data_range=data_range, sigma=sigma)
            for c in range(chans)
        ]
        return float(np.mean(vals))

    k = _gaussian_kernel(sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x = _filter2(ref, k)
    mu_y = _filter2(test, k)
    xx = _filter2(ref * ref, k) - mu_x**2
    yy = _filter2(test * test, k) - mu_y**2
    xy = _filter2(ref * test, k) - mu_x * mu_y
    # sample-variance correction (skimage use_sample_covariance=True, win=2r+1)
    npts = (2 * int(3.5 * sigma + 0.5) + 1) ** 2
    cov_norm = npts / (npts - 1)
    xx, yy, xy = cov_norm * xx, cov_norm * yy, cov_norm * xy
    s = ((2 * mu_x * mu_y + c1) * (2 * xy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (xx + yy + c2)
    )
    pad = len(k) // 2
    return float(s[pad:-pad, pad:-pad].mean())
