"""Bjøntegaard-delta rate/PSNR via cubic fits in log-rate space.

Fresh implementation of the standard BD metric (VCEG-M33), API-parallel
to /root/reference/metrics/bjontegaard.py (Bjontegaard_Model /
Bjontegaard_Delta): fit PSNR(log10 rate) with a cubic, integrate both
fits over the overlapping interval; BD-rate inverts the fit axes.
"""

from __future__ import annotations

import numpy as np


class BjontegaardModel:
    """Cubic RD model over one curve (rates in any consistent unit)."""

    def __init__(self, rates, psnrs):
        self.log_rates = np.log10(np.asarray(rates, np.float64))
        self.psnrs = np.asarray(psnrs, np.float64)
        self.p_of_r = np.polynomial.polynomial.polyfit(self.log_rates, self.psnrs, 3)
        self.r_of_p = np.polynomial.polynomial.polyfit(self.psnrs, self.log_rates, 3)

    def psnr_at(self, rate):
        return np.polynomial.polynomial.polyval(np.log10(rate), self.p_of_r)

    def rate_at(self, psnr):
        return 10 ** np.polynomial.polynomial.polyval(psnr, self.r_of_p)


def _integral(coeffs, lo, hi):
    ic = np.polynomial.polynomial.polyint(coeffs)
    return np.polynomial.polynomial.polyval(hi, ic) - np.polynomial.polynomial.polyval(lo, ic)


def bd_psnr(rates_anchor, psnr_anchor, rates_test, psnr_test) -> float:
    """Average PSNR gain (dB) of test over anchor at equal rate."""
    a = BjontegaardModel(rates_anchor, psnr_anchor)
    t = BjontegaardModel(rates_test, psnr_test)
    lo = max(a.log_rates.min(), t.log_rates.min())
    hi = min(a.log_rates.max(), t.log_rates.max())
    if hi <= lo:
        return float("nan")
    return float((_integral(t.p_of_r, lo, hi) - _integral(a.p_of_r, lo, hi)) / (hi - lo))


def bd_rate(rates_anchor, psnr_anchor, rates_test, psnr_test) -> float:
    """Average rate difference (%) of test vs anchor at equal PSNR
    (negative = bitrate savings)."""
    a = BjontegaardModel(rates_anchor, psnr_anchor)
    t = BjontegaardModel(rates_test, psnr_test)
    lo = max(np.min(psnr_anchor), np.min(psnr_test))
    hi = min(np.max(psnr_anchor), np.max(psnr_test))
    if hi <= lo:
        return float("nan")
    diff = (_integral(t.r_of_p, lo, hi) - _integral(a.r_of_p, lo, hi)) / (hi - lo)
    return float((10**diff - 1.0) * 100.0)
