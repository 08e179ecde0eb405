"""Bjontegaard-delta metrics for comparing RD curves.

Used to hold the rebuild to the "within 0.5% BD-rate of reference"
north star (BASELINE.md).  Standard cubic polynomial fit in
(log-rate, quality) with trapezoidal integration over the overlapping
quality interval.
"""

from __future__ import annotations

import numpy as np


def _fit_and_integrate(x, y, lo, hi):
    # cubic with >=4 points (the standard BD fit); degrade gracefully for
    # short curves (2-point curves -> linear interpolation)
    deg = min(3, len(np.asarray(x)) - 1)
    if deg < 1:
        raise ValueError("need at least 2 rate points")
    p = np.polyfit(x, y, deg)
    pi = np.polyint(p)
    return np.polyval(pi, hi) - np.polyval(pi, lo)


def bd_rate(rate_anchor, q_anchor, rate_test, q_test) -> float:
    """BD-rate in percent (negative = the test codec saves rate)."""
    la = np.log(np.asarray(rate_anchor, np.float64))
    lt = np.log(np.asarray(rate_test, np.float64))
    qa = np.asarray(q_anchor, np.float64)
    qt = np.asarray(q_test, np.float64)
    lo = max(qa.min(), qt.min())
    hi = min(qa.max(), qt.max())
    if hi <= lo:
        raise ValueError("quality ranges do not overlap")
    ia = _fit_and_integrate(qa, la, lo, hi)
    it = _fit_and_integrate(qt, lt, lo, hi)
    return float((np.exp((it - ia) / (hi - lo)) - 1.0) * 100.0)


def bd_quality(rate_anchor, q_anchor, rate_test, q_test) -> float:
    """BD-PSNR/-quality: average quality gain at equal rate."""
    la = np.log(np.asarray(rate_anchor, np.float64))
    lt = np.log(np.asarray(rate_test, np.float64))
    qa = np.asarray(q_anchor, np.float64)
    qt = np.asarray(q_test, np.float64)
    lo = max(la.min(), lt.min())
    hi = min(la.max(), lt.max())
    if hi <= lo:
        raise ValueError("rate ranges do not overlap")
    ia = _fit_and_integrate(la, qa, lo, hi)
    it = _fit_and_integrate(lt, qt, lo, hi)
    return float((it - ia) / (hi - lo))
