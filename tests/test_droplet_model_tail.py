"""The adjoint convergence certificate closes geometric tails exactly.

benchmarks/droplet_model.py stops its vjp-propagation loop once the
geometric-tail closure of every partial Gram sum is negligible
(_tail_extrapolation); here the fit is pinned on synthetic series with
a known ratio and the certified stop's soundness condition is checked
(tail fraction honest for decaying series, no certificate for growing
or non-geometric increments).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

from droplet_model import _tail_extrapolation, closed_covariance  # noqa: E402


def geometric_hist(r, n=12, a=1.0):
    """Partial sums of a*r^k (k=0..), shaped like diag_hist rows."""
    inc = a * r ** np.arange(n)
    return np.cumsum(inc)[:, None]


def test_recovers_ratio_and_tail():
    r = 0.62
    hist = geometric_hist(r)
    ext = _tail_extrapolation(hist)
    np.testing.assert_allclose(ext["ratio"][0], r, rtol=1e-12)
    # closed tail equals the true remainder of the series
    true_total = 1.0 / (1.0 - r)
    np.testing.assert_allclose(hist[-1, 0] + ext["tail"][0], true_total,
                               rtol=1e-12)


def test_tail_frac_drives_certified_stop():
    hist = geometric_hist(0.3, n=20)
    ext = _tail_extrapolation(hist)
    assert ext["tail_frac"][0] < 1e-9  # long-converged series certifies


def test_growing_series_never_certifies():
    hist = geometric_hist(1.3, n=10)  # increments still growing
    ext = _tail_extrapolation(hist)
    assert ext["ratio"][0] > 1.0
    assert ext["tail"][0] == 0.0  # closure refused (r >= 1)


def test_short_history_returns_none():
    assert _tail_extrapolation(geometric_hist(0.5, n=3)) is None


def test_per_observable_columns_independent():
    h1 = geometric_hist(0.5)
    h2 = geometric_hist(0.9)
    hist = np.concatenate([h1, h2], axis=1)
    ext = _tail_extrapolation(hist)
    np.testing.assert_allclose(ext["ratio"], [0.5, 0.9], rtol=1e-12)
    assert ext["tail_frac"][1] > ext["tail_frac"][0]


def _rank1_series(r, n, v):
    """Partial sums of the matrix series v v^T * r^k — the dominant-mode
    model closed_covariance's matrix closure is exact for."""
    I0 = np.outer(v, v)
    C = np.zeros_like(I0)
    hist = []
    last = None
    for k in range(n):
        last = I0 * r ** k
        C += last
        hist.append(np.diag(C).copy())
    return C, last, np.asarray(hist), I0 / (1.0 - r)


def test_closed_covariance_matrix_mode_exact_for_rank1():
    v = np.array([1.0, -0.5, 2.0])
    C, last, hist, true_total = _rank1_series(0.7, 14, v)
    d = {"C": C, "diag_hist": hist, "C_inc_last": last}
    Cc, info = closed_covariance(d)
    assert info["mode"] == "matrix"
    np.testing.assert_allclose(Cc, true_total, rtol=1e-9)


def test_closed_covariance_diag_scale_fallback():
    v = np.array([1.0, -0.5, 2.0])
    C, last, hist, true_total = _rank1_series(0.7, 14, v)
    d = {"C": C, "diag_hist": hist}      # no increment matrix saved
    Cc, info = closed_covariance(d)
    assert info["mode"] == "diag_scale"
    # diagonal matches the extrapolated diagonal exactly; for the
    # rank-1 dominant mode that IS the true total
    np.testing.assert_allclose(np.diag(Cc), np.diag(true_total),
                               rtol=1e-9)
    # PSD preserved
    assert np.linalg.eigvalsh(Cc).min() > -1e-12


def test_closed_covariance_no_history_passthrough():
    C = np.eye(2)
    Cc, info = closed_covariance({"C": C})
    assert info is None
    np.testing.assert_allclose(Cc, C)


def test_msd_plateau_extrapolation_recovers_limit():
    """msd_model._plateau closes an exponential approach
    inc_j = A - B r^j to the true limit A (the Brownian plateau)."""
    from msd_model import _plateau
    A, B, r = 4.2e-6, 2.0e-6, 0.99
    j = np.arange(400)          # stop while the tail is still rising
    series = (A - B * r ** j)[:, None] * np.ones((1, 3))
    Dw, Dx = _plateau(series, W=100)
    # window mean is biased low; the extrapolation closes it
    assert abs(Dw[0] - A / 2) / (A / 2) > 2e-3
    np.testing.assert_allclose(Dx, A / 2, rtol=1e-4)
