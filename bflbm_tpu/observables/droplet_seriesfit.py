"""The reference's series-Jacobian droplet fitter, ported.

``fittingDropletParams`` (LBM_hydrovs.H:117-213) fits the droplet tanh
profile rho ~ C0/2 (1 + tanh((R - r)/sqrt(2W))) by a damped
semi-implicit gradient flow on the least-squares mismatch, whose
gradient ("mismatch integrals" MfWn/MfRn vs "self" integrals KWn/KRn)
and Jacobian (JRn_Rn/JRn_Wn/JWn_Rn/JWn_Wn) are evaluated with the
closed-form series expansions of ``externlib.H:22-406`` (the Taylor
series of 1/cosh^2 and 1/cosh^4 moments, cross-verified against
scipy.integrate.quad in ``CodingNote_integral_verification.py``).

This is a mathematical transcription of those verified formulas into
numpy (cited per function); the field integrals use the reference's
trapezoid weight tensor (AMReX_Analysis.H:47-156) and its box-unit
coordinate convention ([0,1]^3, cell centers (i+1/2)/n).

Note the production pinned radii (Surface_Tension.ipynb cell 9) come
from the notebook's scipy cloud fit (`droplet.fit_droplet_allcells`),
not from this fitter; this port completes the C++ analysis surface.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

_N_TERMS = 20  # NumOfTerms in the reference (series truncation)


def _coef_s(n_terms: int = _N_TERMS) -> np.ndarray:
    """Taylor coefficients S_k of 1/cosh^4 x = sum_k S_k x^{2k}
    (getCoefS, externlib.H; built from the sech-series A_2k as in
    CodingNote_integral_verification.py)."""
    a = np.zeros(n_terms + 1)
    a[0] = 1.0
    for k in range(1, n_terms + 1):
        a[k] = -sum(a[kp] * math.comb(2 * k, 2 * kp) for kp in range(k))
    ap = np.array([a[k] / math.factorial(2 * k)
                   for k in range(n_terms + 1)])
    s = np.zeros(n_terms + 1)
    for k in range(n_terms + 1):
        acc = 0.0
        for k1 in range(k + 1):
            for k2 in range(k + 1 - k1):
                for k3 in range(k + 1 - k1 - k2):
                    k4 = k - k1 - k2 - k3
                    acc += ap[k1] * ap[k2] * ap[k3] * ap[k4]
        s[k] = acc
    return s


_S_ARRAY = _coef_s()


def _integral_func1(n: int, a: float, big_n: int = 100) -> float:
    """integral_func1_series (externlib.H:279-297); n in {2, 3}."""
    if n == 3:
        ks = np.arange(1, big_n + 1, dtype=float)
        sgn = np.where(ks % 2 == 1, 1.0, -1.0)
        v1 = float(np.sum(sgn / ks ** 2 * np.exp(-2 * ks * a)))
        v2 = float(np.sum(sgn / ks ** 2))
        return 1.5 * v1 - 3.0 * v2 - 3.0 * a * a
    return -a - math.log(2.0) - math.log(math.cosh(a))


def _integral_func3(n: int, c: float, big_n: int = 50) -> float:
    """integral_func3_series (externlib.H:264-277); n in {2, 3}."""
    ks = np.arange(1, big_n + 1, dtype=float)
    alt = np.where(ks % 2 == 1, 1.0, -1.0)   # (-1)^(k+1)
    if n == 3:
        val = float(np.sum(
            6.0 * alt * (c / ks ** 2 + 0.25 / ks ** 3
                         * np.exp(-2 * ks * c))))
    else:
        val = float(np.sum(-alt * np.exp(-2 * ks * c) / ks ** 2
                           + alt * 2.0 / ks ** 2))
    return val + 2.0 * c ** n


def _integral_func2(n: int, d: float, c: float,
                    delta: float = None) -> float:
    """integral_func2_series (externlib.H:110-162): the x^n moment of
    1/cosh^4(d x - c) over [0, inf), split at c/d +- delta into the
    exponential tail series and the Taylor window series."""
    if delta is None:
        delta = 1.0 / d
    s_arr = _S_ARRAY
    ratio = c / d
    total = 0.0
    for k in range(len(s_arr)):
        ex = (2 * k + 4) * d
        i1 = 1.0 / ex
        i2, i3, i4, i5 = i1 ** 2, i1 ** 3, i1 ** 4, i1 ** 5
        ed = math.exp(-ex * delta)
        ec = math.exp(-(2 * k + 4) * c)
        if n == 4:
            t1 = (i1 * (ratio - delta) ** 4 - 4 * i2 * (ratio - delta) ** 3
                  + 12 * i3 * (ratio - delta) ** 2
                  - 24 * i4 * (ratio - delta) + 24 * i5) * ed - 24 * i5 * ec
            t2 = (i1 * (ratio + delta) ** 4 + 4 * i2 * (ratio + delta) ** 3
                  + 12 * i3 * (ratio + delta) ** 2
                  + 24 * i4 * (ratio + delta) + 24 * i5) * ed
        elif n == 3:
            t1 = (i1 * (ratio - delta) ** 3 - 3 * i2 * (ratio - delta) ** 2
                  + 6 * i3 * (ratio - delta) - 6 * i4) * ed + 6 * i4 * ec
            t2 = (i1 * (ratio + delta) ** 3 + 3 * i2 * (ratio + delta) ** 2
                  + 6 * i3 * (ratio + delta) + 6 * i4) * ed
        elif n == 2:
            t1 = (i1 * (ratio - delta) ** 2 - 2 * i2 * (ratio - delta)
                  + 2 * i3) * ed - 2 * i3 * ec
            t2 = (i1 * (ratio + delta) ** 2 + 2 * i2 * (ratio + delta)
                  + 2 * i3) * ed
        else:
            raise ValueError("n must be 2, 3 or 4")
        sgn = 1.0 if k % 2 == 0 else -1.0
        total += sgn * (16.0 / 6.0) * (k + 1) * (k + 2) * (k + 3) * (t1 + t2)
        # Taylor window [c/d - delta, c/d + delta]
        val_n = 0.0
        for l in range(n + 1):
            tmp = delta ** (2 * k + l + 1) - (-delta) ** (2 * k + l + 1)
            val_n += (math.comb(n, l) * ratio ** (n - l)
                      * tmp / (2 * k + l + 1))
        total += s_arr[k] * d ** (2 * k) * val_n
    return total


def _k_wn(w: float, r: float) -> float:
    """KWn (externlib.H:345-356)."""
    sw = math.sqrt(w)
    s2w = math.sqrt(2.0 * w)
    c = r / s2w
    factor = math.sqrt(2.0) * math.pi / sw ** 3
    return factor * (r * s2w ** 3 * _integral_func3(2, c)
                     - 4.0 * w * w * _integral_func3(3, c)
                     + r * s2w ** 3 * _integral_func1(2, c)
                     - 4.0 * w * w * _integral_func1(3, c))


def _k_rn(w: float, r: float) -> float:
    """KRn (externlib.H:358-367)."""
    s2w = math.sqrt(2.0 * w)
    c = r / s2w
    return 4.0 * math.pi * 2.0 * w * (
        _integral_func3(2, c) + _integral_func1(2, c))


def _jacobian(w: float, r: float, eta_w: float, eta_r: float,
              dt: float, c0: float) -> Tuple[float, float, float, float]:
    """(JRn_Rn, JRn_Wn, JWn_Rn, JWn_Wn) (externlib.H:200-246)."""
    c = r / math.sqrt(2.0 * w)
    i2 = _integral_func2(2, 1.0, c)
    i3 = _integral_func2(3, 1.0, c)
    i4 = _integral_func2(4, 1.0, c)
    s2w = math.sqrt(2.0 * w)
    j_rn_rn = -c0 * eta_r * dt * s2w * math.pi * i2
    j_rn_wn = (c0 * 0.25 * eta_r * dt * math.pi / (w * w)
               * (r * 2.0 * w * s2w * i2 - 4.0 * w * w * i3))
    j_wn_rn = (c0 * 0.25 * eta_w * dt
               * (2.0 * math.sqrt(2.0) * math.pi * r / math.sqrt(w) * i2
                  - 4.0 * math.pi * i3))
    j_wn_wn = (-c0 * 0.125 * eta_w * dt * math.pi / w ** 3
               * (s2w ** 3 * r * r * i2 + s2w ** 5 * i4
                  - 2.0 * r * s2w ** 4 * i3))
    return j_rn_rn, j_rn_wn, j_wn_rn, j_wn_wn


def trapezoid_weights(shape) -> np.ndarray:
    """The reference's 3D trapezoid weight tensor
    (AMReX_Analysis.H:47-156: 1/2 faces, 1/4 edges, 1/8 corners)."""
    wt = np.ones(shape)
    for ax in range(3):
        sl = [slice(None)] * 3
        sl[ax] = 0
        wt[tuple(sl)] *= 0.5
        sl[ax] = -1
        wt[tuple(sl)] *= 0.5
    return wt


def _field_integrals(rho: np.ndarray, w: float, r: float,
                     r0: np.ndarray, wt: np.ndarray
                     ) -> Tuple[float, float]:
    """(MfWn, MfRn): mismatch integrals of the field against the profile
    derivative kernels (externlib.H:250-342), box units."""
    shape = rho.shape
    s2w = math.sqrt(2.0 * w)
    coords = [(np.arange(n) + 0.5) / n for n in shape]
    x, y, z = np.meshgrid(*coords, indexing="ij")
    rr = np.sqrt((x - r0[0]) ** 2 + (y - r0[1]) ** 2 + (z - r0[2]) ** 2)
    dist = r - rr
    sech2 = 1.0 / np.cosh(np.clip(dist / s2w, -300, 300)) ** 2
    dv = 1.0 / np.prod(shape)
    mf_wn = float(np.sum(rho * dist * sech2 * wt) * dv) / s2w ** 3
    mf_rn = float(np.sum(rho * sech2 * wt) * dv) / s2w
    return mf_wn, mf_rn


def _com(rho: np.ndarray, wt: np.ndarray) -> np.ndarray:
    shape = rho.shape
    coords = [(np.arange(n) + 0.5) / n for n in shape]
    x, y, z = np.meshgrid(*coords, indexing="ij")
    m = float(np.sum(rho * wt))
    return np.array([float(np.sum(rho * wt * c)) / m for c in (x, y, z)])


def _params_variations(rho, w, r, eta_w, eta_r, dt, c0, r0, wt
                       ) -> Tuple[float, float]:
    """paramsVariations (externlib.H:369-406): semi-implicit update
    (dW, dR) = (1/detD) A B C."""
    j_rr, j_rw, j_wr, j_ww = _jacobian(w, r, eta_w, eta_r, dt, c0)
    mat_a = np.array([[1.0 - j_rr, j_wr], [j_rw, 1.0 - j_ww]])
    mat_b = np.diag([-eta_w * dt, eta_r * dt])
    mf_wn, mf_rn = _field_integrals(rho, w, r, r0, wt)
    vec_c = np.array([mf_wn - 0.5 * _k_wn(w, r),
                      mf_rn - 0.5 * _k_rn(w, r)])
    det_d = (1.0 - j_ww) * (1.0 - j_rr) - j_wr * j_rw
    dwdr = mat_a @ mat_b @ vec_c / det_d
    return float(dwdr[0]), float(dwdr[1])


MIN_LEN_SCALE = 1e-8


def fitting_droplet(rho: np.ndarray, w0: float = 0.02, r0p: float = 0.3,
                    eta_w: float = 0.2, eta_r: float = 0.2,
                    dt: float = 0.02, nstep: int = 400) -> np.ndarray:
    """fittingDroplet (LBM_hydrovs.H:117-163): the raw (W, R) iteration
    trace; rho in box units ([0,1]^3)."""
    wt = trapezoid_weights(rho.shape)
    c0 = float(rho.max() - rho.min())
    r0 = _com(rho, wt)
    trace = np.zeros((nstep, 2))
    w, r = w0, r0p
    trace[0] = (w, r)
    for k in range(1, nstep):
        dw, dr = _params_variations(rho, w, r, eta_w, eta_r, dt, c0,
                                    r0, wt)
        w_new = w + dw
        r = r + dr
        if w_new <= 0:
            dt = dt / 5.0  # reference's retry-with-smaller-step
        else:
            w = w_new
        if abs(w) < MIN_LEN_SCALE:
            w = w0
        trace[k] = (w, r)
    return trace


def fitting_droplet_params(rho: np.ndarray, step_window: int = 30,
                           undul_ratio: float = 0.005, nstep: int = 400,
                           w0: float = 0.02, r0p: float = 0.3,
                           eta_w: float = 0.2, eta_r: float = 0.2,
                           dt: float = 0.02, max_iter: int = 10
                           ) -> Tuple[float, float, float]:
    """fittingDropletParams (LBM_hydrovs.H:166-213): iterate until the
    trailing-window undulation of (W, R) falls below `undul_ratio`,
    retrying with dt/5 from the window mean; returns (W, R, err)."""
    trace = fitting_droplet(rho, w0, r0p, eta_w, eta_r, dt, nstep)

    def window_stats(tr):
        win = tr[-step_window:]
        mean = win.mean(axis=0)
        und = (win.max(axis=0) - win.min(axis=0)) / mean
        return mean, und

    mean, und = window_stats(trace)
    dt_new = dt / 5.0
    it = 1
    while it <= max_iter and not (und[0] <= undul_ratio
                                  and und[1] <= undul_ratio):
        trace = fitting_droplet(rho, mean[0], mean[1], eta_w, eta_r,
                                dt_new, nstep)
        mean, und = window_stats(trace)
        it += 1
        dt_new /= 5.0
    if not (und[0] <= undul_ratio and und[1] <= undul_ratio):
        raise RuntimeError(
            f"statistical undulation {tuple(und)} out of bounds")
    return float(mean[0]), float(mean[1]), float(und.max())
