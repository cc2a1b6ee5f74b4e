"""Flat-interface observables: height field + capillary-wave spectrum.

Reference workflow (``Flat_Interface.ipynb`` cells 4-10): extract the
interface height h(y) where rho crosses (rho_lo + rho_hi)/2 (there via
skimage.find_contours), then check the capillary equipartition

    <|h_hat(k)|^2> = kBT / (gamma k^2)

and read off gamma.  Here the height is extracted by direct linear
interpolation of the crossing along z per (x, y) column — vectorized,
no skimage dependency.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def interface_height(rho: np.ndarray, level: float, upper: bool = True,
                     strict: bool = False) -> np.ndarray:
    """Height h(x, y) of the rho = level crossing along z.

    upper=True picks the crossing where rho decreases through `level`
    with z (the top interface of a stripe); False the increasing one.
    Heights are in cells, measured from z=0.

    Columns with no crossing (overhangs / detached bubbles — the
    reference's contour extraction walks around these) degrade to NaN
    per column (use :func:`fill_missing`); strict=True raises instead.
    """
    X, Y, Z = rho.shape
    s = rho - level
    sign = np.sign(s)
    flip = sign[:, :, :-1] * sign[:, :, 1:] < 0
    grad_down = s[:, :, :-1] > s[:, :, 1:]
    pick = flip & (grad_down if upper else ~grad_down)
    # choose the last matching crossing for upper, first for lower
    idx = np.where(pick, np.arange(Z - 1)[None, None, :], -1)
    k = idx.max(axis=2) if upper else np.where(
        pick.any(axis=2), np.argmax(pick, axis=2), -1)
    missing = k < 0
    if missing.any() and strict:
        raise ValueError("no interface crossing found in some column")
    kc = np.maximum(k, 0)
    ii, jj = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    s0 = s[ii, jj, kc]
    s1 = s[ii, jj, kc + 1]
    den = s0 - s1
    frac = np.where(den != 0, s0 / np.where(den != 0, den, 1.0), 0.5)
    h = kc + frac
    return np.where(missing, np.nan, h)


def fill_missing(h: np.ndarray, axis: int = 1) -> np.ndarray:
    """Fill NaN heights by periodic linear interpolation along `axis`
    (per-column degradation instead of dropping whole frames)."""
    h = np.asarray(h, float)
    if not np.isnan(h).any():
        return h
    out = np.array(h)
    it = np.ndindex(*(s for a, s in enumerate(h.shape) if a != axis))
    for rest in it:
        sl = list(rest)
        sl.insert(axis, slice(None))
        row = out[tuple(sl)]
        bad = np.isnan(row)
        if not bad.any():
            continue
        n = len(row)
        if bad.all():
            raise ValueError("no interface crossing found in an entire row")
        x = np.arange(n)
        # periodic interpolation: extend good points by one period each way
        good = ~bad
        xg = np.concatenate([x[good] - n, x[good], x[good] + n])
        vg = np.tile(row[good], 3)
        row[bad] = np.interp(x[bad], xg, vg)
        out[tuple(sl)] = row
    return out


def capillary_spectrum(heights: np.ndarray, axis: int = 1):
    """<|h_hat(k)|^2> over a stack of height fields.

    heights: (T, X, Y) frames.  The spectrum is taken along `axis` of
    the (X, Y) plane (the long direction of the reference's 8x256x64
    stripe is y), averaged over frames and the other direction, with the
    mean height removed per frame.  Returns (k, S_h) for k > 0, with
    |h_hat(k)|^2 normalized as (1/N)|sum h e^{-ikx}|^2 (unitary).
    """
    h = np.asarray(heights, dtype=float)
    if h.ndim == 2:
        h = h[None]
    h = h - h.mean(axis=(1, 2), keepdims=True)
    ax = 1 + axis
    n = h.shape[ax]
    hk = np.fft.fft(h, axis=ax) / np.sqrt(n)
    s = (np.abs(hk) ** 2).mean(axis=tuple(a for a in (0, 1, 2) if a != ax))
    k = 2.0 * np.pi * np.fft.fftfreq(n)
    keep = k > 0
    return k[keep], s[keep]


def fit_capillary_gamma(k: np.ndarray, s_h: np.ndarray, kBT: float,
                        kmax: float = 1.0) -> float:
    """Fit S_h = kBT/(gamma k^2) over k < kmax; returns gamma."""
    sel = (k > 0) & (k < kmax)
    # linear fit of 1/S vs k^2 through the origin: 1/S = (gamma/kBT) k^2
    x = k[sel] ** 2
    y = 1.0 / s_h[sel]
    slope = float(np.sum(x * y) / np.sum(x * x))
    return slope * kBT


def mean_profile(rho: np.ndarray) -> np.ndarray:
    """Laterally averaged rho(z) (surface_tension_predict.ipynb cell 9)."""
    return np.asarray(rho).mean(axis=(0, 1))


def profile_interface_width(z_profile: np.ndarray, rho_lo: float,
                            rho_hi: float) -> Tuple[float, float]:
    """Fit the upper interface of a laterally averaged stripe profile to
    rho(z) = rho_lo + (rho_hi-rho_lo)/2 (1 + tanh((z0 - z)/w));
    returns (z0, w)."""
    from scipy.optimize import curve_fit

    z = np.arange(len(z_profile), dtype=float)
    half = len(z_profile) // 2
    zz = z[half:]
    vv = np.asarray(z_profile[half:], dtype=float)

    def model(zv, z0, w):
        return rho_lo + 0.5 * (rho_hi - rho_lo) * (
            1.0 + np.tanh(np.clip((z0 - zv) / w, -25, 25)))

    mid = 0.5 * (rho_lo + rho_hi)
    z0_guess = zz[np.argmin(np.abs(vv - mid))]
    popt, _ = curve_fit(model, zz, vv, p0=[z0_guess, 1.0], maxfev=10000)
    return float(popt[0]), float(abs(popt[1]))


def capillary_spectrum_ref(heights_slice: np.ndarray):
    """<|h_k|^2> with the reference's exact conventions
    (Flat_Interface.ipynb cells 7-9): single x-slice height series
    (T, ny), backward-norm FFT (no 1/N), ENSEMBLE-mean height profile
    subtracted.  Returns (k, S) over positive k."""
    h = np.asarray(heights_slice, float)
    ny = h.shape[1]
    hmean = h.mean(axis=0)
    acc = np.zeros(ny)
    for row in h:
        hk = np.fft.fft(row - hmean)
        acc += np.abs(hk) ** 2
    s = acc / len(h)
    k = 2.0 * np.pi * np.fft.fftfreq(ny)
    keep = k > 0
    return k[keep], s[keep]


def fit_capillary_gamma_window(k: np.ndarray, s: np.ndarray, kBT: float,
                               kmin: float = 0.04,
                               kmax: float = 0.25) -> float:
    """gamma from least squares of 1/S vs k^2 through the origin over the
    capillary window (low-k modes equilibrate slowly; high k leaves the
    continuum regime — cf. Flat_Interface.ipynb cell 10's log plot)."""
    sel = (k >= kmin) & (k <= kmax)
    x = k[sel] ** 2
    y = 1.0 / s[sel]
    return float(np.sum(x * y) / np.sum(x * x)) * kBT
