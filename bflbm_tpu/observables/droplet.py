"""Droplet observables: COM, radius fits, gyration, Laplace law.

Replaces the C++ analysis stack ``LBM_hydrovs.H`` (COM :27-60, tanh-fit
by series-Jacobian gradient descent :117-213, gyration/Eigen :258-335)
and the droplet helpers of ``xdg_msd_calc.ipynb``.  The tanh-profile fit
here is a direct least-squares on the spherically averaged profile
(scipy curve_fit) — same model and outputs (W, R) as the reference's
hand-rolled iteration, minus its fragility (the reference retries with
dt/5 up to 10 times and aborts on non-convergence).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

CS2 = 1.0 / 3.0


def cell_coords(shape) -> np.ndarray:
    """Cell-center coordinates relative to the box center; (X,Y,Z,3)."""
    idx = np.moveaxis(np.indices(shape), 0, -1).astype(float)
    return idx - np.asarray(shape) / 2.0 + 0.5


def center_of_mass(rho: np.ndarray) -> np.ndarray:
    """Density-weighted COM in box-center coordinates."""
    r = cell_coords(rho.shape)
    return np.einsum("xyz,xyzd->d", rho, r) / rho.sum()


def minimum_image(r: np.ndarray, box) -> np.ndarray:
    box = np.asarray(box, dtype=float)
    return r - box * np.round(r / box)


def gyration_tensor(rho: np.ndarray, com: np.ndarray) -> np.ndarray:
    """Mass covariance (gyration) tensor with minimum-image convention
    (fittingDropletCovariance, LBM_hydrovs.H:258-335)."""
    r = minimum_image(cell_coords(rho.shape) - com, rho.shape)
    return np.einsum("xyz,xyza,xyzb->ab", rho, r, r) / rho.sum()


def principal_radii(rho: np.ndarray, com: np.ndarray,
                    radius: float) -> np.ndarray:
    """Principal semi-axes a,b,c scaled so that a*b*c = R^3 (the
    xdg_msd_calc.ipynb `principal_radii` construction)."""
    s = gyration_tensor(rho, com)
    e = np.linalg.eigvalsh(s)
    e = e[::-1]
    out = []
    for n in range(3):
        i, j, k = np.roll(np.arange(3), -n)
        out.append(radius * ((e[i] * e[i]) / (e[j] * e[k])) ** (1.0 / 6.0))
    return np.asarray(out)


def radius_from_mass(rho: np.ndarray) -> float:
    """Equivalent-sphere radius from excess mass
    (droplet_radius_mass, xdg_msd_calc.ipynb)."""
    center = tuple(n // 2 for n in rho.shape)
    rho_in = rho[center]
    rho_out = rho[0, 0, 0]
    mass = float(np.sum(rho - rho_out))
    return float((3.0 / (4.0 * np.pi) * mass / (rho_in - rho_out)) ** (1 / 3))


def radial_profile(rho: np.ndarray, com: np.ndarray, nbins: int = 0):
    """Spherically averaged rho(r) about the COM; returns (r, rho_r)."""
    r = np.linalg.norm(minimum_image(cell_coords(rho.shape) - com,
                                     rho.shape), axis=-1).ravel()
    v = rho.ravel()
    nbins = nbins or int(min(rho.shape) // 2)
    edges = np.linspace(0, min(rho.shape) / 2.0, nbins + 1)
    which = np.digitize(r, edges) - 1
    rs, vs = [], []
    for b in range(nbins):
        sel = which == b
        if sel.any():
            rs.append(r[sel].mean())
            vs.append(v[sel].mean())
    return np.asarray(rs), np.asarray(vs)


def tanh_profile(r, w, radius, rho_lo, rho_hi):
    """rho(r) = rho_lo + (rho_hi-rho_lo)/2 (1 + tanh((R-r)/sqrt(2W)))
    — the fit model of LBM_hydrovs.H:117 (W = half squared width).
    |W| is used so the model stays finite when the optimizer probes
    negative widths mid-fit (the sign is meaningless; fit_droplet
    reports abs(W)) — otherwise sqrt(neg) NaNs the residuals and the
    NaN survives np.clip."""
    arg = np.clip((radius - r) / np.sqrt(2.0 * np.abs(w) + 1e-300),
                  -25.0, 25.0)
    return rho_lo + 0.5 * (rho_hi - rho_lo) * (1.0 + np.tanh(arg))


def fit_droplet(rho: np.ndarray, com=None) -> Dict[str, float]:
    """Least-squares tanh fit; returns dict(W, R, rho_lo, rho_hi).

    Reference output: fittingDropletParams (W, R) (LBM_hydrovs.H:117-213).
    """
    from scipy.optimize import curve_fit

    if com is None:
        com = center_of_mass(rho)
    r, v = radial_profile(rho, com)
    lo0, hi0 = float(v.min()), float(v.max())
    r0 = r[np.argmin(np.abs(v - 0.5 * (lo0 + hi0)))]
    p0 = [0.5, max(r0, 1.0), lo0, hi0]
    popt, _ = curve_fit(tanh_profile, r, v, p0=p0, maxfev=20000)
    w, radius, rho_lo, rho_hi = popt
    return {"W": float(abs(w)), "R": float(radius),
            "rho_lo": float(rho_lo), "rho_hi": float(rho_hi)}


def fit_droplet_allcells(rho: np.ndarray, com=None) -> Dict[str, float]:
    """The reference's pinned-radius fit (Surface_Tension.ipynb cell 8):
    least squares of rho over ALL cells vs distance from the COM (no
    radial binning — the per-cell weighting emphasizes the r^2-heavier
    tail, unlike :func:`fit_droplet`'s binned profile), model

        rho(r) = rho_hi - (rho_hi - rho_lo)/2 (1 + tanh((r - R)/W)),

    in box units ([0,1]^3, cell centers (i+1/2)/n), COM = plain
    density-weighted mean (no minimum image), p0 = [max, min, 0.5, 0.5].
    Returns dict(R, W, rho_hi, rho_lo) with R, W in units of L — the
    convention of the pinned values [0.1760534, ...] (cell 9).
    """
    from scipy.optimize import curve_fit

    shape = np.asarray(rho.shape)
    coords = [(np.arange(n) + 0.5) / n for n in shape]
    x, y, z = np.meshgrid(*coords, indexing="ij")
    if com is None:
        mass = rho.sum()
        com = np.array([float((rho * c).sum() / mass) for c in (x, y, z)])
    r = np.sqrt((x - com[0]) ** 2 + (y - com[1]) ** 2 + (z - com[2]) ** 2)

    def model(rv, hi, lo, radius, w):
        return hi - 0.5 * (hi - lo) * (
            1.0 + np.tanh(np.clip((rv - radius) / w, -25, 25)))

    v = np.asarray(rho, float).ravel()
    popt, _ = curve_fit(model, r.ravel(), v,
                        p0=[v.max(), v.min(), 0.5, 0.5], maxfev=20000)
    hi, lo, radius, w = popt
    return {"R": float(radius), "W": float(abs(w)),
            "rho_hi": float(hi), "rho_lo": float(lo)}


def laplace_delta_p(rho: np.ndarray, phi: np.ndarray, alpha0: float,
                    com=None) -> float:
    """Pressure jump P_in - P_out with P = rho_t cs^2 + G cs^2 rho phi,
    sampled at the droplet center vs a box corner
    (Surface_Tension.ipynb cell 13)."""
    from .free_energy import pressure

    if com is None:
        com = center_of_mass(rho)
    c = tuple(int(x) for x in (com + np.asarray(rho.shape) / 2.0 - 0.5))
    c = tuple(np.clip(c, 0, np.asarray(rho.shape) - 1))
    p_in = pressure(rho[c], phi[c], alpha0)
    p_out = pressure(rho[0, 0, 0], phi[0, 0, 0], alpha0)
    return float(p_in - p_out)


def shape_fluctuation_gamma(axes_series: np.ndarray, kBT: float
                            ) -> Dict[str, float]:
    """Surface tension from principal-axis fluctuations of a droplet
    (Droplet_Fluctuation.ipynb cells 22-25):

        gamma_(2,0)   = 15 kBT / (16 pi <(da_i + da_j)^2>)
        gamma_(2,+-2) = 45 kBT / (16 pi <(da_i - da_j)^2>)

    averaged over the three distinct (i, j) pairs; axes_series has shape
    (T, 3) = principal semi-axes per frame.
    """
    a = np.asarray(axes_series, dtype=float)
    da = a - a.mean(axis=0, keepdims=True)
    pairs = [(0, 1), (1, 2), (0, 2)]
    plus = np.mean([np.mean((da[:, i] + da[:, j]) ** 2) for i, j in pairs])
    minus = np.mean([np.mean((da[:, i] - da[:, j]) ** 2) for i, j in pairs])
    return {
        "gamma_20": 15.0 * kBT / (16.0 * np.pi * plus),
        "gamma_22": 45.0 * kBT / (16.0 * np.pi * minus),
    }


def _sphere_grid(n_theta: int, n_phi: int):
    """(theta, phi, w) quadrature grid: Gauss-Legendre nodes in
    cos(theta) x uniform phi.  GL makes the harmonic projections exact
    for l <= 2*n_theta - 1 — an equi-angular midpoint rule leaks
    ~1e-3 * zeta_00 into zeta_20 for a perfect sphere, which would
    swamp the thermal signal rms sqrt(kBT/4gamma) ~ 1e-2."""
    x, gw = np.polynomial.legendre.leggauss(n_theta)
    theta = np.arccos(x[::-1])
    w = gw[::-1] * (2.0 * np.pi / n_phi)
    phi = np.arange(n_phi) * 2.0 * np.pi / n_phi
    return theta, phi, w


def surface_radius_map(rho: np.ndarray, com: np.ndarray, level: float,
                       n_theta: int = 32, n_phi: int = 64,
                       r_max: float = None) -> np.ndarray:
    """R(theta, phi): radius where rho crosses `level` along radial rays
    from the COM (replaces the reference's marching-cubes surface
    extraction, Droplet_Fluctuation.ipynb cells 32-39).  Trilinear
    sampling on periodic coordinates; rays on the Gauss-Legendre grid
    of :func:`_sphere_grid`."""
    shape = np.asarray(rho.shape)
    r_max = r_max or float(shape.min()) / 2.0 - 1.0
    theta, phi, _ = _sphere_grid(n_theta, n_phi)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    dirs = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                     np.cos(tt)], axis=-1)  # (nt, np, 3)
    rs = np.linspace(0.5, r_max, 256)
    # sample rho along each ray (nt, np, nr)
    pts = (com + np.asarray(rho.shape) / 2.0 - 0.5)[None, None, None, :] \
        + dirs[:, :, None, :] * rs[None, None, :, None]
    vals = _trilinear_periodic(rho, pts)
    s = vals - level
    # first crossing from inside (s>0) to outside (s<0)
    sign_flip = (s[..., :-1] > 0) & (s[..., 1:] <= 0)
    has = sign_flip.any(axis=-1)
    first = np.where(has, np.argmax(sign_flip, axis=-1), len(rs) - 2)
    i0 = first
    s0 = np.take_along_axis(s, i0[..., None], axis=-1)[..., 0]
    s1 = np.take_along_axis(s, (i0 + 1)[..., None], axis=-1)[..., 0]
    frac = np.where(s0 != s1, s0 / (s0 - s1), 0.0)
    dr = rs[1] - rs[0]
    return rs[i0] + frac * dr


def _trilinear_periodic(field: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Trilinear interpolation with periodic wrap; pts[..., 3] in cell
    coordinates."""
    shape = np.asarray(field.shape)
    p = np.mod(pts, shape)
    i0 = np.floor(p).astype(int)
    frac = p - i0
    out = np.zeros(p.shape[:-1])
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                idx = (np.mod(i0[..., 0] + dx, shape[0]),
                       np.mod(i0[..., 1] + dy, shape[1]),
                       np.mod(i0[..., 2] + dz, shape[2]))
                w = (np.where(dx, frac[..., 0], 1 - frac[..., 0])
                     * np.where(dy, frac[..., 1], 1 - frac[..., 1])
                     * np.where(dz, frac[..., 2], 1 - frac[..., 2]))
                out += w * field[idx]
    return out


def spherical_harmonic_amplitudes(r_map: np.ndarray, lmax: int = 4
                                  ) -> Dict[Tuple[int, int], complex]:
    """Spherical-harmonic coefficients zeta_lm of the surface radius map
    R(theta, phi) in the reference's convention
    (Droplet_Fluctuation.ipynb cell 32):

        zeta_lm = sum(R * conj(Y_lm) * w) / sum(|Y_lm|^2 * w),

    with solid-angle weights w and orthonormal (scipy) Y_lm, i.e. the
    raw radius in LENGTH units is projected (f = r in the notebook), so
    zeta_lm carries units of length and zeta_00 = R0 * sqrt(4 pi).
    Capillary equipartition (cell 39, with the surface-energy expansion
    E_lm = gamma/2 (l-1)(l+2) |zeta_lm|^2): for l = 2,

        2 gamma <zeta_20^2> = kBT / 2.

    Here the map lives on the Gauss-Legendre grid of
    :func:`_sphere_grid` (projections exact for l <= 2*n_theta - 1); the
    denominator keeps the projection exact under discretization like
    the reference's vertex-weight version.
    """
    from scipy.special import sph_harm_y

    nt, npp = r_map.shape
    theta, phi, w = _sphere_grid(nt, npp)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    domega = np.broadcast_to(w[:, None], (nt, npp))
    out = {}
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            ylm = sph_harm_y(l, m, tt, pp)
            num = np.sum(r_map * np.conj(ylm) * domega)
            den = np.sum(np.abs(ylm) ** 2 * domega)
            out[(l, m)] = complex(num / den)
    return out


def zeta_equipartition_gamma(zeta20_series, kBT: float) -> float:
    """Surface tension from the l=2 capillary equipartition relation
    2 gamma <zeta_20^2> = kBT/2 (Droplet_Fluctuation.ipynb cell 39);
    zeta20_series in length units from
    :func:`spherical_harmonic_amplitudes`."""
    z = np.real(np.asarray(zeta20_series))
    return float(kBT / (4.0 * np.mean(z ** 2)))


def surface_tension_laplace(radii, delta_ps) -> Tuple[float, float]:
    """Fit DeltaP = 2 gamma / R over droplets of several radii; returns
    (gamma, intercept)."""
    x = 2.0 / np.asarray(radii, dtype=float)
    y = np.asarray(delta_ps, dtype=float)
    gamma, icpt = np.polyfit(x, y, 1)
    return float(gamma), float(icpt)
