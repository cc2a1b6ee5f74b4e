"""Analysis-package unit tests on synthetic fields (the notebook math of
SURVEY.md §4.6 turned into deterministic checks)."""

import numpy as np
import pytest

from bflbm_tpu.observables import droplet, free_energy, interface, msd


def _synthetic_droplet(shape=(32, 32, 32), R=7.0, w=0.8,
                       lo=0.05, hi=3.0, com=(0.0, 0.0, 0.0)):
    r = np.linalg.norm(droplet.minimum_image(
        droplet.cell_coords(shape) - np.asarray(com), shape), axis=-1)
    return lo + 0.5 * (hi - lo) * (1 + np.tanh((R - r) / w))


def test_com_recovers_offset():
    rho = _synthetic_droplet(com=(1.5, -2.0, 0.5))
    com = droplet.center_of_mass(rho - rho.min())  # excess mass COM
    np.testing.assert_allclose(com, [1.5, -2.0, 0.5], atol=0.05)


def test_fit_droplet_recovers_radius_width():
    R, w = 7.0, 0.8
    rho = _synthetic_droplet(R=R, w=w)
    fit = droplet.fit_droplet(rho)
    assert abs(fit["R"] - R) < 0.2
    # model width sqrt(2W) == w
    assert abs(np.sqrt(2 * fit["W"]) - w) < 0.2
    assert abs(fit["rho_hi"] - 3.0) < 0.05


def test_gyration_isotropic_for_sphere():
    rho = _synthetic_droplet()
    s = droplet.gyration_tensor(rho - rho.min(),
                                droplet.center_of_mass(rho - rho.min()))
    e = np.linalg.eigvalsh(s)
    assert (np.abs(e / e.mean() - 1) < 0.02).all()


def test_radius_from_mass():
    rho = _synthetic_droplet(R=7.0, w=0.5)
    r = droplet.radius_from_mass(rho)
    assert abs(r - 7.0) < 0.3


def test_laplace_gamma_linear_fit():
    radii = np.array([5.0, 6.0, 8.0, 10.0])
    gamma_true = 0.0122
    dps = 2 * gamma_true / radii + 0.001
    gamma, icpt = droplet.surface_tension_laplace(radii, dps)
    np.testing.assert_allclose(gamma, gamma_true, rtol=1e-6)
    np.testing.assert_allclose(icpt, 0.001, atol=1e-9)


def test_free_energy_binodal_and_gamma():
    """Pin to the reference notebook's own saved outputs
    (surface_tension_predict.ipynb cells 2 & 5): binodal densities
    0.032318/3.067682 and quadrature gamma = 0.90322 at G=1.5,
    rho_t=3.1.  (Note: the reference's measured capillary-wave gamma is
    0.012162 — its free-energy cell does not reproduce its measurement;
    we pin parity with what the reference actually computes.)"""
    lo, hi = free_energy.binodal_densities(3.1, 1.5)
    np.testing.assert_allclose(lo, 0.03231825314438495, rtol=1e-6)
    np.testing.assert_allclose(hi, 3.067681746855615, rtol=1e-6)
    gamma = free_energy.surface_tension_theory(3.1, 1.5)
    np.testing.assert_allclose(gamma, 0.9032199309615522, rtol=1e-3)


def test_interface_profile_theory_matches_binodal():
    z, rho = free_energy.interface_profile_theory(3.1, 1.5)
    lo, hi = free_energy.binodal_densities(3.1, 1.5)
    np.testing.assert_allclose(rho[0], lo, rtol=1e-3)
    np.testing.assert_allclose(rho[-1], hi, rtol=1e-3)
    assert np.all(np.diff(rho) > -1e-9)


def test_interface_height_flat():
    X, Y, Z = 4, 16, 64
    z = np.arange(Z)
    z0 = 40.25
    prof = 0.1 + 2.9 * 0.5 * (1 + np.tanh((z0 - z) / 1.5))
    rho = np.broadcast_to(prof, (X, Y, Z)).copy()
    h = interface.interface_height(rho, 0.5 * (0.1 + 3.0))
    np.testing.assert_allclose(h, z0, atol=0.05)


def test_capillary_spectrum_synthetic():
    """Heights synthesized with known <|h_k|^2> = A/k^2 recover gamma."""
    rng = np.random.default_rng(0)
    X, Y = 4, 256
    kBT = 1e-5
    gamma = 0.012
    k = 2 * np.pi * np.fft.fftfreq(Y)
    frames = []
    for _ in range(300):
        amp = np.zeros(Y, complex)
        for m in range(1, Y // 2):
            var = kBT / (gamma * k[m] ** 2) / 2.0
            a = rng.normal(0, np.sqrt(var)) + 1j * rng.normal(
                0, np.sqrt(var))
            amp[m] = a
            amp[-m] = np.conj(a)
        h = np.fft.ifft(amp).real * np.sqrt(Y)
        frames.append(np.broadcast_to(h, (X, Y)))
    k_out, s = interface.capillary_spectrum(np.asarray(frames), axis=1)
    got = interface.fit_capillary_gamma(k_out, s, kBT, kmax=0.8)
    np.testing.assert_allclose(got, gamma, rtol=0.1)


def test_msd_brownian():
    rng = np.random.default_rng(1)
    D = 0.05
    T = 20000
    steps = rng.normal(0, np.sqrt(2 * D), size=(T, 3))
    traj = np.cumsum(steps, axis=0)
    ts, m = msd.msd(np.arange(T), traj, tmax=200)
    got = msd.diffusion_coefficient(ts, m, dim=3, fit_lo=10, fit_hi=200)
    np.testing.assert_allclose(got, D, rtol=0.1)


def test_unwrap_periodic():
    box = (32, 32, 32)
    t = np.linspace(0, 100, 400)
    true = np.stack([0.7 * t, -0.3 * t, 0.1 * t], axis=1)
    wrapped = np.mod(true + 16, 32) - 16
    un = msd.unwrap_periodic(wrapped, box)
    np.testing.assert_allclose(un - un[0], true - true[0], atol=1e-9)


def test_stokes_einstein_value():
    """Pinned unit-system numbers (xdg_msd_calc / system_unit.ipynb):
    eta = rho/6 at tau_eff=1; P = 1 - 2.84 R/L."""
    # reference P_FLBM = 0.450 at R = 6.2, L = 32
    p = 1 - 2.84 * 6.2 / 32
    np.testing.assert_allclose(p, 0.45, atol=0.005)
    d = msd.stokes_einstein(6.2, 32.0, eta=3.1 / 6.0, kBT=1e-5)
    assert d > 0
    # f_n = 5 at viscosity ratio 1
    np.testing.assert_allclose(d, 1e-5 * p / (5 * np.pi * (3.1 / 6) * 6.2),
                               rtol=1e-12)


def test_shape_fluctuation_gamma_scale():
    rng = np.random.default_rng(2)
    kBT = 1e-5
    gamma = 0.012
    var_plus = 15 * kBT / (16 * np.pi * gamma)
    # synthesize axes with the target <(da_i + da_j)^2> = var_plus:
    # independent da with var v: <(da_i+da_j)^2> = 2v
    v = var_plus / 2
    a = 7.0 + rng.normal(0, np.sqrt(v), size=(200000, 3))
    out = droplet.shape_fluctuation_gamma(a, kBT)
    np.testing.assert_allclose(out["gamma_20"], gamma, rtol=0.05)


def test_surface_radius_map_sphere():
    rho = _synthetic_droplet(shape=(32, 32, 32), R=8.0, w=0.6)
    com = np.zeros(3)
    rmap = droplet.surface_radius_map(rho, com, level=0.5 * (0.05 + 3.0))
    np.testing.assert_allclose(rmap, 8.0, atol=0.15)


def test_spherical_harmonics_sphere_is_pure_00():
    rmap = np.full((32, 64), 8.0)
    amps = droplet.spherical_harmonic_amplitudes(rmap, lmax=2)
    for (l, m), v in amps.items():
        if l > 0:
            assert abs(v) < 1e-10
    # length-units convention (Droplet_Fluctuation.ipynb cell 41):
    # zeta_00 * Y_00 = angular-average radius
    np.testing.assert_allclose(amps[(0, 0)].real / np.sqrt(4 * np.pi),
                               8.0, rtol=1e-6)


def test_zeta20_recovered_from_perturbed_droplet():
    """End-to-end zeta_20 pipeline on a synthetic deformed droplet:
    rho has interface at R(theta) = R0 + a*Y_20(theta); ray extraction +
    harmonic projection must return zeta_20 ~ a in LENGTH units (the
    convention the 2 gamma <zeta_20^2> = kBT/2 equipartition check
    relies on, Droplet_Fluctuation.ipynb cells 32-39)."""
    from scipy.special import sph_harm_y

    shape = (48, 48, 48)
    R0, a, w = 10.0, 0.6, 0.8
    lo, hi = 0.05, 3.0
    rvec = droplet.minimum_image(droplet.cell_coords(shape), shape)
    r = np.linalg.norm(rvec, axis=-1)
    ct = np.divide(rvec[..., 2], r, out=np.zeros_like(r), where=r > 0)
    theta = np.arccos(np.clip(ct, -1, 1))
    y20 = np.real(sph_harm_y(2, 0, theta, 0.0))
    R_dir = R0 + a * y20
    rho = lo + 0.5 * (hi - lo) * (1 + np.tanh((R_dir - r) / w))
    rmap = droplet.surface_radius_map(rho, np.zeros(3),
                                      level=0.5 * (lo + hi))
    amps = droplet.spherical_harmonic_amplitudes(rmap, lmax=2)
    np.testing.assert_allclose(amps[(2, 0)].real, a, rtol=0.05)
    assert abs(amps[(2, 2)]) < 0.02 * a + 1e-3
    # equipartition inversion at the synthetic amplitude: a known
    # <zeta_20^2> ensemble returns the gamma that generated it
    kBT = 1e-5
    gamma = 0.012162
    rng = np.random.default_rng(5)
    z = rng.normal(0.0, np.sqrt(kBT / (4 * gamma)), size=200000)
    got = droplet.zeta_equipartition_gamma(z, kBT)
    np.testing.assert_allclose(got, gamma, rtol=0.02)


def test_correlation_axis_cut_and_vacf():
    from bflbm_tpu.observables import correlation as corr

    sk = np.zeros((8, 8, 8))
    sk[2, 0, 0] = 5.0
    k, c = corr.axis_cut(sk, axis=0)
    assert c[list(k).index(2.0)] == 5.0

    rng = np.random.default_rng(0)
    # OU-like series: exponential autocorrelation
    T, tau = 40000, 10.0
    a = np.exp(-1.0 / tau)
    v = np.zeros((T, 3))
    for t in range(1, T):
        v[t] = a * v[t - 1] + rng.normal(0, 1, 3)
    c = corr.velocity_autocorrelation(v, 30)
    np.testing.assert_allclose(c[1], a, atol=0.05)
    np.testing.assert_allclose(c[10], a ** 10, atol=0.05)


def test_time_series_and_mean_density():
    from bflbm_tpu.observables import correlation as corr

    frames = [{"rho": np.full((4, 4, 4), float(i)), "phi": np.ones((4, 4, 4)),
               "step": i} for i in range(5)]
    ts = corr.time_series(frames, "rho")
    np.testing.assert_allclose(ts["mean"], np.arange(5.0))
    md = corr.time_mean_density(frames)
    np.testing.assert_allclose(md["rho"], 2.0)


def test_series_jacobian_fitter_recovers_synthetic():
    """The ported series-Jacobian fitter (LBM_hydrovs.H:117-213 +
    externlib.H:22-406) recovers (W, R) of a unit-amplitude tanh
    droplet to ~1e-5 in box units."""
    from bflbm_tpu.observables import droplet_ref_fit as rf

    n = 32
    R_true, W_true = 0.23, 0.0008
    coords = [(np.arange(n) + 0.5) / n for _ in range(3)]
    x, y, z = np.meshgrid(*coords, indexing="ij")
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    rho = 0.5 * (1 + np.tanh((R_true - r) / np.sqrt(2 * W_true)))
    out = rf.fit_droplet_ref(rho)
    assert abs(out["R"] - R_true) < 5e-4
    assert abs(out["W"] - W_true) / W_true < 5e-3
    assert out["err"] <= 0.01
