"""Noise covariance validation (NoiseCovariance.ipynb analog, SURVEY.md §4.6).

Checks the per-mode amplitudes of LBM_binary.H:113-127:
  momentum modes: var = 2(lam - lam^2/2) kBT |rho phi/rho_t|, xi_g = -xi_f;
  ghost modes:    var = 2(lam - lam^2/2) kBT/cs2 b_a |n_s|, independent.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bflbm_tpu.config import LBMParams
from bflbm_tpu.lattice import B, CS2
from bflbm_tpu.ops.noise import thermal_noise


def _draw(params, shape=(16, 16, 16), nsamples=32, rho0=1.0, phi0=1.0):
    rho = jnp.full(shape, rho0, jnp.float64)
    phi = jnp.full(shape, phi0, jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(0), nsamples)
    draw = jax.jit(lambda k: thermal_noise(k, rho, phi, params))
    xf, xg = [], []
    for k in keys:
        a, b = draw(k)
        xf.append(np.asarray(a))
        xg.append(np.asarray(b))
    return np.stack(xf), np.stack(xg)


def test_mode_variances():
    params = LBMParams(kBT=1e-5)
    rho0, phi0 = 1.2, 0.8
    xf, xg = _draw(params, nsamples=24, rho0=rho0, phi0=phi0)
    lam = params.lam_f
    pref = 2.0 * (lam - 0.5 * lam * lam) * params.kBT
    # mass mode exactly zero
    assert np.all(xf[:, 0] == 0.0) and np.all(xg[:, 0] == 0.0)
    # momentum modes: shared amplitude, exact anti-correlation
    var_mom = pref * rho0 * phi0 / (rho0 + phi0)
    got = xf[:, 1:4].var()
    np.testing.assert_allclose(got, var_mom, rtol=0.05)
    np.testing.assert_array_equal(xg[:, 1:4], -xf[:, 1:4])
    # ghost modes: b_a-weighted, species' own density
    for a in [4, 7, 10, 16, 18]:
        np.testing.assert_allclose(
            xf[:, a].var(), pref / CS2 * B[a] * rho0, rtol=0.08)
        np.testing.assert_allclose(
            xg[:, a].var(), pref / CS2 * B[a] * phi0, rtol=0.08)
    # f ghost and g ghost independent
    corr = np.corrcoef(xf[:, 5].ravel(), xg[:, 5].ravel())[0, 1]
    assert abs(corr) < 0.02


def test_noise_off_is_zero():
    params = LBMParams(kBT=0.0)
    rho = jnp.ones((4, 4, 4))
    xf, xg = thermal_noise(jax.random.PRNGKey(1), rho, rho, params)
    assert np.all(np.asarray(xf) == 0.0)
    assert np.all(np.asarray(xg) == 0.0)


def test_counter_based_determinism():
    params = LBMParams(kBT=1e-5)
    rho = jnp.ones((8, 8, 8))
    k = jax.random.PRNGKey(9)
    a1, _ = thermal_noise(k, rho, rho, params)
    a2, _ = thermal_noise(k, rho, rho, params)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
