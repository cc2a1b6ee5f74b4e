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
from bflbm_tpu.ops.noise import (hash_normal_stack, thermal_noise,
                                 thermal_noise_hash)


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


# ---------------------------------------------------------------------------
# Coordinate-keyed ("hash") jnp noise source — the RANDRAW
# draw_from_pdf_normal analog (LBM_binary.H:42-63) and the jnp-path
# consumer of the fused kernel's noise_impl="hash" stream.
# ---------------------------------------------------------------------------

def test_hash_stack_matches_kernel_stream():
    """The (33, ...) stack is the kernel's draw order: draw a maps to
    n1[a//2] / n2[a//2] of fused_step.hash_normals (the interleave
    _k_compute's normal() consumes)."""
    from bflbm_tpu.kernels.fused_step import hash_normals

    shape = (6, 5, 8)
    word, step = jnp.int32(-123456789), jnp.int32(7)
    stack = np.asarray(hash_normal_stack(word, step, shape, jnp.float32))
    n1, n2 = hash_normals(word, step, (jnp.int32(0), jnp.int32(0)),
                          shape, shape, jnp.float32)
    for a in range(33):
        ref = n1[a // 2] if a % 2 == 0 else n2[a // 2]
        np.testing.assert_array_equal(stack[a], np.asarray(ref))


def test_hash_noise_mode_variances():
    """thermal_noise_hash carries the same FDT amplitudes as
    thermal_noise: per-mode variances, anti-correlated momentum."""
    params = LBMParams(kBT=1e-5)
    rho0, phi0 = 1.2, 0.8
    shape = (16, 16, 16)
    rho = jnp.full(shape, rho0, jnp.float32)
    phi = jnp.full(shape, phi0, jnp.float32)
    draw = jax.jit(lambda w, s: thermal_noise_hash(w, s, rho, phi, params))
    xf, xg = [], []
    for s in range(24):
        a, b = draw(jnp.int32(42), jnp.int32(s))
        xf.append(np.asarray(a))
        xg.append(np.asarray(b))
    xf, xg = np.stack(xf), np.stack(xg)
    lam = params.lam_f
    pref = 2.0 * (lam - 0.5 * lam * lam) * params.kBT
    assert np.all(xf[:, 0] == 0.0)
    np.testing.assert_array_equal(xg[:, 1:4], -xf[:, 1:4])
    np.testing.assert_allclose(xf[:, 1:4].var(),
                               pref * rho0 * phi0 / (rho0 + phi0),
                               rtol=0.05)
    for a in [4, 10, 18]:
        np.testing.assert_allclose(
            xf[:, a].var(), pref / CS2 * B[a] * rho0, rtol=0.08)
    # per-step streams distinct, per-(word, step) reproducible
    a1, _ = draw(jnp.int32(42), jnp.int32(3))
    a2, _ = draw(jnp.int32(42), jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(xf[3], xf[4])
