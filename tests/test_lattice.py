"""Lattice model unit tests (SURVEY.md §7 step 1)."""

import jax.numpy as jnp
import numpy as np

from bflbm_tpu import lattice
from bflbm_tpu.ops.moments import moments, populations


def test_mode_norms_match_reference_table():
    # b table transcribed from LBM_d3q19.H:56-76 (fixture, not live code)
    np.testing.assert_allclose(lattice.B, lattice.B_REFERENCE, rtol=0, atol=1e-14)


def test_transform_inverse():
    np.testing.assert_allclose(
        lattice.M @ lattice.M_INV, np.eye(19), atol=1e-13)
    np.testing.assert_allclose(
        lattice.M_INV @ lattice.M, np.eye(19), atol=1e-13)


def test_weight_isotropy():
    C = lattice.C.astype(float)
    W = lattice.W
    # 4th order isotropy: sum w c_a c_b c_c c_d = cs4 (d_ab d_cd + ...)
    T4 = np.einsum("i,ia,ib,ic,id->abcd", W, C, C, C, C)
    I = np.eye(3)
    expected = lattice.CS4 * (
        np.einsum("ab,cd->abcd", I, I)
        + np.einsum("ac,bd->abcd", I, I)
        + np.einsum("ad,bc->abcd", I, I)
    )
    np.testing.assert_allclose(T4, expected, atol=1e-14)


def test_moment_roundtrip():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(19, 4, 4, 4))
    m = moments(jnp.asarray(f))
    f2 = populations(m)
    np.testing.assert_allclose(np.asarray(f2), f, atol=1e-12)


def test_conserved_moments_are_mass_and_momentum():
    rng = np.random.default_rng(1)
    f = rng.normal(size=(19, 3, 3, 3))
    m = np.asarray(moments(jnp.asarray(f)))
    np.testing.assert_allclose(m[0], f.sum(axis=0), atol=1e-12)
    j = np.einsum("ixyz,id->dxyz", f, lattice.C.astype(float))
    np.testing.assert_allclose(m[1:4], j, atol=1e-12)


def test_equilibrium_velocity_moments():
    """populations(m_eq) must have exact 0th/1st/2nd velocity moments:
    sum f = rho, sum f c = rho u, sum f c c = rho cs2 I + rho u u."""
    from bflbm_tpu.ops.collide import equilibrium_moments

    rho = jnp.asarray(np.array([1.3])[:, None, None])
    u = jnp.asarray(np.array([0.02, -0.01, 0.03])[:, None, None, None])
    feq = np.asarray(populations(equilibrium_moments(rho, u))).reshape(19)
    C = lattice.C.astype(float)
    np.testing.assert_allclose(feq.sum(), 1.3, atol=1e-12)
    np.testing.assert_allclose(
        np.einsum("i,id->d", feq, C), 1.3 * np.asarray(u).ravel(), atol=1e-12)
    P = np.einsum("i,ia,ib->ab", feq, C, C)
    uu = np.outer(np.asarray(u).ravel(), np.asarray(u).ravel())
    np.testing.assert_allclose(
        P, 1.3 * (lattice.CS2 * np.eye(3) + uu), atol=1e-12)


def test_rest_equilibrium_is_weights():
    """moments of f_i = w_i rho must be (rho, 0...): the rest equilibrium."""
    rho = 2.7
    f = jnp.asarray(lattice.W * rho)[:, None, None, None]
    m = np.asarray(moments(f)).ravel()
    np.testing.assert_allclose(m[0], rho, atol=1e-12)
    np.testing.assert_allclose(m[1:], 0.0, atol=1e-12)


def test_eof_factored_schedules_match_matrices():
    """The hand-factored "eof" transform schedules (fused kernel default)
    must reproduce M / M_INV exactly on the identity basis and agree
    with a dense f64 matrix apply on random data; the telescoped rest
    population must conserve mass to f64 roundoff.  Guards the
    import-time _verify_eof gate with visible coverage."""
    from bflbm_tpu.kernels.fused_step import (_EOF_OK, _eof_mom,
                                              _eof_pops)

    assert _EOF_OK
    rng = np.random.default_rng(3)
    pops = [rng.standard_normal(64) for _ in range(lattice.Q)]
    m_fact = np.stack(_eof_mom(pops))
    m_dense = np.einsum("ki,ix->kx", lattice.M, np.stack(pops))
    np.testing.assert_allclose(m_fact, m_dense, rtol=0, atol=1e-12)

    moms = [rng.standard_normal(64) for _ in range(lattice.Q)]
    p_fact = np.stack(_eof_pops(moms))
    p_dense = np.einsum("ik,kx->ix", lattice.M_INV, np.stack(moms))
    np.testing.assert_allclose(p_fact, p_dense, rtol=0, atol=1e-12)
    # telescoping: stored mass == the mass moment to f64 roundoff
    np.testing.assert_allclose(p_fact.sum(axis=0), moms[0], atol=1e-12)
