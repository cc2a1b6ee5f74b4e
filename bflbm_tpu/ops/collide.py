"""MRT collision in moment space with Guo forcing and per-mode noise.

Reference: ``equilibrium_moments`` (LBM_binary.H:356-402), ``phi_moments``
(LBM_binary.H:404-449), ``collide`` (LBM_binary.H:451-516).

Per cell, per species s in {f, g} with density n_s, relaxation
tau_bar = tau_s + 1/2:

    m   <- m + (m_eq(n_s, v_b) - m)/tau_bar + Phi_s + xi_s

where v_b = (rho u_f + phi u_g)/(rho + phi) is the barycentric velocity
built from the *real* species velocities (LBM_binary.H:471 — equal to the
ub stored in hydrovars, since friction and momentum-noise terms cancel in
the weighted sum), m_eq keeps mass/momentum/stress modes only, and the
force moments carry the Guo half-step prefactor
s = 1/(1 + 1/(2 tau)) (LBM_binary.H:424).

Note the reference hard-codes ``tau_f`` in the force prefactor for *both*
species (LBM_binary.H:424) and ``tau_g_bar = tau_f_bar`` in the noise
(LBM_binary.H:80); with the default tau_f = tau_g these coincide.  We use
the per-species tau throughout.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import LBMParams
from ..lattice import Q
from .hydro import Hydro
from .moments import moments, populations

# Test hook (tests/test_relax_invariance.py): route tau = 1/2 through the
# general relaxation update instead of the exact-relaxation branch.
FORCE_GENERAL_RELAX = False


def equilibrium_moments(n: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Binary-fluid equilibrium moments m_eq(n, u); u shape (3, ...).

    Mass n; momentum n*u; stress modes the standard second-order Hermite
    combinations; ghost modes zero (LBM_binary.H:381-399).
    """
    ux, uy, uz = u[0], u[1], u[2]
    u2 = ux * ux + uy * uy + uz * uz
    zeros = jnp.zeros_like(n)
    rows = [
        n,
        n * ux, n * uy, n * uz,
        n * u2,
        n * (3.0 * ux * ux - u2),
        n * (uy * uy - uz * uz),
        n * ux * uy, n * uy * uz, n * ux * uz,
    ] + [zeros] * (Q - 10)
    return jnp.stack(rows)


def force_moments(n: jnp.ndarray, u: jnp.ndarray, a: jnp.ndarray,
                  tau: float) -> jnp.ndarray:
    """Guo-style force moments with half-step prefactor (LBM_binary.H:404-449).

    Phi_1..3 = s n a;  stress modes from the symmetrized a (x) (n u) tensor;
    s = 1/(1 + 1/(2 tau)); ghost modes zero.
    """
    s = 1.0 / (1.0 + 1.0 / (2.0 * tau))
    ax, ay, az = a[0], a[1], a[2]
    ux, uy, uz = u[0], u[1], u[2]
    au = ax * ux + ay * uy + az * uz
    zeros = jnp.zeros_like(n)
    rows = [
        zeros,
        s * n * ax, s * n * ay, s * n * az,
        s * 2.0 * n * au,
        s * n * (6.0 * ax * ux - 2.0 * au),
        s * 2.0 * n * (ay * uy - az * uz),
        s * n * (ax * uy + ay * ux),
        s * n * (ay * uz + az * uy),
        s * n * (ax * uz + az * ux),
    ] + [zeros] * (Q - 10)
    return jnp.stack(rows)


def collide(f: jnp.ndarray, g: jnp.ndarray, h: Hydro,
            xi_f: jnp.ndarray, xi_g: jnp.ndarray,
            params: LBMParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One MRT collision for both species (LBM_binary.H:451-516)."""
    rho, phi = h.rho, h.phi
    v_b = (rho[None] * h.uf + phi[None] * h.ug) / (rho + phi)[None]

    mf_eq = equilibrium_moments(rho, v_b)
    mg_eq = equilibrium_moments(phi, v_b)
    phi_f = force_moments(rho, h.uf, h.af, params.tau_f)
    phi_g = force_moments(phi, h.ug, h.ag, params.tau_g)

    if (not FORCE_GENERAL_RELAX
            and params.tau_f == 0.5 and params.tau_g == 0.5):
        # Exact relaxation (lambda_bar = 1, the default of every
        # reference recipe): the collision replaces every non-conserved
        # moment by m_eq + Phi + xi outright — the incoming moments are
        # never consumed, so the forward transform is skipped entirely
        # (rho/u already live in h).  Mass row: m_eq[0] = h.rho, the
        # population sum hydrovars_bar computed.
        mf = mf_eq + phi_f + xi_f
        mg = mg_eq + phi_g + xi_g
    else:
        mf = moments(f)
        mg = moments(g)
        inv_tf = 1.0 / params.tau_f_bar
        inv_tg = 1.0 / params.tau_g_bar
        mf = mf + inv_tf * (mf_eq - mf) + phi_f + xi_f
        mg = mg + inv_tg * (mg_eq - mg) + phi_g + xi_g

    f1 = populations(mf)
    g1 = populations(mg)
    # Exact-mass restoration: the moments->populations round trip is
    # mass-preserving only in exact arithmetic; in f32 its rounding is
    # COHERENT across near-identical cells and biases total mass by
    # ~+1.5e-8/step (measured; +1.5% over an 800k-step production run —
    # see ACCEPTANCE.md C-model: the drift measurably shifts the
    # capillary spectrum).  The double-precision reference sits at
    # ~1e-17/step and never sees this.  Absorb the per-cell summation
    # defect into the rest population (algebraically zero, so f64
    # golden parity vs tests/reference_impl.py is unchanged).
    f1 = f1.at[0].add(mf[0] - jnp.sum(f1, axis=0))
    g1 = g1.at[0].add(mg[0] - jnp.sum(g1, axis=0))
    return f1, g1
