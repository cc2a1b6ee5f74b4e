"""Fluctuation-dissipation thermal noise for the binary FLBM.

Reference: ``thermal_noise`` (``LBM_binary.H:73-132``), Adhikari-style
per-relaxation-mode noise:

* mass mode (a=0): zero (LBM_binary.H:113-114);
* momentum modes (a=1..3): amplitude
  sqrt(2 (lam - lam^2/2) kBT |rho phi / rho_t|) with the g-species draw
  anti-correlated, xi_g = -xi_f (diffusive momentum exchange noise,
  LBM_binary.H:117-118);
* stress + ghost modes (a=4..18): amplitude
  sqrt(2 (lam - lam^2/2) kBT / cs^2 * b_a * |rho|), independent per
  species (LBM_binary.H:125-126);

with lam = 1/(tau + 1/2).  The reference also hard-wires
``tau_g_bar = tau_f_bar`` (LBM_binary.H:80); we use the per-species lam
(identical for the default tau_f = tau_g = 1/2 and strictly more general
otherwise).

The reference draws from per-thread sequential RNG engines
(``ParallelForRNG``), making results decomposition-dependent.  Here draws
are counter-based (threefry key folded with the step index), so the noise
field is bitwise reproducible for any device mesh.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import LBMParams
from ..lattice import B, CS2, Q


def _roll3(field: jnp.ndarray, shift):
    """Periodic translation by an integer 3-vector (COM-frame shift:
    cell x samples the reference state at x - shift, matching the
    reference's shifted-coordinate lookup)."""
    out = field
    for d in range(3):
        out = jnp.roll(out, shift[d], axis=d)
    return out


def noise_amplitudes(rho, phi, params: LBMParams, dtype=None):
    """Per-mode noise std-devs; returns (amp_mom, amp_ghost_f, amp_ghost_g).

    amp_mom: (X,Y,Z) shared momentum-mode amplitude.
    amp_ghost_*: (15, X, Y, Z) for modes a=4..18.
    """
    dtype = dtype or rho.dtype
    lam_f = params.lam_f
    lam_g = params.lam_g
    pref_f = 2.0 * (lam_f - 0.5 * lam_f * lam_f) * params.kBT
    pref_g = 2.0 * (lam_g - 0.5 * lam_g * lam_g) * params.kBT
    rhot = rho + phi
    reduced = jnp.where(jnp.abs(rhot) > params.div_eps, rho * phi / rhot, 0.0)
    amp_mom = jnp.sqrt(jnp.asarray(pref_f, dtype) * jnp.abs(reduced))
    b_ghost = jnp.asarray(B[4:], dtype).reshape((Q - 4,) + (1,) * rho.ndim)
    amp_gf = jnp.sqrt((pref_f / CS2) * b_ghost * jnp.abs(rho)[None])
    amp_gg = jnp.sqrt((pref_g / CS2) * b_ghost * jnp.abs(phi)[None])
    return amp_mom, amp_gf, amp_gg


def thermal_noise(key: jax.Array, rho: jnp.ndarray, phi: jnp.ndarray,
                  params: LBMParams,
                  ref_state=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw per-mode noise moments (xi_f, xi_g), each shape (19, X, Y, Z).

    ref_state: optional (rho_eq, phi_eq, com_shift) — the reference's
    ``USE_REF_STATE`` path (LBM_binary.H:92-106): amplitudes evaluated at
    a stored equilibrium state translated by the integer center-of-mass
    displacement instead of the instantaneous densities.
    """
    shape = rho.shape
    dtype = rho.dtype
    if not params.noise_on:
        z = jnp.zeros((Q,) + shape, dtype)
        return z, z
    if ref_state is not None:
        rho_eq, phi_eq, com_shift = ref_state
        shift = jnp.round(com_shift).astype(jnp.int32)
        rho = _roll3(jnp.asarray(rho_eq, dtype), shift)
        phi = _roll3(jnp.asarray(phi_eq, dtype), shift)
    amp_mom, amp_gf, amp_gg = noise_amplitudes(rho, phi, params, dtype)
    # One fused draw: 3 momentum + 15 f-ghost + 15 g-ghost normals.
    n = jax.random.normal(key, (33,) + shape, dtype)
    n_mom, n_gf, n_gg = n[:3], n[3:18], n[18:33]
    zero = jnp.zeros((1,) + shape, dtype)
    xi_mom = amp_mom[None] * n_mom
    xi_f = jnp.concatenate([zero, xi_mom, amp_gf * n_gf])
    xi_g = jnp.concatenate([zero, -xi_mom, amp_gg * n_gg])
    return xi_f, xi_g
