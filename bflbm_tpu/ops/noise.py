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


def _amplitude_fields(rho, phi, params: LBMParams, dtype, ref_state):
    """The (rho, phi) pair the amplitudes are evaluated at: the live
    densities, or — USE_REF_STATE (LBM_binary.H:92-106) — a stored
    equilibrium state translated by the integer COM displacement."""
    if ref_state is None:
        return rho, phi
    rho_eq, phi_eq, com_shift = ref_state
    shift = jnp.round(com_shift).astype(jnp.int32)
    return (_roll3(jnp.asarray(rho_eq, dtype), shift),
            _roll3(jnp.asarray(phi_eq, dtype), shift))


def _apply_amplitudes(n: jnp.ndarray, rho, phi, params: LBMParams,
                      dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(33, X, Y, Z) standard normals -> per-mode noise moments.

    Channel order (the fused kernel's draw order, fused_step._k_compute):
    0-2 momentum (shared, g anti-correlated), 3-17 f ghost modes a=4..18,
    18-32 g ghost modes.
    """
    shape = rho.shape
    amp_mom, amp_gf, amp_gg = noise_amplitudes(rho, phi, params, dtype)
    n_mom, n_gf, n_gg = n[:3], n[3:18], n[18:33]
    zero = jnp.zeros((1,) + shape, dtype)
    xi_mom = amp_mom[None] * n_mom
    xi_f = jnp.concatenate([zero, xi_mom, amp_gf * n_gf])
    xi_g = jnp.concatenate([zero, -xi_mom, amp_gg * n_gg])
    return xi_f, xi_g


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
    rho, phi = _amplitude_fields(rho, phi, params, dtype, ref_state)
    # One fused draw: 3 momentum + 15 f-ghost + 15 g-ghost normals.
    n = jax.random.normal(key, (33,) + shape, dtype)
    return _apply_amplitudes(n, rho, phi, params, dtype)


def hash_normal_stack(word, step, shape, dtype,
                      dist: str = "clt4") -> jnp.ndarray:
    """(33, X, Y, Z) standard normals from the fused kernel's
    coordinate-keyed hash stream, in kernel channel order.

    Pure in (word, step, global cell): this is the framework's analog of
    the reference's alternate RANDRAW draw ``draw_from_pdf_normal``
    (LBM_binary.H:42-63) — a per-cell keyed generator instead of one
    sequential bulk stream — and is bitwise the stream a
    ``noise_impl="hash"`` fused-kernel run consumes, which makes kernel
    trajectories reproducible (and auditable) from the jnp path.
    """
    from ..kernels.fused_step import hash_normals

    n1, n2 = hash_normals(jnp.asarray(word, jnp.int32),
                          jnp.asarray(step, jnp.int32),
                          (jnp.int32(0), jnp.int32(0)),
                          tuple(shape), tuple(shape), dtype, dist)
    # kernel draw a -> n1[a//2] / n2[a//2] interleave (fused_step normal())
    chans = [n1[a // 2] if a % 2 == 0 else n2[a // 2] for a in range(33)]
    return jnp.stack(chans)


def thermal_noise_hash(word, step, rho: jnp.ndarray, phi: jnp.ndarray,
                       params: LBMParams, ref_state=None,
                       dist: str = "clt4") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`thermal_noise` with the coordinate-keyed hash stream
    (see :func:`hash_normal_stack`) in place of the threefry bulk draw.

    With the same per-step (word, step) derivation the fused kernel uses,
    the jnp engine reproduces a ``noise_impl="hash"`` kernel trajectory's
    noise bitwise (tested in tests/test_fused_kernel.py).
    """
    shape = rho.shape
    dtype = rho.dtype
    if not params.noise_on:
        z = jnp.zeros((Q,) + shape, dtype)
        return z, z
    rho, phi = _amplitude_fields(rho, phi, params, dtype, ref_state)
    n = hash_normal_stack(word, step, shape, dtype, dist)
    return _apply_amplitudes(n, rho, phi, params, dtype)
