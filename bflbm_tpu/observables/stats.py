"""Global scalar observables: mass, momentum, COM, fluctuation stats.

Reference: ``update_com`` (LBM_hydrovs.H:27-60, three scratch MultiFabs +
4 global sums per call), fluctuation stats (Debug.H:153-228).  Each is a
single fused reduction here; under GSPMD the reduction lowers to a psum
over the mesh.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def center_of_mass(density: jnp.ndarray) -> jnp.ndarray:
    """Density-weighted COM in cell coordinates; returns (3,)."""
    shape = density.shape
    total = jnp.sum(density)
    coords = [
        jnp.arange(n, dtype=density.dtype).reshape(
            tuple(n if d == i else 1 for i in range(3)))
        for i, (n, d) in enumerate(zip(shape, range(3)))
    ]
    com = jnp.stack([jnp.sum(density * c) for c in coords]) / total
    return com


def density_fluctuation(density: jnp.ndarray) -> Dict[str, jax.Array]:
    """Mean/sigma monitor (PrintDensityFluctuation, Debug.H:210-228)."""
    return {"mean": jnp.mean(density), "sigma": jnp.std(density)}


def droplet_volume_ratio(rho: jnp.ndarray, rho_mid: float,
                         r_init_cells: float) -> jax.Array:
    """Mass-conservation monitor: fraction of cells above the interface
    midpoint density vs the initial droplet volume
    (PrintMassConservation, Debug.H:233-249)."""
    vol = jnp.sum((rho > rho_mid).astype(jnp.float32))
    vol0 = 4.0 / 3.0 * jnp.pi * r_init_cells ** 3
    return vol / vol0
