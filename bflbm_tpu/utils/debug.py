"""Runtime invariant guards: NaN sentinel, mass conservation, fluctuation
statistics (reference: Debug.H NaN sweep :75-149, PrintMassConservation
:233-249, compute_multifab_fluctuation :153-202)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def has_nonfinite(*arrays) -> jax.Array:
    """Device-side check; returns bool scalar (no host sync)."""
    bad = jnp.asarray(False)
    for a in arrays:
        bad = bad | ~jnp.all(jnp.isfinite(a))
    return bad


def nan_check(tree, where: str = "") -> None:
    """Host-side assertion sweep over a pytree (init/debug use)."""
    leaves = jax.tree_util.tree_leaves(tree)
    for i, leaf in enumerate(leaves):
        if not bool(jnp.all(jnp.isfinite(leaf))):
            raise FloatingPointError(
                f"non-finite values in leaf {i} {getattr(leaf, 'shape', ())} "
                f"at {where or 'check'}"
            )


def field_stats(field: jnp.ndarray) -> Dict[str, jax.Array]:
    return {
        "mean": jnp.mean(field),
        "std": jnp.std(field),
        "min": jnp.min(field),
        "max": jnp.max(field),
    }


def mass(f: jnp.ndarray) -> jax.Array:
    """Total mass of one species' populations."""
    return jnp.sum(f)


def total_momentum(f: jnp.ndarray, g: jnp.ndarray) -> jax.Array:
    from ..ops.hydro import momentum

    jf = momentum(f).sum(axis=(1, 2, 3))
    jg = momentum(g).sum(axis=(1, 2, 3))
    return jf + jg
