"""Population <-> moment transforms as 19x19 contractions.

Reference: hand-unrolled ``moments()`` / ``populations()``
(``LBM_d3q19.H:100-156`` / ``:167-247``).  Here both are a single
tensordot against the constant basis matrices from
:mod:`bflbm_tpu.lattice`; XLA maps the contraction onto the MXU and fuses
the surrounding elementwise work.

All contractions run at Precision.HIGHEST: on TPU the default matmul
precision truncates operands to bf16, which makes the per-step
moments->populations round-trip lossy at the 1e-3 level — fatal for mass
conservation and kBT~1e-5 fluctuation statistics.  These are 19-wide
contractions; full-precision cost is negligible next to HBM traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..lattice import M, M_INV


def moments(f: jnp.ndarray) -> jnp.ndarray:
    """m_k = sum_i M[k,i] f_i over the leading population axis."""
    mat = jnp.asarray(M, dtype=f.dtype)
    return jnp.tensordot(mat, f, axes=([1], [0]),
                         precision=jax.lax.Precision.HIGHEST)


def populations(m: jnp.ndarray) -> jnp.ndarray:
    """f_i = sum_k M_INV[i,k] m_k over the leading moment axis."""
    mat = jnp.asarray(M_INV, dtype=m.dtype)
    return jnp.tensordot(mat, m, axes=([1], [0]),
                         precision=jax.lax.Precision.HIGHEST)
