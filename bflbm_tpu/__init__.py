"""bflbm_tpu — TPU-native fluctuating binary-fluid lattice-Boltzmann framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MDProject/Binary-Fluctuating-Lattice-Boltzmann (AMReX + CUDA/MPI), designed
TPU-first: populations live as (19, X, Y, Z) arrays sharded over a
``jax.sharding.Mesh``, the collide-stream loop is one fused jitted step
(with a Pallas kernel on the hot path), thermal noise is counter-based and
decomposition-invariant, and all analysis (structure factors, interface
spectra, droplet observables) runs on device via ``jnp.fft``.
"""

from . import config, lattice, state  # noqa: F401
from .config import LBMParams, RunConfig, preset, preset_names  # noqa: F401
from .state import SimState  # noqa: F401

__version__ = "0.1.0"
