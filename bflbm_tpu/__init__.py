"""bflbm_tpu — TPU-native fluctuating binary-fluid lattice-Boltzmann framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MDProject/Binary-Fluctuating-Lattice-Boltzmann (AMReX + CUDA/MPI), designed
TPU-first: populations live as (19, X, Y, Z) arrays sharded over a
``jax.sharding.Mesh``, the collide-stream loop is one fused jitted step
(with a Pallas kernel on the hot path), thermal noise is counter-based and
decomposition-invariant, and the on-device spectral analysis (structure
factors) uses gather-free split-re/im matmul DFTs (``ops.rfft``; this TPU
backend has no complex dtypes, so there is no ``jnp.fft`` on the device
path — offline analysis on host uses ``numpy.fft``).
"""

from . import config, lattice, state  # noqa: F401
from .config import LBMParams, RunConfig, preset, preset_names  # noqa: F401
from .state import SimState  # noqa: F401

__version__ = "0.1.0"
