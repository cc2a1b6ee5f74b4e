"""Device mesh construction for spatial domain decomposition.

The reference's only parallel strategy is spatial data parallelism:
``BoxArray.maxSize`` + ``DistributionMapping`` splits the box over MPI
ranks (main_run_job.cpp:140-143, SURVEY.md §2.6).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` whose axes partition the spatial
axes of the (19, X, Y, Z) population arrays; ICI carries the halo traffic
(via XLA collective-permutes emitted for the streaming/stencil shifts) and
DCN is handled transparently for multi-host meshes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPATIAL_AXES = ("x", "y", "z")


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over the spatial axes.

    mesh_shape: per-axis device counts, e.g. (4, 2, 1).  Defaults to all
    devices along x (slab decomposition along the MAJOR-most axis): the
    production fused-kernel path (:mod:`bflbm_tpu.parallel.kernel`)
    keeps z resident per tile (in-register lane wraps) and exchanges
    x/y halos, so an x-major default routes multi-chip runs onto the
    fast path — a z-sharded mesh would silently degrade `--engine auto`
    to the jnp chunk engine.  The reference decomposes any axis
    (BoxArray.maxSize, main_run_job.cpp:140-143); here every layout is
    supported but x/y layouts are the performant ones.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1, 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != {n} devices")
    dev = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev, SPATIAL_AXES)


def field_spec(ndim_leading: int = 0) -> P:
    """PartitionSpec for an array with ndim_leading unsharded leading axes
    followed by (X, Y, Z) sharded over the mesh."""
    return P(*([None] * ndim_leading), *SPATIAL_AXES)


def population_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (19, X, Y, Z): replicate the population axis, shard
    space."""
    return NamedSharding(mesh, field_spec(1))


def scalar_field_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, field_spec(0))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh):
    """Shardings for the SimState pytree (f, g, key, step)."""
    from ..state import SimState

    return SimState(
        f=population_sharding(mesh),
        g=population_sharding(mesh),
        key=replicated(mesh),
        step=replicated(mesh),
    )


def shard_state(state, mesh: Mesh):
    """Place a SimState onto the mesh."""
    return jax.device_put(state, state_shardings(mesh))
