"""GSPMD-sharded step: jit the whole timestep with NamedShardings and let
XLA insert the halo collectives.

The reference performs ~6 explicit ``FillBoundary`` halo exchanges per
step (SURVEY.md §2.6); under GSPMD every ``jnp.roll`` in the streaming and
stencil ops lowers to a collective-permute of exactly the boundary slab,
and XLA fuses/schedules them with compute.  A manually-scheduled
``shard_map`` + ppermute path lives in :mod:`bflbm_tpu.parallel.halo` for
kernel-level control.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh

from ..config import LBMParams
from ..models import binary_fluid as model
from ..state import SimState
from . import mesh as mesh_lib


def make_sharded_step(mesh: Mesh, params: LBMParams, *,
                      with_hydro: bool = False, donate: bool = True,
                      ref_state=None):
    """Compile one timestep pinned to the mesh.

    Returns step(state) -> state (or (state, packed_hydro) if with_hydro).
    ref_state: optional (rho_eq, phi_eq, com_ref) — the reference's
    USE_REF_STATE noise path (LBM_binary.H:92-106) under GSPMD: the COM
    reduction becomes a psum and the integer COM-frame roll a collective
    permute; the threefry noise stream is decomposition-invariant, so
    trajectories match the single-device path on any mesh
    (tests/test_sharding.py).
    """
    from ..ops import hydro as hydro_ops

    sh = mesh_lib.state_shardings(mesh)
    fspec = mesh_lib.scalar_field_sharding(mesh)
    pop = mesh_lib.population_sharding(mesh)

    if with_hydro:
        def fn(state: SimState):
            new_state, h = model.step(state, params, ref_state)
            return new_state, hydro_ops.pack(h)

        out_sh = (sh, pop)  # packed hydro: (22, X, Y, Z)
    else:
        def fn(state: SimState):
            new_state, _ = model.step(state, params, ref_state)
            return new_state

        out_sh = sh

    return jax.jit(fn, in_shardings=(sh,), out_shardings=out_sh,
                   donate_argnums=(0,) if donate else ())


def make_sharded_nsteps(mesh: Mesh, params: LBMParams, n: int,
                        donate: bool = True):
    """Compile an n-step scan pinned to the mesh (benchmark inner loop)."""
    sh = mesh_lib.state_shardings(mesh)

    def fn(state: SimState):
        return model.nsteps(state, params, n)

    return jax.jit(fn, in_shardings=(sh,), out_shardings=sh,
                   donate_argnums=(0,) if donate else ())
