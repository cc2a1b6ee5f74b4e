"""Multi-chip production path: the fused Pallas kernel under shard_map.

The reference's defining scaling capability is MPI spatial decomposition
with per-step halo exchange (`main_run_job.cpp:140-147`, FillBoundary in
`LBM_binary.H:553-555`).  Here each device holds a local (X/mx, Y/my, Z)
block of the post-collide populations; per temporal-block sweep it

    1. exchanges 2*T-deep x halos and 8-deep y halos with its mesh
       neighbors via two `lax.ppermute` rounds per axis (axis-by-axis
       exchange covers the D3Q19 edge diagonals), assembling the
       pre-extended block the Pallas kernel's ext mode consumes
       (:func:`bflbm_tpu.kernels.fused_step._step_kernel` with
       ``ext_mode=True`` — single-fragment DMA loads, no periodic wrap);
    2. runs T fused K = collide∘stream steps entirely locally.

The y halo depth is _PY = 8 (not 2*T) because Mosaic requires 8-aligned
sublane DMA fragments; the extra rows cost bandwidth ~(8-2T)/BY.

Noise: all non-final temporal phases use the coordinate-keyed hash
stream (`hash_normals`) keyed by GLOBAL cell coordinates (the shard
origin rides in the kernel's scalar operands), so the overlap regions
recomputed on both sides of a shard boundary receive bitwise-identical
noise — the same mechanism that makes single-chip tile seams exact.
The final phase's per-tile hardware PRNG streams are disambiguated by a
global-tile hash.  Consequently the trajectory is identical for every
mesh layout when ``noise_impl="hash"`` (tested in tests/test_sharding).

z stays unsharded on the mesh: the kernel keeps the full z extent
resident per tile and wraps it with in-register rolls.  For z-sharded
meshes use the jnp halo path (:mod:`bflbm_tpu.parallel.halo`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import LBMParams
from ..kernels.fused_step import (_PY, _choose_tile, _fused_step_call,
                                  supports_shape)
from ..models import binary_fluid as model
from ..ops import collide as collide_ops, stream as stream_ops
from ..state import SimState
from . import halo as halo_par
from . import mesh as mesh_lib


def local_shape(mesh: Mesh, shape):
    """Per-device block shape for a global (X, Y, Z) domain."""
    sizes = tuple(mesh.shape[a] for a in mesh_lib.SPATIAL_AXES)
    if any(s % m for s, m in zip(shape, sizes)):
        raise ValueError(f"domain {shape} not divisible by mesh {sizes}")
    return tuple(s // m for s, m in zip(shape, sizes))


def supports(mesh: Mesh, shape, block: int = 2) -> bool:
    """True when the shard_map kernel path can run this global shape on
    this mesh (z unsharded, kernel-tileable local blocks, and local
    extents deep enough for the 2*block x halo / _PY y halo the
    ppermute exchange appends)."""
    try:
        loc = local_shape(mesh, shape)
    except ValueError:
        return False
    return (mesh.shape["z"] == 1 and supports_shape(loc)
            and loc[0] >= 2 * block and loc[1] >= _PY)


def make_kernel_nsteps(mesh: Mesh, params: LBMParams, n: int,
                       block: int = 2, tile=None, mode: str = "auto",
                       transform: str = "eo",
                       noise_impl: str = "hw", noise_dist: str = "clt4",
                       interpret: bool = False,
                       donate: bool = True):
    """n standard steps: fused Pallas kernel per shard + ppermute halos.

    Returns jitted SimState -> SimState over the mesh.  ``block`` = T
    K-steps per halo exchange (temporal blocking amortizes both the HBM
    halo traffic and the ICI exchange).  ``interpret`` runs the kernel
    in Pallas interpret mode (CPU dryrun; requires single-tile shards).
    """
    if n < 1:
        raise ValueError("n >= 1")
    if mesh.shape["z"] != 1:
        raise ValueError(
            "the fused-kernel shard_map path needs z unsharded (full-Z "
            "tiles with in-register z wrap); use engine='halo' for "
            "z-sharded meshes")
    names = mesh_lib.SPATIAL_AXES
    pspec = P(None, *names)

    def make_sweep(T, shape_loc, gdomain):
        tl = tile or _choose_tile(shape_loc, T, params.noise_on)
        px = 2 * T
        Xl, Yl = shape_loc[0], shape_loc[1]

        def local_sweep(f_loc, g_loc, words, step0):
            f_ext, g_ext = f_loc, g_loc
            f_ext = halo_par.exchange_halo(f_ext, "x", 1, px)
            g_ext = halo_par.exchange_halo(g_ext, "x", 1, px)
            f_ext = halo_par.exchange_halo(f_ext, "y", 2, _PY)
            g_ext = halo_par.exchange_halo(g_ext, "y", 2, _PY)
            ox0 = (jax.lax.axis_index("x") * Xl).astype(jnp.int32)
            oy0 = (jax.lax.axis_index("y") * Yl).astype(jnp.int32)
            seed = jnp.concatenate(
                [words, jnp.stack([step0, ox0, oy0])])
            return _fused_step_call(
                params, shape_loc, tl, params.noise_on, seed,
                f_ext, g_ext, mode, transform, T, noise_impl,
                noise_dist, gdomain=gdomain, ext_mode=True,
                interpret=interpret)

        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the checker would otherwise reject
        return shard_map(
            local_sweep, mesh=mesh,
            in_specs=(pspec, pspec, P(), P()),
            out_specs=(pspec, pspec),
            check_vma=False,
        )

    def run(state: SimState) -> SimState:
        gshape = tuple(state.f.shape[1:])
        shape_loc = local_shape(mesh, gshape)
        if not supports_shape(shape_loc):
            raise ValueError(
                f"local block {shape_loc} not kernel-tileable "
                "(need Z % 128 == 0, Y_local % 8 == 0)")
        if shape_loc[0] < 2 * max(1, min(block, n - 1)) \
                or shape_loc[1] < _PY:
            raise ValueError(
                f"local block {shape_loc} too shallow for the halo "
                f"exchange (need X_local >= {2 * block}, "
                f"Y_local >= {_PY}); use a coarser mesh or block=1")

        # enter post-collide space (jnp prelude + collide, GSPMD-sharded)
        h, xi_f, xi_g, key = model.prelude(state, params)
        f1, g1 = collide_ops.collide(state.f, state.g, h, xi_f, xi_g,
                                     params)

        n_k = n - 1
        T = max(1, min(block, n_k)) if n_k else 1
        n_blocked, n_rest = divmod(n_k, T) if n_k else (0, 0)

        def make_body(sweep_sm, T_):
            def body(carry, _):
                f, g, key, step = carry
                # one word per physical step (drawn from the per-step key
                # splits) — hash noise stream bitwise-invariant to T
                k = key
                words = []
                for _ in range(T_):
                    k, sub = jax.random.split(k)
                    words.append(jax.random.randint(
                        sub, (), minval=jnp.iinfo(jnp.int32).min,
                        maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32))
                f, g = sweep_sm(f, g, jnp.stack(words),
                                step.astype(jnp.int32))
                return (f, g, k, step + T_), None
            return body

        carry = (f1, g1, key, state.step + 1)
        if n_blocked:
            sweep_sm = make_sweep(T, shape_loc, gshape)
            carry, _ = jax.lax.scan(make_body(sweep_sm, T), carry, None,
                                    length=n_blocked)
        if n_rest:
            sweep1 = make_sweep(1, shape_loc, gshape)
            body1 = make_body(sweep1, 1)
            for _ in range(n_rest):
                carry, _ = body1(carry, None)
        f, g, key, step = carry
        return SimState(f=stream_ops.stream(f), g=stream_ops.stream(g),
                        key=key, step=step)

    sh = mesh_lib.state_shardings(mesh)
    return jax.jit(run, in_shardings=(sh,), out_shardings=sh,
                   donate_argnums=(0,) if donate else ())
