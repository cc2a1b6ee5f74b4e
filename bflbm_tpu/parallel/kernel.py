"""Multi-chip production path: the fused Pallas kernel under shard_map.

The reference's defining scaling capability is MPI spatial decomposition
with per-step halo exchange (`main_run_job.cpp:140-147`, FillBoundary in
`LBM_binary.H:553-555`).  Here each device holds a local (X/mx, Y/my, Z)
block of the post-collide populations; per temporal-block sweep it

    1. exchanges sd*T-deep x halos (sd = per-K stencil depth: 1
       uncoupled, 2 with the Shan-Chen gradient) and 8-deep y halos with its mesh
       neighbors via two `lax.ppermute` rounds per axis (axis-by-axis
       exchange covers the D3Q19 edge diagonals), assembling the
       pre-extended block the Pallas kernel's ext mode consumes
       (:func:`bflbm_tpu.kernels.fused_step._step_kernel` with
       ``ext_mode=True`` — single-fragment DMA loads, no periodic wrap);
    2. runs T fused K = collide∘stream steps entirely locally.

    With ``overlap`` (the default on sharded axes) the sweep is SPLIT so
    the ICI exchange hides under compute: an interior call covering the
    out domain shrunk by the halo depth consumes only the un-exchanged
    local block (its ext pads fall inside it), while four narrow seam
    bands — the only consumers of the ppermuted halos — run after it.
    XLA's latency-hiding scheduler can then start the collective
    permutes, execute the (~90% of cells) interior kernel, and complete
    the permutes before the seam calls need them, leaving only the seam
    compute exposed.  The split costs ~9% extra HBM reads (the band ext
    inputs re-read the band neighborhoods), which is why it is gated on
    the mesh axis actually being sharded.

The y halo PAD depth is _PY = 8 (not sd*T) because Mosaic requires
8-aligned sublane DMA fragments — but only the sd*T consumed rows ride
the ppermute; the alignment remainder is zero-filled locally
(exchange_halo pad_to), so the y ICI volume matches the stencil, not
the alignment.

When the mesh leaves y UNSHARDED (every 1-D production layout — the
session permutes a sharded z onto x, and mesh_axis_perm prefers
y-unsharded permutations) the serial sweep runs NO y exchange at all:
the kernel maintains the output's y pad slabs with periodic wrap data
via two extra 8-row-aligned out DMAs per y-edge tile (fused_step
wrap_y), and the x strips ship full height so the pad rows' corners
refresh through the x exchange.  The y slice/DUS ops this removes are
2-row strided pieces and measured ~0.92 ms/step at 256^3 — ~95% of the
whole exchange cost (benchmarks/results/shard_r4e.json).

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
from ..kernels.fused_step import (_DEFAULT_TRANSFORM, _PY, _choose_tile,
                                  _fused_step_call, sd_depth,
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
    sizes = tuple(mesh.shape[a] for a in mesh_lib.SPATIAL_AXES)
    return _supports_sizes(sizes, tuple(shape), block)


def _supports_sizes(sizes, shape, block: int) -> bool:
    if any(s % m for s, m in zip(shape, sizes)):
        return False
    loc = tuple(s // m for s, m in zip(shape, sizes))
    return (sizes[2] == 1 and supports_shape(loc)
            and loc[0] >= 2 * block and loc[1] >= _PY)


def mesh_axis_perm(mesh: Mesh, shape, block: int = 2):
    """Spatial permutation p putting (mesh, domain) on the kernel fast
    path (permuted mesh axis k shards old axis p[k]), or None.

    The reference decomposes ANY axis at one speed (BoxArray.maxSize,
    main_run_job.cpp:140-143); the fused kernel needs z unsharded and
    8/128-aligned local y/z extents, so e.g. a ``--mesh 1 1 8``
    z-slab layout runs as an x-slab layout in the permuted lattice
    frame (D3Q19+MRT+FDT is exactly permutation-equivariant — see
    fused_step.axis_perm_for_shape).  Preference order: a permutation
    leaving the mesh's y axis UNSHARDED (the serial sweep then runs the
    kernel-maintained wrap_y pads instead of the ~0.92 ms/step strided
    y exchange — shard_r4e.json), then identity, then the largest lane
    (z) extent.  In particular every 1-D mesh lands y-unsharded."""
    shape = tuple(shape)
    sizes = tuple(mesh.shape[a] for a in mesh_lib.SPATIAL_AXES)
    cands = []
    for p in ((0, 1, 2), (0, 2, 1), (1, 0, 2), (2, 0, 1), (1, 2, 0),
              (2, 1, 0)):
        sp = tuple(shape[a] for a in p)
        mp = tuple(sizes[a] for a in p)
        if _supports_sizes(mp, sp, block):
            cands.append(p)
    if not cands:
        return None

    def score(p):
        return (sizes[p[1]] == 1, p == (0, 1, 2), shape[p[2]])

    return max(cands, key=score)


def _pad_exchange_x(a, pad, ship, n_int, y0, n_y):
    """Refresh the x pad slabs of a padded-layout array
    [pad | n_int | pad] along local axis 1 (mesh axis "x"): ship the
    `ship`-deep interior boundary strips to the ring neighbors and
    write them into the INNERMOST `ship` rows of the pads IN PLACE
    (dynamic_update_slice — no full-array concat).  ``pad >= ship``:
    the buffer pad depth is fixed at sd*block for a whole advance
    (resident layout) while a T<block remainder phase ships only
    sd*T rows — the outer pad rows are never read by that phase.
    Strips span only the interior y rows [y0, y0+n_y) (the y pads are
    refreshed AFTER x, full-width, which is what fills the diagonal
    corners — same two-hop order as the old concat exchange)."""
    lo_src = jax.lax.slice(
        a, (0, pad, y0, 0),
        (a.shape[0], pad + ship, y0 + n_y, a.shape[3]))
    hi_src = jax.lax.slice(
        a, (0, pad + n_int - ship, y0, 0),
        (a.shape[0], pad + n_int, y0 + n_y, a.shape[3]))
    n = jax.lax.psum(1, "x")
    if n == 1:
        lo_halo, hi_halo = hi_src, lo_src
    else:
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        # my left pad = right edge of left neighbor (data moves +1)
        lo_halo = jax.lax.ppermute(hi_src, "x", fwd)
        hi_halo = jax.lax.ppermute(lo_src, "x", bwd)
    a = jax.lax.dynamic_update_slice(a, lo_halo, (0, pad - ship, y0, 0))
    a = jax.lax.dynamic_update_slice(a, hi_halo, (0, pad + n_int, y0, 0))
    return a


def _pad_exchange_y(a, py, ship, n_int, fill_zeros=True):
    """Refresh the y pad slabs [py | n_int | py] along local axis 2
    (mesh axis "y"): ship only the `ship` consumed rows (full padded x
    width — the x pads were just refreshed, so this carries the corner
    data), zero-fill the py - ship Mosaic-alignment rows (bitwise what
    exchange_halo(pad_to=) produced).  fill_zeros=False skips the
    zero rows for buffers whose pads persist across sweeps (the
    ping-pong carry: laid down once at phase entry, never written
    after)."""
    lo_src = jax.lax.slice_in_dim(a, py, py + ship, axis=2)
    hi_src = jax.lax.slice_in_dim(a, py + n_int - ship, py + n_int,
                                  axis=2)
    n = jax.lax.psum(1, "y")
    if n == 1:
        lo_halo, hi_halo = hi_src, lo_src
    else:
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        lo_halo = jax.lax.ppermute(hi_src, "y", fwd)
        hi_halo = jax.lax.ppermute(lo_src, "y", bwd)
    a = jax.lax.dynamic_update_slice(a, lo_halo, (0, 0, py - ship, 0))
    a = jax.lax.dynamic_update_slice(a, hi_halo, (0, 0, py + n_int, 0))
    if fill_zeros and py > ship:
        zshape = (a.shape[0], a.shape[1], py - ship, a.shape[3])
        z = jnp.zeros(zshape, a.dtype)
        a = jax.lax.dynamic_update_slice(a, z, (0, 0, 0, 0))
        a = jax.lax.dynamic_update_slice(
            a, z, (0, 0, py + n_int + ship, 0))
    return a


# Benchmark hook (benchmarks/tpu_overlap_r5.py, VERDICT r4 #3): when
# set to an int k, the overlap-split sweep runs only the FIRST k seam-
# band calls (order: x-lo, x-hi, y-lo, y-hi) — PHYSICS-WRONG (the
# skipped bands' cells are uninitialized pallas output), timing-only.
# Read at trace time; set before building a session/advance.
SPLIT_DEBUG = None


def _strip_exchange(lo, hi, pad, ship, n_int, rows=None):
    """Ship the kernel-written y-edge strips to the y ring neighbors
    and patch the received strips' x pad columns with the x
    neighbors' columns (which carry the DIAGONAL corner data, since
    every rank's strips arrive from its own y neighbor first — the
    same two-hop corner order as the old exchange).  lo/hi are MY edge
    strips (interior rows [0, _PY) / [Yl-_PY, Yl)); returns the strips
    to mount BELOW/ABOVE my interior (on a 1-rank y axis that is the
    periodic self-wrap, which is how the strips path is validated
    against wrap_y on single-chip hardware).

    rows: the stencil consumes only this many strip rows adjacent to
    the interior (sd*T; r4b proved the far rows zero-replaceable
    bitwise for the identical DUS-mode geometry) — on multi-rank y
    axes only those rows ride the ICI ppermute and the far rows are
    zero-filled locally, a 4x y-ICI cut for the uncoupled block=2
    case.  1-rank axes keep the free whole-strip self-wrap."""
    n = jax.lax.psum(1, "y")
    if n == 1:
        lo_h, hi_h = hi, lo
    else:
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        k = _PY if rows is None else int(rows)
        if k < _PY:
            # lo_h mounts at ext rows [0, _PY): consumed rows are the
            # LAST k (nearest the interior) = the sender's hi-strip
            # tail; hi_h mounts above: consumed rows are the FIRST k
            zshape = list(lo.shape)
            zshape[2] = _PY - k
            z = jnp.zeros(zshape, lo.dtype)
            lo_h = jnp.concatenate(
                [z, jax.lax.ppermute(
                    jax.lax.slice_in_dim(hi, _PY - k, _PY, axis=2),
                    "y", fwd)], axis=2)
            hi_h = jnp.concatenate(
                [jax.lax.ppermute(
                    jax.lax.slice_in_dim(lo, 0, k, axis=2),
                    "y", bwd), z], axis=2)
        else:
            lo_h = jax.lax.ppermute(hi, "y", fwd)
            hi_h = jax.lax.ppermute(lo, "y", bwd)
    lo_h = _pad_exchange_x(lo_h, pad, ship, n_int, 0, _PY)
    hi_h = _pad_exchange_x(hi_h, pad, ship, n_int, 0, _PY)
    return lo_h, hi_h


def _split_flags(mesh: Mesh, params: LBMParams, overlap):
    """Per-axis ICI-overlap split request (before feasibility): see the
    ``overlap`` doc in :func:`make_kernel_nsteps`."""
    if overlap == "force":
        return True, True
    if overlap == "auto":
        # Profit gate, round-5 measurements (overlap_r5d.json): the
        # compact-band split costs ~1.9 ms/step at 256^3-local
        # (+19.5% fluct, +18.2% determ), while the serial exchange it
        # would hide is nearly free on single-host meshes since
        # wrap_y/strips (~0.03 ms y-unsharded, ~0.25 ms strips —
        # shard_r4e/shard_r5.json) plus ~2 ms of ICI strip transfer
        # on a real v5e ring — about break-even at best.  So 'auto'
        # now keeps the SERIAL sweep for every single-host config,
        # deterministic included (the r4 gate split determ runs on the
        # pre-r4e numbers where the serial exchange cost ~1 ms).
        # Pass overlap=True where the exchange is the larger term —
        # DCN multi-host, very large T — the split then hides it at
        # the measured ~1.9 ms/step premium.
        return False, False
    if overlap:
        return mesh.shape["x"] > 1, mesh.shape["y"] > 1
    return False, False


def wants_split(mesh: Mesh, params: LBMParams, overlap) -> bool:
    """True when this (mesh, params, overlap) requests the split sweep
    — i.e. the serial padded-carry layout will NOT be used, so a
    session cannot keep its state resident in the padded layout."""
    return any(_split_flags(mesh, params, overlap))


def state_pad_sm(mesh: Mesh, shape_loc, pad: int, prime_wrap: bool):
    """shard_map fn embedding a (Q, Xl, Yl, Zl)-per-device array into
    the kernel's padded ext layout (Q, Xl+2*pad, Yl+2*_PY, Zl), zeroed
    pads.  prime_wrap additionally fills the y pads with the full-_PY
    periodic wrap (wrap_y sweeps never exchange y — the kernel
    maintains the pads from the first sweep on, see fused_step
    wrap_y)."""
    Xl, Yl, Zl = shape_loc
    pspec = P(None, *mesh_lib.SPATIAL_AXES)

    def pad_one(x_loc):
        buf = jnp.zeros(
            (x_loc.shape[0], Xl + 2 * pad, Yl + 2 * _PY, Zl),
            x_loc.dtype)
        buf = jax.lax.dynamic_update_slice(buf, x_loc, (0, pad, _PY, 0))
        if prime_wrap:
            buf = _pad_exchange_y(buf, _PY, _PY, Yl)
        return buf

    return shard_map(pad_one, mesh=mesh, in_specs=(pspec,),
                     out_specs=pspec, check_vma=False)


def state_unpad_sm(mesh: Mesh, shape_loc, pad: int):
    """Inverse of :func:`state_pad_sm`: slice the interior window out
    of the padded ext layout."""
    Xl, Yl, Zl = shape_loc
    pspec = P(None, *mesh_lib.SPATIAL_AXES)

    def unpad_one(x_pad):
        return jax.lax.slice(
            x_pad, (0, pad, _PY, 0),
            (x_pad.shape[0], pad + Xl, _PY + Yl, Zl))

    return shard_map(unpad_one, mesh=mesh, in_specs=(pspec,),
                     out_specs=pspec, check_vma=False)


def make_kernel_nsteps(mesh: Mesh, params: LBMParams, n: int,
                       block: int = 2, tile=None, mode: str = "auto",
                       transform: str = _DEFAULT_TRANSFORM,
                       noise_impl: str = "hw", noise_dist: str = "clt4",
                       interpret: bool = False,
                       donate: bool = True, overlap="auto",
                       use_ref: bool = False, y_exchange: str = "auto"):
    """n standard steps: fused Pallas kernel per shard + ppermute halos.

    Returns jitted SimState -> SimState over the mesh.  ``block`` = T
    K-steps per halo exchange (temporal blocking amortizes both the HBM
    halo traffic and the ICI exchange).  ``interpret`` runs the kernel
    in Pallas interpret mode (CPU dryrun; requires single-tile shards).

    ``use_ref``: the returned fn takes a second argument ref2 — the
    GLOBAL (2, X, Y, Z) COM-rolled (rho_eq, phi_eq) stack (USE_REF_STATE,
    LBM_binary.H:92-106), sharded like the fields — and evaluates the
    noise amplitudes at it.  The stack is static over the n steps, so it
    is ppermute-extended alongside the population halos each sweep (its
    halo is 2/38 of the field traffic) and rides the kernel's third
    streamed operand.

    ``overlap`` controls ICI/compute overlap (the comm/compute design
    point of SURVEY.md §5; the reference never overlapped its per-step
    ``FillBoundary``, LBM_binary.H:553-555).  When active, each sweep is
    split into an INTERIOR kernel call whose inputs are entirely local
    (the out domain shrunk by the halo depth, so its ext-mode pads come
    from the un-exchanged local block) plus narrow seam-band calls that
    consume the ppermuted halos; the interior call carries no data
    dependence on any collective, so XLA's latency-hiding scheduler can
    run the ICI transfers underneath it, leaving only the ~10% seam
    compute exposed.  Values: "auto" (split along actually-sharded mesh
    axes when the local extents afford it), "force" (split both axes
    regardless of mesh — used for single-chip hardware validation of
    the exact multi-chip call structure), False (serial: exchange, then
    one whole-block call).
    """
    if n < 1:
        raise ValueError("n >= 1")
    if mesh.shape["z"] != 1:
        raise ValueError(
            "the fused-kernel shard_map path needs z unsharded (full-Z "
            "tiles with in-register z wrap); use a kernel session "
            "(kernels.session, which permutes the mesh) or "
            "engine='halo' for z-sharded meshes")
    advance = _make_advance(mesh, params, block, tile, mode, transform,
                            noise_impl, noise_dist, interpret, overlap,
                            use_ref, y_exchange=y_exchange)

    def run(state: SimState, ref2=None) -> SimState:
        # enter post-collide space (jnp prelude + collide, GSPMD-sharded)
        ref_st = None if ref2 is None else (ref2[0], ref2[1], None)
        h, xi_f, xi_g, key = model.prelude(state, params, ref_st)
        f1, g1 = collide_ops.collide(state.f, state.g, h, xi_f, xi_g,
                                     params)
        pc = SimState(f=f1, g=g1, key=key, step=state.step + 1)
        pc = advance(pc, ref2, n - 1)
        return SimState(f=stream_ops.stream(pc.f),
                        g=stream_ops.stream(pc.g),
                        key=pc.key, step=pc.step)

    sh = mesh_lib.state_shardings(mesh)
    if use_ref:
        ref_sh = jax.sharding.NamedSharding(
            mesh, P(None, *mesh_lib.SPATIAL_AXES))
        return jax.jit(run, in_shardings=(sh, ref_sh), out_shardings=sh,
                       donate_argnums=(0,) if donate else ())

    def run_noref(state: SimState) -> SimState:
        return run(state)

    return jax.jit(run_noref, in_shardings=(sh,), out_shardings=sh,
                   donate_argnums=(0,) if donate else ())


def make_kernel_ksteps(mesh: Mesh, params: LBMParams, n: int,
                       block: int = 2, tile=None, mode: str = "auto",
                       transform: str = _DEFAULT_TRANSFORM,
                       noise_impl: str = "hw", noise_dist: str = "clt4",
                       interpret: bool = False, overlap="auto",
                       use_ref: bool = False, resident: bool = False,
                       pad_x=None, y_exchange: str = "auto",
                       mass_restore=None):
    """n K = collide∘stream steps in POST-COLLIDE space (no jnp
    entry/exit) — the sharded building block of the persistent-session
    path (:mod:`bflbm_tpu.kernels.session`).  Returns an UNJITTED
    fn(pc [, ref2]) -> pc; the session jits it with the mesh
    shardings.  See fused_step.make_ksteps for the state convention.

    ``resident``: the input AND output state are already in the padded
    ext layout (state_pad_sm with pad ``pad_x``) — the session keeps
    the state resident there across advance() calls, eliminating the
    once-per-advance pad/unpad that measured ~0.28 ms/step at
    100-step production chunks (shard_r4e.json ms_layout).  Requires
    the serial padded-carry sweep (``not wants_split(...)``).
    ``pad_x`` pins the buffer x-pad depth (>= sd*T for every phase;
    the session passes sd*block so every advance(n) shares one
    layout)."""
    advance = _make_advance(mesh, params, block, tile, mode, transform,
                            noise_impl, noise_dist, interpret, overlap,
                            use_ref, resident=resident, pad_x=pad_x,
                            y_exchange=y_exchange,
                            mass_restore=mass_restore)

    def run_k(pc: SimState, ref2=None) -> SimState:
        return advance(pc, ref2, n)

    return run_k


def _make_advance(mesh: Mesh, params: LBMParams, block, tile, mode,
                  transform, noise_impl, noise_dist, interpret, overlap,
                  use_ref, resident=False, pad_x=None,
                  y_exchange: str = "auto", mass_restore=None):
    """Shared sweep machinery: traced fn(pc, ref2, n_k) advancing a
    post-collide SimState n_k K-steps via shard_map kernel sweeps.
    See make_kernel_ksteps for ``resident`` / ``pad_x``.

    ``y_exchange`` picks the serial sweep's y-halo mechanism:
    "auto" — y unsharded: kernel-maintained periodic wrap pads (wrap_y,
    round 4e); y sharded: separate-strip kernel operands (round 5,
    VERDICT r4 #2 — the kernel writes its interior edge rows into
    compact strip buffers, the sweep ppermutes them whole and the next
    kernel call reads them as extra operands; no strided y slice/DUS
    ops at all, the ~0.92 ms/step residual of the r4d path).
    "strips" — force the strip path even on y-unsharded meshes (the
    1-rank ppermute degenerates to the periodic self-wrap: single-chip
    hardware validation + A/B against wrap_y).
    "dus" — the r4d in-place dynamic_update_slice exchange (A/B
    baseline)."""
    names = mesh_lib.SPATIAL_AXES
    pspec = P(None, *names)
    if y_exchange not in ("auto", "strips", "dus"):
        raise ValueError(f"y_exchange {y_exchange!r}")
    use_wrap_y = mesh.shape["y"] == 1 and y_exchange == "auto"
    use_strips = (y_exchange == "strips"
                  or (y_exchange == "auto" and mesh.shape["y"] > 1))

    def make_sweep(T, shape_loc, gdomain, PX):
        # stencil depth per K (see fused_step._step_kernel): the
        # uncoupled case exchanges a T-deep x halo, not 2T — half
        # the ICI volume on sharded x.  PX >= px is the buffer pad
        # depth of the padded-carry layout (serial sweeps only); the
        # kernel reads its ext window at origin PX - px.
        sd = sd_depth(params)
        px = sd * T
        assert PX >= px, (PX, px)
        Xl, Yl, Zl = shape_loc
        # split feasibility: the interior out domain (shrunk by the halo
        # depth on each split axis) must stay non-empty and kernel-shaped,
        # and — for correctness of the overlap claim — every SHARDED axis
        # must be split (otherwise the interior's ext pad on that axis
        # would itself ride an ICI exchange).  Any infeasible wanted axis
        # therefore drops the whole sweep back to the serial path.
        want_x, want_y = _split_flags(mesh, params, overlap)
        sx = want_x and Xl - 2 * px >= 2
        sy = want_y and Yl - 2 * _PY >= 8
        if (want_x and not sx) or (want_y and not sy):
            sx = sy = False
        split = sx or sy
        # use_ref tightens the VMEM budget (the ref stack is a third
        # streamed operand) — must thread through or large local shards
        # can exceed the ~127 MB scoped-VMEM limit (the exact compile
        # failure _choose_tile's 28 MB use_ref budget exists to avoid)
        tl = tile or _choose_tile(shape_loc, T, params.noise_on,
                                  use_ref=use_ref)

        def call(shape_c, tl_c, seed, fi, gi, ri=None, win=(0, 0),
                 odomain=None, owin=(0, 0), out_alias=None,
                 wrap_y=False, ystrips=None):
            return _fused_step_call(
                params, shape_c, tl_c, params.noise_on, seed, fi, gi,
                mode, transform, T, noise_impl, noise_dist,
                gdomain=gdomain, ext_mode=True, interpret=interpret,
                ref=ri, win=win, odomain=odomain, owin=owin,
                out_alias=out_alias, wrap_y=wrap_y, ystrips=ystrips)

        def pick(shape_c):
            if interpret:        # single-tile grids only (CLAUDE.md)
                return (shape_c[0], shape_c[1])
            return _choose_tile(shape_c, T, params.noise_on,
                                use_ref=use_ref)

        def pick_band(shape_c):
            """Seam-band tiles.  y bands are _PY-thin with full-Xl
            width (see `band` below), so the x tiling is free to match
            the interior-proven bx=16 (larger bx, e.g. (31,8) on a
            248-wide band, register-spills ~50 MB and blows the scoped
            VMEM — measured); x bands are 2T-thin and tile y like the
            interior."""
            if interpret:
                return (shape_c[0], shape_c[1])
            wx, wy, Zc = shape_c
            if wy > _PY:                     # x band: thin axis is x
                return _choose_tile(shape_c, T, params.noise_on,
                                    use_ref=use_ref)
            def best(n, target):
                divs = [d for d in range(1, n + 1) if n % d == 0]
                return min(divs, key=lambda d: (abs(d - target), d))
            return (best(wx, 16), wy)

        # only px = sd*T y rows are consumed by any stencil; the
        # remaining _PY-alignment rows are zero-filled locally instead
        # of riding the ICI exchange (4x y-volume cut at uncoupled b2)
        py_ship = min(px, _PY)

        if not split:
            # --- serial sweep, PADDED-CARRY layout: the state flows
            # between sweeps in the kernel's ext layout
            # (Q, Xl + 2*px, Yl + 2*_PY, Z).  Each sweep refreshes ONLY
            # the pad slabs (ppermute strips + in-place
            # dynamic_update_slice) and the kernel writes its interior
            # output window into a same-layout buffer (odomain/owin) —
            # eliminating the full-local-block concat the old exchange
            # materialized every sweep (measured: the fixed ~3.5 ms/step
            # it cost dominated the sharded path once the exact-
            # relaxation cut made the compute cheaper; single-device
            # 1720 vs sharded-serial 1177 MLUPS at fluct b2 clt2,
            # overlap_r4c.json).  The kernel reads bitwise-identical ext
            # values: strips adjacent to the interior carry the shipped
            # rows, the Mosaic-alignment remainder is zero-filled —
            # exactly what exchange_halo(pad_to=) assembled.
            # The state flows between sweeps in the padded layout;
            # each sweep refreshes only the pad slabs (ppermute strips +
            # in-place dynamic_update_slice) and the kernel writes its
            # interior window into a fresh same-layout buffer.  The
            # Mosaic-alignment rows beyond the py_ship consumed rows are
            # zero-filled per sweep (fresh pallas outputs hold garbage
            # there; the rows are provably unconsumed — r4b replaced
            # real shipped data with zeros bitwise — but deterministic
            # zeros keep every buffer-content invariant testable).
            # NOTE an input_output_aliases ping-pong variant (pads
            # persist, no zero refill) measured SLOWER (858 vs 1393
            # MLUPS): XLA inserts defensive copies for aliased scan
            # carries.
            pXl, pYl = Xl + 2 * PX, Yl + 2 * _PY
            wx0 = PX - px  # ext window origin for a PX-padded buffer
            # wrap_y (y unsharded — every 1-D production mesh, since the
            # session permutes a sharded z onto x): the KERNEL maintains
            # the y pads with periodic wrap data (fused_step wrap_y),
            # so the sweep runs NO y exchange at all, and the x exchange
            # ships FULL-height strips (the y-pad rows' corner columns
            # refresh through them).  The y slice/DUS ops it replaces
            # moved 2-row strided pieces and measured ~0.92 ms/step at
            # 256^3 — ~95% of the whole exchange cost
            # (benchmarks/results/shard_r4e.json nox/noy decomposition).
            # use_strips (round 5): the same idea for Y-SHARDED meshes —
            # the kernel writes compact edge strips, the sweep
            # ppermutes them whole and the next call reads them as
            # separate operands (see _make_advance y_exchange doc).
            wrap_y = use_wrap_y

            def seed_of(words, step0):
                ox0 = (jax.lax.axis_index("x") * Xl).astype(jnp.int32)
                oy0 = (jax.lax.axis_index("y") * Yl).astype(jnp.int32)
                return jnp.concatenate(
                    [words, jnp.stack([step0]),
                     jnp.stack([ox0, oy0]).astype(jnp.int32)])

            tl_c = tl if not interpret else (Xl, Yl)

            if use_strips:
                def local_sweep_strips(f_pad, g_pad, flo, fhi, glo, ghi,
                                       words, step0, *maybe_ref):
                    r_pad = maybe_ref[0] if maybe_ref else None
                    f_pad = _pad_exchange_x(f_pad, PX, px, Xl, _PY, Yl)
                    g_pad = _pad_exchange_x(g_pad, PX, px, Xl, _PY, Yl)
                    flo, fhi = _strip_exchange(flo, fhi, PX, px, Xl,
                                               rows=py_ship)
                    glo, ghi = _strip_exchange(glo, ghi, PX, px, Xl,
                                               rows=py_ship)
                    return call(shape_loc, tl_c, seed_of(words, step0),
                                f_pad, g_pad, r_pad, win=(wx0, 0),
                                odomain=(pXl, pYl, Zl), owin=(PX, _PY),
                                ystrips=(flo, fhi, glo, ghi))

                sm = shard_map(
                    local_sweep_strips, mesh=mesh,
                    in_specs=(pspec,) * 6 + (P(), P())
                    + ((pspec,) if use_ref else ()),
                    out_specs=(pspec,) * 6,
                    check_vma=False,
                )
                return sm, (px, py_ship), True

            def local_sweep_padded(f_pad, g_pad, words, step0,
                                   *maybe_ref):
                r_pad = maybe_ref[0] if maybe_ref else None
                if wrap_y:
                    f_pad = _pad_exchange_x(f_pad, PX, px, Xl, 0, pYl)
                    g_pad = _pad_exchange_x(g_pad, PX, px, Xl, 0, pYl)
                else:
                    f_pad = _pad_exchange_x(f_pad, PX, px, Xl, _PY, Yl)
                    g_pad = _pad_exchange_x(g_pad, PX, px, Xl, _PY, Yl)
                    # fill_zeros=False: the _PY - py_ship Mosaic-
                    # alignment rows beyond the shipped strips hold
                    # stale pallas-output garbage after the first
                    # sweep, and that is FINE — the stencil consumes
                    # exactly py_ship = sd*T rows (r4b replaced real
                    # shipped data with zeros bitwise), the strip
                    # sources below slice interior rows only, and
                    # unpad_sm never reads pads.  Zero-refilling them
                    # cost a measured ~0.7 ms/step of pure HBM writes
                    # (shard_r4e.json); phase entry (pad_sm) still
                    # zero-initializes every pad for the first sweep.
                    f_pad = _pad_exchange_y(f_pad, _PY, py_ship, Yl,
                                            fill_zeros=False)
                    g_pad = _pad_exchange_y(g_pad, _PY, py_ship, Yl,
                                            fill_zeros=False)
                return call(shape_loc, tl_c, seed_of(words, step0),
                            f_pad, g_pad, r_pad, win=(wx0, 0),
                            odomain=(pXl, pYl, Zl), owin=(PX, _PY),
                            wrap_y=wrap_y)

            sm = shard_map(
                local_sweep_padded, mesh=mesh,
                in_specs=(pspec, pspec, P(), P())
                + ((pspec,) if use_ref else ()),
                out_specs=(pspec, pspec),
                check_vma=False,
            )
            return sm, (px, py_ship), False

        # --- split sweep on the PADDED CARRY (round 5) ---------------
        # The r4 split materialized FULL exchanged ext blocks
        # (exchange_halo concat: ~2.8 GB/sweep of pure HBM copy at
        # 256^3 — overlap_r5b.json pinned 8.26 of the 9.2 ms/step
        # split penalty on exactly this), and the first compact-band
        # rework still concatenated band-sized inputs (~0.5 GB/sweep).
        # Now the split shares the serial sweep's padded-carry layout:
        # pads refresh via thin ppermute strips + in-place DUS
        # (_pad_exchange_{x,y}, x first so y strips carry the diagonal
        # corners), the interior call reads a ZERO-COPY window of the
        # padded state that touches no pad on a split axis — so XLA's
        # scheduler runs the exchange collectives under it — and each
        # band reads its own zero-copy window (win offsets only) and
        # writes a compact output assembled with in-place
        # dynamic_update_slice into the padded assembly buffer.
        pXl, pYl = Xl + 2 * PX, Yl + 2 * _PY
        wx0 = PX - px
        Xi = Xl - 2 * px if sx else Xl
        Yi = Yl - 2 * _PY if sy else Yl
        xi0 = px if sx else 0
        yi0 = _PY if sy else 0

        def local_sweep_split(f_pad, g_pad, words, step0, *maybe_ref):
            r_pad = maybe_ref[0] if maybe_ref else None
            ox0 = (jax.lax.axis_index("x") * Xl).astype(jnp.int32)
            oy0 = (jax.lax.axis_index("y") * Yl).astype(jnp.int32)
            base = jnp.concatenate([words, jnp.stack([step0])])

            def seed_at(dx, dy):
                return jnp.concatenate(
                    [base, jnp.stack([ox0 + jnp.int32(dx),
                                      oy0 + jnp.int32(dy)])])

            # pad refresh: only the bands consume pads on split axes
            # (1-rank axes degenerate to the free local self-wrap)
            f_pad = _pad_exchange_x(f_pad, PX, px, Xl, _PY, Yl)
            g_pad = _pad_exchange_x(g_pad, PX, px, Xl, _PY, Yl)
            f_pad = _pad_exchange_y(f_pad, _PY, py_ship, Yl,
                                    fill_zeros=False)
            g_pad = _pad_exchange_y(g_pad, _PY, py_ship, Yl,
                                    fill_zeros=False)

            # interior window: ext reads stay inside [0, Xl) x [0, Yl)
            # on split axes (no dependence on the exchanges above)
            fo, go = call((Xi, Yi, Zl), pick((Xi, Yi, Zl)),
                          seed_at(xi0, yi0), f_pad, g_pad, r_pad,
                          win=(wx0 + xi0, yi0),
                          odomain=(pXl, pYl, Zl),
                          owin=(PX + xi0, _PY + yi0))

            def band(fo, go, x0, wx, y0, wy):
                """Seam-band call: a zero-copy window of the padded
                state (its ext area covers the freshly-exchanged pad
                strips); compact output DUS-assembled in place (native
                DUS — unlike pallas input_output_aliases it does not
                trigger defensive copies here)."""
                fb, gb = call((wx, wy, Zl), pick_band((wx, wy, Zl)),
                              seed_at(x0, y0), f_pad, g_pad, r_pad,
                              win=(wx0 + x0, y0))
                fo = jax.lax.dynamic_update_slice(
                    fo, fb, (0, PX + x0, _PY + y0, 0))
                go = jax.lax.dynamic_update_slice(
                    go, gb, (0, PX + x0, _PY + y0, 0))
                return fo, go

            # partition: y bands span the FULL x width (wx=Xl tiles
            # like the interior; thin-x corners would register-spill),
            # x bands cover only the middle rows [yi0, yi0+Yi)
            bands = []
            if sx:
                bands += [(0, px, yi0, Yi), (Xl - px, px, yi0, Yi)]
            if sy:
                bands += [(0, Xl, 0, _PY), (0, Xl, Yl - _PY, _PY)]
            if SPLIT_DEBUG is not None:
                bands = bands[:int(SPLIT_DEBUG)]
            for b in bands:
                fo, go = band(fo, go, *b)
            return fo, go

        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the checker would otherwise reject
        sm = shard_map(
            local_sweep_split, mesh=mesh,
            in_specs=(pspec, pspec, P(), P())
            + ((pspec,) if use_ref else ()),
            out_specs=(pspec, pspec),
            check_vma=False,
        )
        return sm, (px, py_ship), False

    def advance(state: SimState, ref2, n_k: int) -> SimState:
        if resident:
            # input f/g are in the padded layout — recover the interior
            # global shape from the pad depths
            sd0 = sd_depth(params)
            PX0 = pad_x if pad_x is not None else sd0 * block
            nx = mesh.shape["x"]
            ny = mesh.shape["y"]
            gshape = (state.f.shape[1] - 2 * PX0 * nx,
                      state.f.shape[2] - 2 * _PY * ny,
                      state.f.shape[3])
        else:
            gshape = tuple(state.f.shape[1:])
        shape_loc = local_shape(mesh, gshape)
        if not supports_shape(shape_loc):
            raise ValueError(
                f"local block {shape_loc} not kernel-tileable "
                "(need Z % 128 == 0, Y_local % 8 == 0)")
        sd = sd_depth(params)
        if shape_loc[0] < sd * max(1, min(block, n_k)) \
                or shape_loc[1] < _PY:
            raise ValueError(
                f"local block {shape_loc} too shallow for the halo "
                f"exchange (need X_local >= "
                f"{sd * max(1, min(block, n_k))}, "
                f"Y_local >= {_PY}); use a coarser mesh or block=1")

        T = max(1, min(block, n_k)) if n_k else 1
        n_blocked, n_rest = divmod(n_k, T) if n_k else (0, 0)
        Xl, Yl, Zl = shape_loc
        # one buffer pad depth for every phase of this advance (the
        # T=1 remainder phase runs inside the blocked phase's layout —
        # no inter-phase repad; a resident caller pins it via pad_x so
        # every advance(n) shares one layout)
        PX = pad_x if pad_x is not None else sd * T
        if PX < sd * T:
            raise ValueError(
                f"pad_x={pad_x} shallower than the sd*T={sd * T} halo")
        wrap_y = use_wrap_y

        def make_restore(padded_layout):
            """Cadenced global exact-mass restore (round 5, VERDICT r4
            #5 — see fused_step.mass_restore_step): sum the interior
            windows, psum, spread the rounding defect uniformly over
            the rest population's interior.  A pure function of (state,
            step), so same-sweep-boundary chunkings stay bitwise."""
            if mass_restore is None:
                return None
            interval, m0f, m0g = mass_restore
            ncg = float(gshape[0]) * gshape[1] * gshape[2]
            offx = PX if padded_layout else 0
            offy = _PY if padded_layout else 0

            def one(a_loc, m0):
                q = a_loc.shape[0]
                interior = jax.lax.slice(
                    a_loc, (0, offx, offy, 0),
                    (q, offx + Xl, offy + Yl, Zl))
                s = jax.lax.psum(jax.lax.psum(
                    jnp.sum(interior), "x"), "y")
                row = jax.lax.slice(
                    a_loc, (0, offx, offy, 0),
                    (1, offx + Xl, offy + Yl, Zl)) + (m0 - s) / ncg
                return jax.lax.dynamic_update_slice(
                    a_loc, row, (0, offx, offy, 0))

            sm_r = shard_map(one, mesh=mesh, in_specs=(pspec, P()),
                             out_specs=pspec, check_vma=False)

            def restore(step_prev, step_now, f, g):
                crossed = (step_now // jnp.int32(interval)
                           > step_prev // jnp.int32(interval))
                return jax.lax.cond(
                    crossed,
                    lambda fg: (sm_r(fg[0], m0f), sm_r(fg[1], m0g)),
                    lambda fg: fg, (f, g))
            return restore

        def make_body(sweep_sm, T_, ref_arg, with_strips, restore):
            ref_args = () if ref_arg is None else (ref_arg,)

            def body(carry, _):
                f, g, extras, key, step = carry
                # one word per physical step (drawn from the per-step key
                # splits) — hash noise stream bitwise-invariant to T
                k = key
                words = []
                for _ in range(T_):
                    k, sub = jax.random.split(k)
                    words.append(jax.random.randint(
                        sub, (), minval=jnp.iinfo(jnp.int32).min,
                        maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32))
                outs = sweep_sm(f, g, *extras, jnp.stack(words),
                                step.astype(jnp.int32), *ref_args)
                if with_strips:
                    f, g = outs[0], outs[1]
                    extras = tuple(outs[2:])
                else:
                    f, g = outs
                if restore is not None:
                    f, g = restore(step, step + T_, f, g)
                return (f, g, extras, k, step + T_), None
            return body

        # padded-carry plumbing (serial sweeps): enter/leave the kernel
        # ext layout once per advance (resident callers: once per RUN —
        # enter/exit live in the session)
        pad_f = state_pad_sm(mesh, shape_loc, PX, wrap_y)
        unpad_f = state_unpad_sm(mesh, shape_loc, PX)

        def prep_ref_sm(px_, ship):
            # the USE_REF_STATE stack is static over the n_k steps: pad
            # AND fill its halos ONCE (the old path re-exchanged it
            # every sweep).  Buffer pad PX, halo fill depth px_ (the
            # phase's consumed depth).
            def one(r_loc):
                buf = jnp.zeros(
                    (r_loc.shape[0], Xl + 2 * PX, Yl + 2 * _PY, Zl),
                    r_loc.dtype)
                buf = jax.lax.dynamic_update_slice(
                    buf, r_loc, (0, PX, _PY, 0))
                buf = _pad_exchange_x(buf, PX, px_, Xl, _PY, Yl)
                buf = _pad_exchange_y(buf, _PY, ship, Yl)
                return buf
            return shard_map(one, mesh=mesh, in_specs=(pspec,),
                             out_specs=pspec, check_vma=False)

        def prime_strips(f_pad, g_pad):
            """Initial edge strips for the strips sweep: slice the
            interior edge rows out of the padded state — bitwise what
            the previous sweep's kernel strip writes would have held
            (the strip x pads are garbage either way; the sweep's strip
            x-exchange fills the consumed columns).  Once per advance
            phase entry, amortized over the chunk."""
            def one(a):
                lo = jax.lax.slice(
                    a, (0, 0, _PY, 0),
                    (a.shape[0], a.shape[1], 2 * _PY, a.shape[3]))
                hi = jax.lax.slice(
                    a, (0, 0, Yl, 0),
                    (a.shape[0], a.shape[1], Yl + _PY, a.shape[3]))
                return lo, hi
            sm_p = shard_map(one, mesh=mesh, in_specs=(pspec,),
                             out_specs=(pspec, pspec), check_vma=False)
            flo, fhi = sm_p(f_pad)
            glo, ghi = sm_p(g_pad)
            return (flo, fhi, glo, ghi)

        def run_phase(carry, padded, T_, n_sweeps, use_scan):
            sweep_sm, pads, with_strips = make_sweep(T_, shape_loc,
                                                     gshape, PX)
            f, g, extras, key, step = carry
            ref_arg = ref2
            if pads is not None:
                px_, ship = pads
                if not padded:
                    f, g = pad_f(f), pad_f(g)
                if with_strips and not extras:
                    extras = prime_strips(f, g)
                if ref2 is not None:
                    ref_arg = prep_ref_sm(px_, ship)(ref2)
            elif padded:
                f, g = unpad_f(f), unpad_f(g)
                extras = ()
            body = make_body(sweep_sm, T_, ref_arg, with_strips,
                             make_restore(pads is not None))
            c = (f, g, extras, key, step)
            if use_scan and n_sweeps > 1:
                c, _ = jax.lax.scan(body, c, None, length=n_sweeps)
            else:
                for _ in range(n_sweeps):
                    c, _ = body(c, None)
            return c, pads is not None

        carry = (state.f, state.g, (), state.key, state.step)
        padded = resident
        if n_blocked:
            carry, padded = run_phase(carry, padded, T, n_blocked, True)
        if n_rest:
            carry, padded = run_phase(carry, padded, 1, n_rest, False)
        f, g, _extras, key, step = carry
        if padded and not resident:
            f, g = unpad_f(f), unpad_f(g)
        elif resident and not padded:
            # split phases run unpadded; a resident caller still gets
            # its layout back (pads re-primed — contents valid)
            f, g = pad_f(f), pad_f(g)
        return SimState(f=f, g=g, key=key, step=step)

    return advance
