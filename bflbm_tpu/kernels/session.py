"""Persistent post-collide kernel sessions — production cadence at
benchmark speed.

The chunked engines of earlier rounds (``fused_step.make_nsteps`` /
``parallel.kernel.make_kernel_nsteps``) convert between the standard
post-stream state and the kernel's post-collide space ONCE PER CHUNK
(one jnp prelude+collide to enter, one jnp stream to exit, ~130 ms at
256^3).  At the physics campaigns' observable cadence (~100-step
chunks: S(k) windows, frame output) that boundary tax is ~9% of the
step rate, and it is pure overhead — no observable consumes the
intermediate post-stream states.

A session keeps the state RESIDENT in post-collide space across
chunks, mirroring the reference's uniform per-step hot loop
(``LBM_timestep``, LBM_binary.H:545-594, which never converts spaces):

    pc = session.enter(state)        # one prelude+collide: 1 full step
                                     #   (after a later exit/view)
    pc = session.advance(pc, n)      # n fused K = collide∘stream steps
    view = session.exit_view(pc)     # post-stream view for observables
                                     #   (pc stays live — NOT donated)
    state = session.exit(pc)         # final post-stream state

State convention: a post-collide state labeled ``step == k`` streams to
the standard post-stream state of step k, i.e. ``exit_view`` returns
step k's fields without advancing anything.  ``enter`` therefore counts
as ONE step (prelude+collide is the first half of step t -> t+1 and the
view's stream is the second half), and a run of N steps is
``enter + advance(N-1) + exit``.

Observable semantics under views (vs the per-chunk re-entry of the old
engines): the hydro packed from a view draws its real-velocity noise
correction (the 0.5 xi / rho term) from the SAME key split the next
step would consume, but the kernel's next K-step draws its noise from
the in-kernel hash/HW stream rather than that jnp threefry split — the
observed correction is an independent equal-variance draw, so every
equal-time statistic (S(k), equipartition identities, spectra) is
unchanged while bitwise pairing with the dynamics holds only for
all-hash kernels consumed by a ``noise_source="hash"`` view.  Exact
noise DUMPS (WriteOutNoise analog) still require the dumped draw to be
the one consumed, so ``run.py`` re-enters through the jnp prelude at
noise-dump boundaries only.

USE_REF_STATE (LBM_binary.H:92-106): the session owns the per-chunk COM
roll of the stored (rho_eq, phi_eq) and makes it SELF-CORRECTING — the
reference re-rolls every step (update_com, LBM_binary.H:586-588), and
per-chunk rolling is exact only while round(COM) is constant over the
chunk, so ``advance`` runs transactional sub-chunks: it compares the
rounded COM shift at sub-chunk start and end on-device and, when a
chunk crossed a cell boundary, rolls back and bisects until the
crossing lands on a chunk boundary (see :meth:`_advance_ref`) — the
resulting trajectory matches the per-step jnp reference path
(tests/test_session.py::test_session_ref_roll_self_correcting).
:meth:`ref_violations` counts the isolated crossings.

Axis permutation: shapes the kernel cannot tile directly (e.g. the
reference's 8x256x64 flat-interface case) run RESIDENT in the permuted
lattice frame — permutation cost is paid once at enter/exit(view), not
per chunk.  The sharded session additionally permutes the device MESH,
which is what puts z-sharded meshes (``BoxArray.maxSize`` decomposes
any axis, main_run_job.cpp:140-143) on the kernel fast path instead of
the ~10x slower jnp halo engine.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LBMParams
from ..state import SimState
from . import fused_step
from .fused_step import (_inverse_perm, _permute_pops, _pop_perm,
                         axis_perm_for_shape)


def _stream_view(pc: SimState) -> SimState:
    from ..ops import stream as stream_ops

    return SimState(f=stream_ops.stream(pc.f), g=stream_ops.stream(pc.g),
                    key=pc.key, step=pc.step)


def _enter_pc(state: SimState, params: LBMParams, ref_state=None) -> SimState:
    """prelude + collide: post-stream step t -> post-collide step t+1."""
    from ..models import binary_fluid as model
    from ..ops import collide as collide_ops

    h, xi_f, xi_g, key = model.prelude(state, params, ref_state)
    f1, g1 = collide_ops.collide(state.f, state.g, h, xi_f, xi_g, params)
    return SimState(f=f1, g=g1, key=key, step=state.step + 1)


class _SessionBase:
    """Shared enter/advance/exit plumbing; frame + engine hooks in
    subclasses."""

    use_ref = False
    interpret = False
    perm = (0, 1, 2)
    _REF_CAP = 64   # initial transactional sub-chunk (use_ref sessions)

    def __init__(self):
        self._advance_cache = {}
        self._enter_fn = None
        self._exit_fn = None
        self._viol = None
        self._ref_cap = self._REF_CAP
        self._m0 = None
        self.mass_restore_int = 0

    def _maybe_interpret(self, fn):
        """Pallas interpret-mode wrapper for CPU tests: jit traces at
        first call, so holding the force context around each call puts
        every pallas_call in interpret mode (single-tile grids only —
        interpret cannot simulate cross-grid-step DMAs, CLAUDE.md)."""
        if not self.interpret:
            return fn
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu

        def wrapped(*a):
            with pltpu.force_tpu_interpret_mode():
                return fn(*a)

        return wrapped

    # -- frame hooks -------------------------------------------------
    def _to_kernel_frame(self, pc: SimState) -> SimState:
        return pc

    def _from_kernel_frame(self, pc: SimState) -> SimState:
        return pc

    # -- engine hook: n K-steps in the kernel frame -------------------
    def _make_ksteps(self, n: int):
        raise NotImplementedError

    def _mass_restore_arg(self):
        """(interval, m0f, m0g) for the engine builders, or None.  m0
        is captured at first enter and baked into the advance jits as a
        constant (sessions are entered once per run; re-enters keep the
        original invariant)."""
        if self.mass_restore_int and self._m0 is not None:
            return (self.mass_restore_int,) + tuple(self._m0)
        return None

    # -- COM-roll machinery (kernel frame; use_ref only) ---------------
    def _rolled_ref(self, f):
        from ..observables import stats
        from ..ops import stream as stream_ops
        from ..ops.noise import _roll3

        # The jnp per-step path rolls from the POST-STREAM density
        # (prelude's hydrovars_bar of the state the collide consumes,
        # LBM_binary.H:586-588).  pc is post-collide — collide preserves
        # per-cell mass, so com(pc.f) equals the PREVIOUS step's
        # post-stream COM, one step stale; stream the mass field first
        # (incl. the periodic-wrap coordinate artifact both conventions
        # share) so chunk rolls land on the reference's exact step.
        rho_view = jnp.sum(stream_ops.stream(f), axis=0)
        com = stats.center_of_mass(rho_view)
        shift = jnp.round(com - self._com_ref_k).astype(jnp.int32)
        return shift, jnp.stack([_roll3(self._rho_eq_k, shift),
                                 _roll3(self._phi_eq_k, shift)])

    def _build_advance(self, n: int):
        kfn = self._make_ksteps(n)
        if not self.use_ref:
            def run(pc, viol):
                return kfn(pc), viol
        else:
            def run(pc, viol):
                shift0, ref2 = self._rolled_ref(pc.f)
                pc = kfn(pc, ref2)
                shift1, _ = self._rolled_ref(pc.f)
                viol = viol + jnp.any(shift1 != shift0).astype(jnp.int32)
                return pc, viol
        return self._jit_advance(run)

    def _jit_advance(self, run):
        return self._maybe_interpret(jax.jit(run, donate_argnums=0))

    def _jit_enter(self, run):
        # donate only when the kernel frame is the identity: a PERMUTED
        # enter's outputs are transposed relative to the input, and XLA
        # cannot alias a donated buffer into a transposed-shape output —
        # the donation was a no-op that warned "donated buffers were
        # not usable" (round-5 fix, VERDICT r4 weak #5)
        donate = (0,) if self.perm == (0, 1, 2) else ()
        return self._maybe_interpret(jax.jit(run, donate_argnums=donate))

    def _jit_exit(self, run):
        return self._maybe_interpret(jax.jit(run))

    # -- public API ----------------------------------------------------
    def enter(self, state: SimState) -> SimState:
        """Post-stream state (step t) -> resident post-collide state
        (step t+1).  Donates `state`; counts as ONE step.

        The FIRST enter also captures the run's total-mass invariants
        (m0f, m0g) for the cadenced exact-mass restore
        (fused_step.mass_restore_step; ``mass_restore_int`` steps, the
        round-5 answer to the f32 long-run drift — the reference's
        double precision never drifts).  Re-enters (e.g. run.py's
        noise-dump boundaries) keep the original invariants: the run's
        conserved mass does not change mid-run."""
        if self.mass_restore_int and self._m0 is None:
            self._m0 = (jnp.sum(state.f), jnp.sum(state.g))
        if self._enter_fn is None:
            ref_st = ((self._rho_eq, self._phi_eq, self._com_ref)
                      if self.use_ref else None)

            def run(s):
                return self._to_kernel_frame(_enter_pc(s, self.params,
                                                       ref_st))

            self._enter_fn = self._jit_enter(run)
        if self._viol is None:
            self._viol = jnp.zeros((), jnp.int32)
        return self._enter_fn(state)

    def _get_advance(self, n: int):
        fn = self._advance_cache.get(n)
        if fn is None:
            fn = self._advance_cache[n] = self._build_advance(n)
        return fn

    def advance(self, pc: SimState, n: int) -> SimState:
        """Advance the resident state n K-steps (donates pc).
        USE_REF_STATE sessions run transactionally (:meth:`_advance_ref`)
        so the per-chunk COM roll exactly reproduces the reference's
        per-step ``update_com`` semantics."""
        if n <= 0:
            return pc
        if not self.use_ref:
            pc, self._viol = self._get_advance(n)(pc, self._viol)
            return pc
        return self._advance_ref(pc, n)

    def _advance_ref(self, pc: SimState, n: int) -> SimState:
        """Transactional USE_REF_STATE advance.  The reference re-rolls
        the stored equilibrium into the instantaneous COM frame every
        step (``update_com``, LBM_binary.H:586-588); the session rolls
        once per chunk, which is exact iff round(COM) is constant over
        the chunk.  So: run sub-chunks of at most ``_REF_CAP`` steps,
        check the rounded COM shift at both ends on-device, and when a
        chunk CROSSED a cell boundary, roll the state back (a pre-call
        device copy) and bisect until the crossing lands on a chunk
        boundary — where the next chunk's entry re-roll IS the
        reference's step-granular update.  A crossing inside a 1-step
        chunk is accepted as-is: the roll was computed from the COM at
        that step's start, exactly what the reference uses.  Residual
        deviation from the per-step path: COM excursions that cross
        and return strictly inside one step (the reference would
        flicker the roll; diffusively rare and sub-round-off in the
        amplitudes).  Cost: one state copy + one host sync per
        sub-chunk, and log2(cap) retries per actual crossing."""
        remaining = int(n)
        cap = self._ref_cap
        while remaining:
            n_i = min(remaining, cap)
            fn = self._get_advance(n_i)
            viol0 = self._viol
            backup = (jax.tree.map(jnp.copy, pc) if n_i > 1 else None)
            out, viol = fn(pc, viol0)
            if n_i > 1 and int(np.asarray(viol)) > int(np.asarray(viol0)):
                # crossing inside the chunk: discard, bisect (viol0 was
                # not donated — keep the pre-chunk counter)
                pc = backup
                cap = max(1, n_i // 2)
                continue
            pc, self._viol = out, viol
            remaining -= n_i
            cap = min(self._REF_CAP, cap * 2)
        self._ref_cap = cap
        return pc

    def exit_view(self, pc: SimState) -> SimState:
        """Post-stream view of the resident state at its current step.
        pc is NOT donated — keep advancing it afterwards."""
        if self._exit_fn is None:
            def run(pc):
                return _stream_view(self._from_kernel_frame(pc))

            self._exit_fn = self._jit_exit(run)
        return self._exit_fn(pc)

    exit = exit_view

    def ref_violations(self) -> int:
        """COM cell-boundary crossings the transactional advance
        isolated to 1-step chunks (host sync).  Since round 5 these are
        HANDLED — the roll is re-applied at step granularity
        (:meth:`_advance_ref`), so a nonzero count no longer means the
        trajectory diverged from reference semantics; it measures how
        often the droplet crossed a cell boundary."""
        if self._viol is None:
            return 0
        return int(np.asarray(self._viol))


class FusedSession(_SessionBase):
    """Single-device persistent session over the fused Pallas kernel,
    resident in the (possibly axis-permuted) kernel lattice frame."""

    def __init__(self, params: LBMParams, shape: Tuple[int, int, int], *,
                 ref_fields=None, perm=None, force: bool = False,
                 interpret: bool = False, **kernel_opts):
        super().__init__()
        self.params = params
        self.shape = tuple(shape)
        self.kernel_opts = dict(kernel_opts)
        self.mass_restore_int = int(
            self.kernel_opts.pop("mass_restore_int", 1000) or 0)
        self.interpret = interpret
        if perm is None:
            perm = ((0, 1, 2) if force
                    else axis_perm_for_shape(self.shape))
        if perm is None:
            raise ValueError(
                f"shape {self.shape} is not kernel-tileable under any "
                "axis permutation")
        self.perm = tuple(perm)
        self.kshape = tuple(self.shape[a] for a in self.perm)
        self._identity = self.perm == (0, 1, 2)
        if not self._identity:
            self._idx = _pop_perm(self.perm)
            self._pinv = _inverse_perm(self.perm)
            self._idx_inv = _pop_perm(self._pinv)
        self.use_ref = ref_fields is not None
        if self.use_ref:
            rho_eq, phi_eq, com_ref = ref_fields
            self._rho_eq = jnp.asarray(rho_eq)
            self._phi_eq = jnp.asarray(phi_eq)
            self._com_ref = jnp.asarray(com_ref)
            if self._identity:
                self._rho_eq_k = self._rho_eq
                self._phi_eq_k = self._phi_eq
                self._com_ref_k = self._com_ref
            else:
                self._rho_eq_k = jnp.transpose(self._rho_eq, self.perm)
                self._phi_eq_k = jnp.transpose(self._phi_eq, self.perm)
                self._com_ref_k = self._com_ref[jnp.asarray(self.perm)]

    def _to_kernel_frame(self, pc: SimState) -> SimState:
        if self._identity:
            return pc
        return SimState(f=_permute_pops(pc.f, self.perm, self._idx),
                        g=_permute_pops(pc.g, self.perm, self._idx),
                        key=pc.key, step=pc.step)

    def _from_kernel_frame(self, pc: SimState) -> SimState:
        if self._identity:
            return pc
        return SimState(f=_permute_pops(pc.f, self._pinv, self._idx_inv),
                        g=_permute_pops(pc.g, self._pinv, self._idx_inv),
                        key=pc.key, step=pc.step)

    def _make_ksteps(self, n: int):
        return fused_step.make_ksteps(self.params, self.kshape, n,
                                      use_ref=self.use_ref,
                                      mass_restore=self._mass_restore_arg(),
                                      **self.kernel_opts)


class ShardedSession(_SessionBase):
    """Multi-device persistent session: fused kernel per shard under
    shard_map with ppermute halo exchange, resident in a kernel frame
    whose MESH is permuted so the sharded axes land on x/y (z-sharded
    user meshes run at full speed instead of degrading to the jnp halo
    engine — VERDICT r3 missing #2)."""

    def __init__(self, mesh, params: LBMParams,
                 shape: Tuple[int, int, int], *, ref_fields=None,
                 perm=None, interpret: bool = False, **kernel_opts):
        super().__init__()
        from ..parallel import kernel as kernel_par
        from ..parallel import mesh as mesh_lib
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        self.params = params
        self.shape = tuple(shape)
        self.kernel_opts = dict(kernel_opts)
        self.mass_restore_int = int(
            self.kernel_opts.pop("mass_restore_int", 1000) or 0)
        self.interpret = interpret
        block = kernel_opts.get("block", 2)
        if perm is None:
            perm = kernel_par.mesh_axis_perm(mesh, self.shape, block)
        if perm is None:
            raise ValueError(
                f"mesh {dict(mesh.shape)} / domain {self.shape} cannot "
                "run the fused-kernel shard_map path under any axis "
                "permutation")
        self.perm = tuple(perm)
        self.kshape = tuple(self.shape[a] for a in self.perm)
        self._identity = self.perm == (0, 1, 2)
        self.mesh = mesh
        if self._identity:
            self.mesh_k = mesh
        else:
            self._idx = _pop_perm(self.perm)
            self._pinv = _inverse_perm(self.perm)
            self._idx_inv = _pop_perm(self._pinv)
            self.mesh_k = Mesh(np.transpose(mesh.devices, self.perm),
                               mesh_lib.SPATIAL_AXES)
        self._sh = mesh_lib.state_shardings(self.mesh)
        self._sh_k = mesh_lib.state_shardings(self.mesh_k)
        # sharding of the PERMUTED arrays expressed on the ORIGINAL mesh
        # (the jit that permutes runs on `mesh`; a device_put between
        # this and _sh_k moves no data — same assignment, renamed axes)
        ax = mesh_lib.SPATIAL_AXES
        self._perm_spec = P(None, *(ax[a] for a in self.perm))
        self._perm_sh = SimState(
            f=NamedSharding(self.mesh, self._perm_spec),
            g=NamedSharding(self.mesh, self._perm_spec),
            key=NamedSharding(self.mesh, P()),
            step=NamedSharding(self.mesh, P()),
        )
        # Resident padded layout (ROADMAP r5 #1): between advance()
        # calls the state stays in the kernel's padded ext layout
        # (pad once at enter, unpad once per exit_view) — the
        # once-per-advance pad/unpad measured ~0.28 ms/step at
        # 100-step production chunks (shard_r4e.json ms_layout).
        # Requires the serial padded-carry sweep (not the ICI-overlap
        # split) and a full-field COM (use_ref sums pc.f, which would
        # include pad garbage), so gate on both.
        self._resident = (ref_fields is None
                          and not kernel_par.wants_split(
                              self.mesh_k, params,
                              kernel_opts.get("overlap", "auto")))
        if self._resident:
            self._PX = fused_step.sd_depth(params) * block
            loc = kernel_par.local_shape(self.mesh_k, self.kshape)
            pad1 = kernel_par.state_pad_sm(
                self.mesh_k, loc, self._PX,
                self.mesh_k.shape["y"] == 1)
            unpad1 = kernel_par.state_unpad_sm(self.mesh_k, loc,
                                               self._PX)

            def pad_state(pc):
                return SimState(f=pad1(pc.f), g=pad1(pc.g),
                                key=pc.key, step=pc.step)

            def unpad_state(pc):
                return SimState(f=unpad1(pc.f), g=unpad1(pc.g),
                                key=pc.key, step=pc.step)

            # no donation: the padded output is a LARGER shape — XLA
            # cannot alias it to the donated input (the declaration
            # only produced a "not usable" warning)
            self._pad_jit = jax.jit(
                pad_state, in_shardings=(self._sh_k,),
                out_shardings=self._sh_k)
            # exit_view keeps pc live — no donation
            self._unpad_jit = jax.jit(
                unpad_state, in_shardings=(self._sh_k,),
                out_shardings=self._sh_k)
        self.use_ref = ref_fields is not None
        if self.use_ref:
            rho_eq, phi_eq, com_ref = ref_fields
            sc_k = NamedSharding(self.mesh_k, P(*ax))
            if self._identity:
                self._rho_eq_k = jax.device_put(jnp.asarray(rho_eq), sc_k)
                self._phi_eq_k = jax.device_put(jnp.asarray(phi_eq), sc_k)
                self._com_ref_k = jnp.asarray(com_ref)
            else:
                self._rho_eq_k = jax.device_put(
                    jnp.transpose(jnp.asarray(rho_eq), self.perm), sc_k)
                self._phi_eq_k = jax.device_put(
                    jnp.transpose(jnp.asarray(phi_eq), self.perm), sc_k)
                self._com_ref_k = jnp.asarray(com_ref)[
                    jnp.asarray(self.perm)]
            # enter's prelude needs the ORIGINAL-frame fields
            self._rho_eq = jnp.asarray(rho_eq)
            self._phi_eq = jnp.asarray(phi_eq)
            self._com_ref = jnp.asarray(com_ref)

    # enter runs on the ORIGINAL mesh (GSPMD prelude+collide works on
    # any sharding) and permutes; the eager device_put onto the kernel
    # mesh is assignment-preserving (no transfer).
    def _jit_enter(self, run):
        # donate only in the identity frame: a permuted enter's outputs
        # are transposed, which XLA cannot alias to the donated input
        # (the declaration only warned; round-5 fix, VERDICT r4 weak #5)
        inner = jax.jit(run, in_shardings=(self._sh,),
                        out_shardings=(self._sh_k if self._identity
                                       else self._perm_sh),
                        donate_argnums=(0,) if self._identity else ())
        if self._identity:
            fn = inner
        else:
            def fn(state):
                return jax.device_put(inner(state), self._sh_k)
        if not self._resident:
            return fn

        def enter_resident(state):
            return self._pad_jit(fn(state))

        return enter_resident

    def _jit_advance(self, run):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.jit(
            run,
            in_shardings=(self._sh_k, NamedSharding(self.mesh_k, P())),
            out_shardings=(self._sh_k, NamedSharding(self.mesh_k, P())),
            donate_argnums=0)

    def _jit_exit(self, run):
        if self._identity:
            return jax.jit(run, in_shardings=(self._sh_k,),
                           out_shardings=self._sh)

        inner = jax.jit(run, in_shardings=(self._perm_sh,),
                        out_shardings=self._sh)

        def outer(pc):
            return inner(jax.device_put(pc, self._perm_sh))

        return outer

    def _to_kernel_frame(self, pc: SimState) -> SimState:
        if self._identity:
            return pc
        return SimState(f=_permute_pops(pc.f, self.perm, self._idx),
                        g=_permute_pops(pc.g, self.perm, self._idx),
                        key=pc.key, step=pc.step)

    def _from_kernel_frame(self, pc: SimState) -> SimState:
        if self._identity:
            return pc
        return SimState(f=_permute_pops(pc.f, self._pinv, self._idx_inv),
                        g=_permute_pops(pc.g, self._pinv, self._idx_inv),
                        key=pc.key, step=pc.step)

    def exit_view(self, pc: SimState) -> SimState:
        if self._resident:
            pc = self._unpad_jit(pc)
        return _SessionBase.exit_view(self, pc)

    exit = exit_view

    def _make_ksteps(self, n: int):
        from ..parallel import kernel as kernel_par

        return kernel_par.make_kernel_ksteps(
            self.mesh_k, self.params, n, use_ref=self.use_ref,
            interpret=self.interpret, resident=self._resident,
            pad_x=self._PX if self._resident else None,
            mass_restore=self._mass_restore_arg(),
            **self.kernel_opts)


def make_session(params: LBMParams, shape, *, mesh=None, ref_fields=None,
                 interpret: bool = False,
                 **kernel_opts) -> Optional[_SessionBase]:
    """Session for this configuration, or None when the kernel engines
    cannot run it (no axis permutation makes the shape / mesh
    kernel-tileable) — the caller falls back to the jnp engines.
    alpha1 != 0 runs at stencil depth 3 (fused_step.sd_depth)."""
    if mesh is not None and mesh.size > 1:
        from ..parallel import kernel as kernel_par

        block = kernel_opts.get("block", 2)
        if kernel_par.mesh_axis_perm(mesh, tuple(shape), block) is None:
            return None
        return ShardedSession(mesh, params, shape, ref_fields=ref_fields,
                              interpret=interpret, **kernel_opts)
    if axis_perm_for_shape(tuple(shape)) is None:
        return None
    return FusedSession(params, shape, ref_fields=ref_fields,
                        interpret=interpret, **kernel_opts)
