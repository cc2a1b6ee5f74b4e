"""Persistent post-collide kernel sessions (kernels/session.py).

The session keeps the state resident in the kernel's post-collide space
across chunks (the reference's uniform per-step hot loop,
LBM_binary.H:545-594, never converts spaces), paying the jnp boundary
only at observables.  Validated here in Pallas interpret mode
(single-tile grids — interpret cannot simulate the cross-grid-step DMA
pipeline, see CLAUDE.md):

* enter/advance/exit_view composes to exactly make_nsteps (the chunked
  engine it supersedes) — deterministic and fluctuating (hash stream);
* chunk-size invariance: advance(2)+advance(3) == advance(5) bitwise
  (the resident state makes the chunk boundary purely an API artifact);
* the run() driver's session loop matches the jnp engine end-to-end;
* the USE_REF_STATE per-chunk COM-roll guard (VERDICT r3 weak #5)
  counts chunks whose rounded COM shift changed mid-chunk;
* z-sharded meshes run the shard_map fast path via MESH permutation
  (VERDICT r3 missing #2 — the reference decomposes any axis at one
  speed, main_run_job.cpp:140-143).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from bflbm_tpu.config import LBMParams, preset
from bflbm_tpu.kernels import fused_step
from bflbm_tpu.kernels.session import FusedSession, make_session
from bflbm_tpu.models import binary_fluid as model

_OPTS = dict(block=1, transform="mxu", noise_impl="hash")


def _copy(state):
    return jax.tree.map(lambda a: jnp.array(a), state)


@pytest.mark.parametrize("kBT", [0.0, 1e-6])
def test_fused_session_matches_make_nsteps(kBT):
    """enter + advance(n-1) + exit == make_nsteps(n): identical jnp
    entry/exit ops around identical kernel K-steps."""
    params = LBMParams(alpha0=0.0, kBT=kBT)
    shape = (8, 8, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    n = 4

    with pltpu.force_tpu_interpret_mode():
        ref = fused_step.make_nsteps(params, n, tile=(8, 8), **_OPTS)(
            _copy(state))

    sess = FusedSession(params, shape, interpret=True, tile=(8, 8), **_OPTS)
    pc = sess.enter(_copy(state))
    pc = sess.advance(pc, n - 1)
    got = sess.exit_view(pc)

    assert int(got.step) == n
    np.testing.assert_array_equal(np.asarray(got.f), np.asarray(ref.f))
    np.testing.assert_array_equal(np.asarray(got.g), np.asarray(ref.g))
    np.testing.assert_array_equal(np.asarray(got.key), np.asarray(ref.key))


def test_session_chunk_split_invariance():
    """advance(2); advance(3) == advance(5) bitwise (hash noise draws
    one word per physical step, so the split is invisible)."""
    params = LBMParams(alpha0=0.0, kBT=1e-6)
    shape = (8, 8, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)

    def run(chunks):
        sess = FusedSession(params, shape, interpret=True, tile=(8, 8),
                            **_OPTS)
        pc = sess.enter(_copy(state))
        for c in chunks:
            pc = sess.advance(pc, c)
        return sess.exit_view(pc)

    a = run([2, 3])
    b = run([5])
    assert int(a.step) == int(b.step) == 6
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))
    np.testing.assert_array_equal(np.asarray(a.g), np.asarray(b.g))


def test_run_driver_session_matches_jnp(tmp_path, monkeypatch):
    """run() session loop (views at event cadence, exit at end) lands on
    the jnp engine's trajectory for the deterministic case."""
    from bflbm_tpu import run as run_mod

    monkeypatch.setenv("BFLBM_SESSION_INTERPRET", "1")
    cfg = preset("mixture-eq").replace(
        shape=(8, 8, 128), nsteps=6, plot_int=3, print_int=3,
        sf_window=0, plot_save=False, out_dir=str(tmp_path / "sess"))
    got = run_mod.run(cfg, engine="pallas",
                      kernel_opts={"block": 1, "transform": "mxu"})
    ref = run_mod.run(cfg.replace(out_dir=str(tmp_path / "jnp")),
                      engine="jnp")
    assert int(got.step) == int(ref.step) == 6
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    # metrics were written through the session's post-stream views
    assert (tmp_path / "sess" / "metrics.jsonl").exists()


def _boosted_state(shape, params, u3, seed=7):
    """Equilibrium populations of an off-center blob moving at u3 —
    its COM advances ~|u3| cells/step (momentum is conserved with
    alpha0=0), which is what the USE_REF_STATE guard must notice."""
    from bflbm_tpu.ops import collide as collide_ops
    from bflbm_tpu.ops import moments as moments_ops

    # light background: the linear COM velocity is P/M minus the
    # periodic boundary flux of the uniform background, so the moving
    # mass must be concentrated in the (boundary-distant) blob for the
    # COM to actually drift ~|u3| cells/step
    zz = jnp.arange(shape[2], dtype=jnp.float32)
    blob = 0.05 + 3.0 * jnp.exp(-0.5 * ((zz - shape[2] / 4) / 6.0) ** 2)
    rho = jnp.broadcast_to(blob, shape).astype(jnp.float32)
    phi = 0.5 * rho
    u = jnp.stack([jnp.full(shape, v, jnp.float32) for v in u3])
    f = moments_ops.populations(collide_ops.equilibrium_moments(rho, u))
    g = moments_ops.populations(collide_ops.equilibrium_moments(phi, u))
    from bflbm_tpu.state import SimState

    return SimState(f=f, g=g, key=jax.random.PRNGKey(seed),
                    step=jnp.zeros((), jnp.int32)), rho, phi


@pytest.mark.parametrize("uz,expect_viol", [(0.0, False), (0.3, True)])
def test_session_ref_roll_guard(uz, expect_viol):
    """The per-chunk COM roll guard: a droplet drifting >= 1 cell within
    a chunk increments ref_violations (the reference re-rolls per step,
    LBM_binary.H:92-106); a static state does not."""
    params = LBMParams(alpha0=0.0, kBT=1e-8)
    shape = (8, 8, 128)
    state, rho, phi = _boosted_state(shape, params, (0.0, 0.0, uz))
    from bflbm_tpu.observables import stats

    com = np.asarray(stats.center_of_mass(rho))
    sess = FusedSession(params, shape, interpret=True, tile=(8, 8),
                        ref_fields=(rho, phi, com), **_OPTS)
    pc = sess.enter(_copy(state))
    pc = sess.advance(pc, 6)  # uz=0.3 -> COM moves ~1.8 cells
    assert (sess.ref_violations() > 0) == expect_viol


def test_session_mass_restore():
    """Cadenced exact-mass restore (round 5, VERDICT r4 #5): every
    mass_restore_int steps the session pins jnp.sum(f)/sum(g) back to
    the entry invariants.  Drive it with an artificially shifted
    invariant so the correction is far above rounding, and check the
    final masses land on the target."""
    params = LBMParams(alpha0=0.0, kBT=1e-6)
    shape = (8, 8, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)

    sess = FusedSession(params, shape, interpret=True, tile=(8, 8),
                        mass_restore_int=2, **_OPTS)
    pc = sess.enter(_copy(state))
    assert sess._m0 is not None
    target = (float(sess._m0[0]) + 0.5, float(sess._m0[1]) + 0.25)
    sess._m0 = (jnp.float32(target[0]), jnp.float32(target[1]))
    pc = sess.advance(pc, 5)    # crossings at steps 2, 4, 6
    out = sess.exit_view(pc)
    mf = float(jnp.sum(out.f))
    mg = float(jnp.sum(out.g))
    np.testing.assert_allclose(mf, target[0], rtol=1e-6)
    np.testing.assert_allclose(mg, target[1], rtol=1e-6)

    # default cadence (1000) never fires in short runs: bitwise equal
    # to a restore-off session
    s_on = FusedSession(params, shape, interpret=True, tile=(8, 8),
                        **_OPTS)
    s_off = FusedSession(params, shape, interpret=True, tile=(8, 8),
                         mass_restore_int=0, **_OPTS)
    a = s_on.exit_view(s_on.advance(s_on.enter(_copy(state)), 3))
    b = s_off.exit_view(s_off.advance(s_off.enter(_copy(state)), 3))
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4+ devices")
def test_sharded_session_mass_restore():
    """The sharded restore (shard_map interior sums + psum over BOTH
    mesh axes under lax.cond, resident padded layout) pins the global
    masses the same way."""
    from bflbm_tpu.parallel import mesh as mesh_lib

    params = LBMParams(alpha0=0.0, kBT=1e-6)
    shape = (16, 16, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    mesh = mesh_lib.make_mesh((2, 2, 1), devices=jax.devices()[:4])
    sess = make_session(params, shape, mesh=mesh, interpret=True,
                        mass_restore_int=2, **_OPTS)
    assert sess is not None and sess._resident
    pc = sess.enter(mesh_lib.shard_state(_copy(state), mesh))
    target = (float(sess._m0[0]) + 0.5, float(sess._m0[1]) + 0.25)
    sess._m0 = (jnp.float32(target[0]), jnp.float32(target[1]))
    pc = sess.advance(pc, 5)
    out = sess.exit_view(pc)
    np.testing.assert_allclose(float(jnp.sum(out.f)), target[0],
                               rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(out.g)), target[1],
                               rtol=1e-6)


def test_session_ref_roll_self_correcting():
    """VERDICT r4 #4: the transactional USE_REF_STATE advance must land
    on the per-step jnp reference path (which re-rolls the stored
    equilibrium every step, update_com LBM_binary.H:586-588) within f32
    tolerance even when the COM crosses a cell boundary mid-chunk —
    the crossing is isolated to a chunk boundary by rollback+bisection
    (_advance_ref), and the roll convention uses the post-stream COM
    exactly like prelude."""
    from bflbm_tpu.observables import stats

    params = LBMParams(alpha0=0.0, kBT=1e-8)
    shape = (8, 8, 128)
    state, rho, phi = _boosted_state(shape, params, (0.0, 0.0, 0.35))
    com = np.asarray(stats.center_of_mass(rho))
    n = 8

    ref = _copy(state)
    ref, _ = model.step(ref, params, ref_state=(rho, phi, com))
    for _ in range(n - 1):
        ref, _ = model.step(ref, params, ref_state=(rho, phi, com),
                            noise_source="hash")

    sess = FusedSession(params, shape, interpret=True, tile=(8, 8),
                        ref_fields=(rho, phi, com), **_OPTS)
    pc = sess.enter(_copy(state))
    pc = sess.advance(pc, n - 1)
    got = sess.exit_view(pc)
    assert int(got.step) == n
    assert sess.ref_violations() > 0   # a crossing actually happened
    err = np.max(np.abs(np.asarray(got.f) - np.asarray(ref.f)))
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=2e-5)

    # power check: the old non-transactional chunk (stale roll across
    # the crossing) deviates more than the corrected trajectory
    sess2 = FusedSession(params, shape, interpret=True, tile=(8, 8),
                         ref_fields=(rho, phi, com), **_OPTS)
    pc2 = sess2.enter(_copy(state))
    pc2, sess2._viol = sess2._get_advance(n - 1)(pc2, sess2._viol)
    stale = sess2.exit_view(pc2)
    err_stale = np.max(np.abs(np.asarray(stale.f) - np.asarray(ref.f)))
    assert err_stale > err, (err_stale, err)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ devices")
def test_sharded_session_z_mesh_deterministic():
    """A z-sharded mesh runs the shard_map kernel fast path via MESH
    permutation, reproducing the plain jnp trajectory."""
    from bflbm_tpu.parallel import mesh as mesh_lib

    params = LBMParams(alpha0=0.0, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (128, 16, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32, radius=0.3)
    n = 3
    ref = state
    for _ in range(n):
        ref, _ = model.step(ref, params)

    mesh = mesh_lib.make_mesh((1, 1, 2), devices=jax.devices()[:2])
    sess = make_session(params, shape, mesh=mesh, interpret=True, **_OPTS)
    assert sess is not None and sess.perm != (0, 1, 2)
    pc = sess.enter(mesh_lib.shard_state(_copy(state), mesh))
    pc = sess.advance(pc, n - 1)
    got = sess.exit_view(pc)

    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ devices")
def test_sharded_session_z_mesh_fluct_matches_permuted_single():
    """Fluctuating mesh-layout invariance in the permuted frame: the
    hash stream is keyed by KERNEL-frame global coordinates, so the
    z-sharded session matches a single-device session running the SAME
    lattice permutation (a different-perm trajectory is statistically
    identical but draws a different stream — same contract as the
    kernel-vs-jnp noise equivalence)."""
    from bflbm_tpu.parallel import mesh as mesh_lib

    params = LBMParams(alpha0=0.0, kBT=1e-5)
    shape = (128, 16, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    n = 3

    mesh = mesh_lib.make_mesh((1, 1, 2), devices=jax.devices()[:2])
    sess = make_session(params, shape, mesh=mesh, interpret=True, **_OPTS)
    assert sess is not None and sess.perm != (0, 1, 2)
    pc = sess.enter(mesh_lib.shard_state(_copy(state), mesh))
    pc = sess.advance(pc, n - 1)
    got = sess.exit_view(pc)

    single = FusedSession(params, shape, interpret=True, perm=sess.perm,
                          tile=sess.kshape[:2], **_OPTS)
    pc = single.enter(_copy(state))
    pc = single.advance(pc, n - 1)
    ref = single.exit_view(pc)

    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=1e-3, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=1e-3, atol=5e-6)


def test_fused_session_alpha1_matches_jnp():
    """alpha1 != 0 through the session path (round 4c: stencil depth 3
    in the kernel) — the full enter/advance/exit loop must match the
    jnp trajectory."""
    params = LBMParams(alpha0=1.2, alpha1=0.5, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (8, 8, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.3)
    n = 3
    ref = _copy(state)
    for _ in range(n):
        ref, _ = model.step(ref, params)

    sess = FusedSession(params, shape, interpret=True, tile=(8, 8),
                        **_OPTS)
    pc = sess.enter(_copy(state))
    pc = sess.advance(pc, n - 1)
    got = sess.exit_view(pc)
    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ devices")
def test_sharded_session_resident_chunk_invariance():
    """Resident padded layout (round 4f): the sharded session keeps the
    state in the kernel's padded ext layout ACROSS advance() calls (the
    per-advance pad/unpad measured ~0.28 ms/step at production chunk
    sizes — shard_r4e.json ms_layout).  Assertions:

    * residency is EXACT: [2,3,1] resident == non-resident bitwise
      (same phase structure, identical kernel inputs — the pad/unpad
      elision may not change a single bit);
    * same-T chunkings are bitwise invariant: [2,2,2] == [6] (every
      step runs inside a T=2 block either way);
    * mixed-T chunkings ([2,3,1] runs steps 6-7 at T=1) agree to f32
      round-off only — a PRE-EXISTING property of the sharded ext
      sweep (measured identically on the r4e code: 0.08% of cells at
      1 ULP; the single-device periodic kernel is bitwise T-invariant,
      the ext-mode seam recompute is not);
    * exit_view does not disturb the resident state.
    """
    from bflbm_tpu.parallel import mesh as mesh_lib

    params = LBMParams(alpha0=0.0, kBT=1e-6)
    shape = (128, 16, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    opts = dict(_OPTS, block=2)

    def run(chunks, resident=True):
        mesh = mesh_lib.make_mesh((1, 1, 2), devices=jax.devices()[:2])
        sess = make_session(params, shape, mesh=mesh, interpret=True,
                            **opts)
        assert sess is not None and sess._resident
        if not resident:     # force the per-advance pad/unpad path
            sess._resident = False
        pc = sess.enter(mesh_lib.shard_state(_copy(state), mesh))
        for c in chunks:
            pc = sess.advance(pc, c)
        mid = sess.exit_view(pc)
        pc = sess.advance(pc, 0)
        return sess.exit_view(pc), mid

    a, a_mid = run([2, 3, 1])
    a_nr, _ = run([2, 3, 1], resident=False)
    b, _ = run([6])
    c, _ = run([2, 2, 2])
    assert int(a.step) == int(b.step) == int(c.step) == 7
    # residency exactness + exit_view non-destructive
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(a_nr.f))
    np.testing.assert_array_equal(np.asarray(a.g), np.asarray(a_nr.g))
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(a_mid.f))
    # same-T chunk invariance (bitwise)
    np.testing.assert_array_equal(np.asarray(c.f), np.asarray(b.f))
    np.testing.assert_array_equal(np.asarray(c.g), np.asarray(b.g))
    # mixed-T: round-off only
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f),
                               rtol=0, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4+ devices")
def test_sharded_session_resident_chunk_invariance_y_sharded():
    """Round-4f advisor gap: residency also defaults ON for genuinely
    Y-SHARDED meshes (2-D meshes with noise on request no split), which
    exercises the per-sweep _pad_exchange_y fill_zeros=False path with
    pads primed only at enter.  Pin the y-sharded resident path bitwise
    against its non-resident twin, and same-T chunkings against each
    other (same contract as the y-unsharded test above)."""
    from bflbm_tpu.parallel import mesh as mesh_lib

    params = LBMParams(alpha0=0.0, kBT=1e-6)
    shape = (16, 16, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    opts = dict(_OPTS, block=2)

    def run(chunks, resident=True):
        mesh = mesh_lib.make_mesh((2, 2, 1), devices=jax.devices()[:4])
        sess = make_session(params, shape, mesh=mesh, interpret=True,
                            **opts)
        assert sess is not None and sess._resident
        assert sess.mesh_k.shape["y"] == 2  # genuinely y-sharded
        if not resident:
            sess._resident = False
        pc = sess.enter(mesh_lib.shard_state(_copy(state), mesh))
        for c in chunks:
            pc = sess.advance(pc, c)
        return sess.exit_view(pc)

    a = run([2, 3, 1])
    a_nr = run([2, 3, 1], resident=False)
    b = run([6])
    c = run([2, 2, 2])
    assert int(a.step) == int(b.step) == int(c.step) == 7
    # residency exactness (incl. the unprimed-pad stale rows)
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(a_nr.f))
    np.testing.assert_array_equal(np.asarray(a.g), np.asarray(a_nr.g))
    # same-T chunk invariance (bitwise)
    np.testing.assert_array_equal(np.asarray(c.f), np.asarray(b.f))
    np.testing.assert_array_equal(np.asarray(c.g), np.asarray(b.g))


def test_make_session_gates():
    """make_session declines configurations the kernel engines cannot
    run (shapes with no kernel-tileable permutation); alpha1 != 0 now
    runs the kernel path at stencil depth 3 (round 4)."""
    assert make_session(LBMParams(alpha1=0.1), (8, 8, 128)) is not None
    assert make_session(LBMParams(), (9, 9, 100)) is None
    assert make_session(LBMParams(), (8, 8, 128)) is not None
