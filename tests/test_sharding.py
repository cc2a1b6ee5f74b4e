"""Sharded-vs-single-device equivalence on a virtual 8-device CPU mesh
(SURVEY.md §4.7: the multi-node test the reference never had)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.parallel import auto as auto_par
from bflbm_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.mark.parametrize("mesh_shape", [(1, 1, 8), (1, 2, 4), (2, 2, 2)])
def test_sharded_step_matches_single_device(mesh_shape):
    params = LBMParams(alpha0=1.5, kBT=1e-5, kappa=0.1, rho_lo=0.1,
                       rho_hi=3.0)
    shape = (16, 16, 16)
    state = model.init_droplet(shape, params, dtype=jnp.float32, radius=0.25)

    # single device, 3 steps
    sref = state
    for _ in range(3):
        sref, href = model.step(sref, params)

    mesh = mesh_lib.make_mesh(mesh_shape)
    sharded = mesh_lib.shard_state(state, mesh)
    step = auto_par.make_sharded_step(mesh, params, with_hydro=True,
                                      donate=False)
    for _ in range(3):
        sharded, hyd = step(sharded)

    # counter-based RNG keyed identically => identical noise on any mesh;
    # collectives reorder fp ops so allow tiny tolerance
    np.testing.assert_allclose(np.asarray(sharded.f), np.asarray(sref.f),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.g), np.asarray(sref.g),
                               rtol=0, atol=1e-5)


def test_sharded_hash_source_matches_single_device():
    """noise_source='hash' (the RANDRAW draw_from_pdf_normal analog) is
    keyed by global cell coordinates, so it stays decomposition-
    invariant under GSPMD exactly like the threefry stream — notable
    because RANDRAW was the REFERENCE's only decomposition-invariant
    noise path (its default per-thread engines are not)."""
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    shape = (16, 16, 16)
    state = model.init_mixture(shape, params, dtype=jnp.float32)

    sref = state
    stepj = jax.jit(lambda s: model.step(s, params,
                                         noise_source="hash")[0])
    for _ in range(3):
        sref = stepj(sref)

    mesh = mesh_lib.make_mesh((1, 2, 4))
    sharded = mesh_lib.shard_state(state, mesh)
    step = jax.jit(lambda s: model.step(s, params, noise_source="hash")[0],
                   out_shardings=mesh_lib.state_shardings(mesh))
    for _ in range(3):
        sharded = step(sharded)

    np.testing.assert_allclose(np.asarray(sharded.f), np.asarray(sref.f),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.g), np.asarray(sref.g),
                               rtol=0, atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


@pytest.mark.parametrize("mesh_shape", [(1, 2, 4)])
def test_ref_state_noise_sharded_matches_single(mesh_shape):
    """USE_REF_STATE (LBM_binary.H:92-106) under GSPMD: equilibrium-state
    amplitudes + COM-frame roll produce the same trajectory on a mesh as
    on one device (COM -> psum, roll -> collective permute, threefry
    noise decomposition-invariant)."""
    params = LBMParams(alpha0=1.5, kBT=1e-5, kappa=0.1, rho_lo=0.1,
                       rho_hi=3.0)
    shape = (16, 16, 16)
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.25)
    rho_eq = np.asarray(jnp.sum(state.f, axis=0))
    phi_eq = np.asarray(jnp.sum(state.g, axis=0))
    from bflbm_tpu.observables import stats

    com_ref = np.asarray(stats.center_of_mass(rho_eq))
    ref = (jnp.asarray(rho_eq), jnp.asarray(phi_eq), jnp.asarray(com_ref))

    sref = state
    for _ in range(3):
        sref, _h = model.step(sref, params, ref)

    mesh = mesh_lib.make_mesh(mesh_shape)
    sharded = mesh_lib.shard_state(state, mesh)
    step = auto_par.make_sharded_step(mesh, params, donate=False,
                                      ref_state=ref)
    for _ in range(3):
        sharded = step(sharded)

    np.testing.assert_allclose(np.asarray(sharded.f), np.asarray(sref.f),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.g), np.asarray(sref.g),
                               rtol=0, atol=1e-5)
