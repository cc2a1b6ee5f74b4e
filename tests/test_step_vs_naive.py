"""Cross-validate the vectorized step against an independent per-cell
numpy implementation (tests/reference_impl.py) — the golden-cell test of
SURVEY.md §7 'hard parts' #1, extended to a whole small lattice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.ops import collide as collide_ops
from bflbm_tpu.ops import hydro as hydro_ops
from bflbm_tpu.ops import stream as stream_ops
from bflbm_tpu.state import init_state

from reference_impl import naive_step


@pytest.mark.parametrize("alpha0", [0.0, 1.5])
def test_step_matches_naive(alpha0):
    rng = np.random.default_rng(42)
    shape = (4, 4, 4)
    # random positive populations around the rest equilibrium
    f0 = np.abs(rng.normal(1.0, 0.05, size=(19,) + shape)) / 19.0
    g0 = np.abs(rng.normal(1.0, 0.05, size=(19,) + shape)) / 19.0
    # fixed synthetic noise (exercises all noise pathways deterministically)
    xi_f = rng.normal(0, 1e-3, size=(19,) + shape)
    xi_f[0] = 0.0
    xi_g = rng.normal(0, 1e-3, size=(19,) + shape)
    xi_g[0] = 0.0
    xi_g[1:4] = -xi_f[1:4]

    params = LBMParams(alpha0=alpha0)

    fj = jnp.asarray(f0, jnp.float64)
    gj = jnp.asarray(g0, jnp.float64)
    xfj = jnp.asarray(xi_f, jnp.float64)
    xgj = jnp.asarray(xi_g, jnp.float64)

    h = hydro_ops.hydrovars(fj, gj, xfj, xgj, params)
    f1, g1 = collide_ops.collide(fj, gj, h, xfj, xgj, params)
    f2 = np.asarray(stream_ops.stream(f1))
    g2 = np.asarray(stream_ops.stream(g1))

    f_ref, g_ref, h_ref = naive_step(f0, g0, xi_f, xi_g,
                                     params.tau_f, params.tau_g, alpha0)

    np.testing.assert_allclose(np.asarray(h.uf), h_ref["uf"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(h.ug), h_ref["ug"], atol=1e-12)
    np.testing.assert_allclose(f2, f_ref, atol=1e-12)
    np.testing.assert_allclose(g2, g_ref, atol=1e-12)


def test_full_model_step_composition():
    """model.step == hydrovars -> collide -> stream with the model's own
    noise draw."""
    params = LBMParams(alpha0=1.5, kBT=1e-5)
    state = model.init_droplet((6, 6, 6), params, seed=7, dtype=jnp.float64,
                               radius=0.3)
    new_state, h = model.step(state, params)

    # reproduce manually
    hbar = hydro_ops.hydrovars_bar(state.f, state.g, params)
    key, sub = jax.random.split(state.key)
    from bflbm_tpu.ops.noise import thermal_noise

    xi_f, xi_g = thermal_noise(sub, hbar.rho, hbar.phi, params)
    h2 = hydro_ops.hydrovars(state.f, state.g, xi_f, xi_g, params, hbar)
    f1, g1 = collide_ops.collide(state.f, state.g, h2, xi_f, xi_g, params)
    np.testing.assert_allclose(np.asarray(new_state.f),
                               np.asarray(stream_ops.stream(f1)), atol=0)
    np.testing.assert_allclose(np.asarray(h.uf), np.asarray(h2.uf), atol=0)
    assert int(new_state.step) == 1
