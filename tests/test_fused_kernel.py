"""Fused Pallas kernel vs the jnp reference path.

At kBT=0 the two paths compute the identical deterministic update, so
trajectories must agree to f32 round-off.  With noise the paths use
different (statistically identical) RNG streams, so only statistics are
compared (see test_noise for the jnp amplitudes; kernel noise statistics
are validated on hardware in benchmarks/).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from bflbm_tpu.config import LBMParams
from bflbm_tpu.kernels import fused_step
from bflbm_tpu.models import binary_fluid as model


@pytest.mark.parametrize("alpha0,shape", [
    (0.0, (8, 8, 8)),
    (1.5, (8, 8, 8)),
    (1.5, (4, 16, 8)),
])
def test_fused_matches_jnp_deterministic(alpha0, shape):
    params = LBMParams(alpha0=alpha0, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    state = model.init_droplet(shape, params, dtype=jnp.float32, radius=0.3)

    n = 4
    ref = state
    for _ in range(n):
        ref, _ = model.step(ref, params)

    # interpret mode cannot simulate cross-grid-step DMAs (the manual
    # double-buffer pipeline), so force a single-tile grid here; the
    # multi-tile/sweep load paths are validated on hardware
    # (benchmarks/tpu_kernel_full.py).
    with pltpu.force_tpu_interpret_mode():
        run = fused_step.make_nsteps(params, n, force=True,
                                     tile=(shape[0], shape[1]))
        got = run(state)

    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got.key), np.asarray(ref.key))


@pytest.mark.parametrize("perm", [(0, 2, 1), (1, 2, 0), (2, 1, 0)])
def test_lattice_permutation_equivariance(perm):
    """D3Q19 + MRT + forcing is exactly equivariant under coordinate
    permutations (the basis sectors that mix share relaxation rates) —
    the property the kernel's permuted-frame path relies on to run
    Z < 128 shapes like the reference's 8x256x64 interface case."""
    from bflbm_tpu.kernels.fused_step import (_inverse_perm, _permute_pops,
                                              _pop_perm)
    from bflbm_tpu.state import SimState

    params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    st = model.init_droplet((6, 10, 8), params, dtype=jnp.float32,
                            radius=0.3)
    n = 5
    ref = st
    for _ in range(n):
        ref, _ = model.step(ref, params)
    idx = _pop_perm(perm)
    pinv = _inverse_perm(perm)
    idxi = _pop_perm(pinv)
    out = SimState(f=_permute_pops(st.f, perm, idx),
                   g=_permute_pops(st.g, perm, idx),
                   key=st.key, step=st.step)
    for _ in range(n):
        out, _ = model.step(out, params)
    np.testing.assert_allclose(
        np.asarray(_permute_pops(out.f, pinv, idxi)), np.asarray(ref.f),
        rtol=0, atol=2e-6)


@pytest.mark.parametrize("perm", [(0, 2, 1), (1, 2, 0)])
def test_fused_permuted_frame_matches_jnp(perm):
    """The kernel running in a permuted lattice frame reproduces the jnp
    trajectory (single-tile interpret grid; kBT=0)."""
    params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (4, 8, 16)
    state = model.init_droplet(shape, params, dtype=jnp.float32, radius=0.3)
    n = 4
    ref = state
    for _ in range(n):
        ref, _ = model.step(ref, params)
    pshape = tuple(shape[a] for a in perm)
    with pltpu.force_tpu_interpret_mode():
        run = fused_step.make_nsteps(params, n, perm=perm,
                                     tile=(pshape[0], pshape[1]))
        got = run(state)
    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=2e-5)


def test_axis_perm_for_shape():
    assert fused_step.axis_perm_for_shape((256, 256, 256)) == (0, 1, 2)
    # the reference's flat-interface case: z=64 -> lane axis must be y
    p = fused_step.axis_perm_for_shape((8, 256, 64))
    assert p is not None
    s = tuple((8, 256, 64)[a] for a in p)
    assert s[2] % 128 == 0 and s[1] % 8 == 0
    assert fused_step.axis_perm_for_shape((32, 32, 32)) is None
    assert fused_step.supports((8, 256, 64))
    assert not fused_step.supports((32, 32, 32))


def test_fused_single_step_is_jnp_step():
    """n=1 degenerates to exactly the jnp path (no kernel involved)."""
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    state = model.init_mixture((8, 8, 8), params, dtype=jnp.float32)
    ref, _ = model.step(state, params)
    from bflbm_tpu.ops import stream as stream_ops  # noqa: F401

    with pltpu.force_tpu_interpret_mode():
        got = fused_step.make_nsteps(params, 1, force=True)(state)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f), atol=0)
