"""Fused Pallas kernel under shard_map (the multi-chip production path).

Runs on the 8 virtual CPU devices from conftest with the kernel in
interpret mode (single-tile shards: interpret cannot simulate the
cross-grid-step DMA pipeline).  Validates

* kBT=0 parity with the jnp trajectory on 2D meshes (halo exchange +
  ext-mode kernel + temporal blocking);
* DIRECT fluctuating parity with the jnp trajectory (both engines
  consuming the identical coordinate-keyed hash stream — the jnp side
  via noise_source="hash");
* mesh-layout invariance of the fluctuating trajectory with the
  coordinate-keyed hash noise (the analog of the jnp path's
  decomposition invariance, tests/test_halo.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.parallel import kernel as kernel_par
from bflbm_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _run(mesh_shape, state, params, n, block, tile=None, overlap="auto",
         y_exchange="auto"):
    mesh = mesh_lib.make_mesh(
        mesh_shape, jax.devices()[:int(np.prod(mesh_shape))])
    run = kernel_par.make_kernel_nsteps(
        mesh, params, n, block=block, tile=tile, noise_impl="hash",
        transform="mxu", interpret=True, donate=False, overlap=overlap,
        y_exchange=y_exchange)
    return run(mesh_lib.shard_state(state, mesh))


@pytest.mark.parametrize("mesh_shape,block", [((2, 4, 1), 2),
                                              ((2, 4, 1), 1)])
def test_kernel_shard_matches_jnp_deterministic(mesh_shape, block):
    params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (8, 32, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32, radius=0.3)
    n = 5
    ref = state
    for _ in range(n):
        ref, _ = model.step(ref, params)
    got = _run(mesh_shape, state, params, n, block)
    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=2e-5)


def test_kernel_shard_alpha1_matches_jnp():
    """alpha1 != 0 (stencil depth 3) through the shard_map halo
    exchange: the sd*T-deep x halos and pad_to y halos must feed the
    in-kernel grad-laplacian the same neighborhood the jnp stencil
    composition sees."""
    params = LBMParams(alpha0=1.5, alpha1=0.6, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (16, 32, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32, radius=0.3)
    n = 4
    ref = state
    for _ in range(n):
        ref, _ = model.step(ref, params)
    got = _run((2, 4, 1), state, params, n, block=1)
    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=2e-5)


def test_kernel_shard_noise_mesh_invariance():
    """Hash noise is keyed by global coordinates, so the fluctuating
    trajectory is the same for every mesh layout (up to FMA-contraction
    round-off on the differing local shapes)."""
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    shape = (16, 64, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    n = 4
    # explicit single-tile-per-shard tiles: interpret mode cannot
    # simulate the multi-tile DMA pipeline
    a = _run((2, 4, 1), state, params, n, block=2, tile=(8, 16))
    b = _run((4, 2, 1), state, params, n, block=2, tile=(4, 32))
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f),
                               rtol=1e-3, atol=5e-6)
    np.testing.assert_allclose(np.asarray(a.g), np.asarray(b.g),
                               rtol=1e-3, atol=5e-6)
    # identical injected noise: global mass matches to accumulation
    # round-off, far below the per-step noise scale
    np.testing.assert_allclose(float(jnp.sum(a.f)), float(jnp.sum(b.f)),
                               rtol=1e-6)


def test_kernel_shard_fluctuating_matches_jnp_hash():
    """Direct (non-statistical) FLUCTUATING parity of the sharded kernel
    against the jnp engine: with hash noise both consume the identical
    coordinate-keyed stream (the jnp side via noise_source='hash', whose
    per-step word derivation matches the sweep body's), so the
    trajectories — halo exchange, seam recompute, temporal blocking and
    all — must agree to f32 round-off at kBT > 0."""
    params = LBMParams(alpha0=1.5, kBT=1e-5, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (8, 32, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32, radius=0.3)
    n = 4
    ref, _ = model.step(state, params)      # chunk-entry prelude (threefry)
    for _ in range(n - 1):
        ref, _ = model.step(ref, params, noise_source="hash")
    got = _run((2, 4, 1), state, params, n, block=2, tile=(4, 8))
    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=1e-3, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=1e-3, atol=5e-6)


@pytest.mark.parametrize("kBT", [0.0, 1e-5])
def test_kernel_shard_ystrips_matches_dus_bitwise(kBT):
    """Round-5 separate-strip y exchange (VERDICT r4 #2): on a
    y-sharded mesh the strips sweep (kernel-written edge strips,
    whole-buffer ppermute, strip operands read in the kernel) must be
    BITWISE identical to the r4d slice/DUS exchange — the consumed ext
    rows carry the same values; only never-consumed Mosaic-alignment
    rows differ (valid neighbor data vs stale garbage)."""
    params = LBMParams(alpha0=0.0, kBT=kBT)
    shape = (16, 32, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    n = 5
    a = _run((2, 2, 1), state, params, n, block=2, tile=(8, 16),
             y_exchange="auto")      # auto -> strips on y-sharded
    b = _run((2, 2, 1), state, params, n, block=2, tile=(8, 16),
             y_exchange="dus")
    assert int(a.step) == int(b.step) == n
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))
    np.testing.assert_array_equal(np.asarray(a.g), np.asarray(b.g))


def test_kernel_ystrips_forced_matches_wrap_y_bitwise():
    """y_exchange='strips' on a y-UNSHARDED mesh degenerates to the
    periodic self-wrap (1-rank ppermute) and must be bitwise identical
    to the wrap_y kernel-maintained pads — the single-chip hardware
    validation path for the strips machinery."""
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    shape = (16, 16, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    n = 5
    a = _run((2, 1, 1), state, params, n, block=2, tile=(8, 16),
             y_exchange="auto")      # auto -> wrap_y on y-unsharded
    b = _run((2, 1, 1), state, params, n, block=2, tile=(8, 16),
             y_exchange="strips")
    assert int(a.step) == int(b.step) == n
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))
    np.testing.assert_array_equal(np.asarray(a.g), np.asarray(b.g))


def test_kernel_overlap_split_matches_jnp_deterministic():
    """The ICI-overlap split sweep (interior call on local data + seam
    bands on the exchanged halos, parallel/kernel.py make_sweep) must
    reproduce the jnp trajectory exactly like the serial sweep does.
    block=1 so the 2-deep halo leaves a non-empty interior on the small
    test shards; every call is single-tile under interpret."""
    params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (16, 96, 128)   # loc (8, 24): Xi = 4, Yi = 8
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.3)
    n = 4
    ref = state
    for _ in range(n):
        ref, _ = model.step(ref, params)
    # overlap=True: since round 5 'auto' keeps the serial sweep for
    # every single-host config (gate doc in _split_flags), so the
    # split must be requested explicitly to be exercised here
    got = _run((2, 4, 1), state, params, n, block=1, overlap=True)
    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=2e-5)


def test_kernel_overlap_split_noise_invariant():
    """Hash noise is keyed by global cell coordinates, so splitting the
    sweep into interior + seam-band calls must not change the
    fluctuating trajectory vs the serial sweep — up to XLA:CPU's
    shape-dependent FMA contraction of the mxu moment matmuls: under
    interpret every call is a single full-band-shaped tile, so band
    cells run through differently-shaped matmuls than the serial
    sweep's (~1-2 ULP on a fraction of band cells; same effect and
    tolerance rationale as test_kernel_shard_noise_mesh_invariance).
    On hardware both sweeps use identical (bx, by) tiles and the
    invariance is BITWISE — enforced by tpu_verify.json
    ext_mode_overlap_noise_bitwise (max_df 0.0)."""
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    shape = (16, 96, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    a = _run((2, 4, 1), state, params, 3, block=1, overlap=True)
    b = _run((2, 4, 1), state, params, 3, block=1, overlap=False)
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.g), np.asarray(b.g),
                               rtol=0, atol=1e-6)
    # identical injected noise: global mass matches to accumulation
    # round-off, far below the per-step noise scale
    np.testing.assert_allclose(float(jnp.sum(a.f)), float(jnp.sum(b.f)),
                               rtol=1e-6)


def _run_sub(mesh_shape, state, params, n, block, tile=None):
    """Like _run but on a device SUBSET, so y-unsharded meshes (which
    route the serial sweep onto the kernel-maintained wrap_y pads) fit
    the 8 virtual devices."""
    ndev = int(np.prod(mesh_shape))
    mesh = mesh_lib.make_mesh(mesh_shape, devices=jax.devices()[:ndev])
    run = kernel_par.make_kernel_nsteps(
        mesh, params, n, block=block, tile=tile, noise_impl="hash",
        transform="mxu", interpret=True, donate=False, overlap=False)
    return run(mesh_lib.shard_state(state, mesh))


def test_kernel_shard_wrap_y_matches_jnp_deterministic():
    """y-unsharded meshes skip the per-sweep y exchange: the kernel
    writes the periodic y-wrap into its output's pad slabs (fused_step
    wrap_y) and the x strips ship full height.  The trajectory must
    still reproduce the jnp reference exactly like the y-exchange sweep
    does — including across a blocked (T=2) + rest (T=1) phase split,
    which re-pads and re-primes the wrap pads."""
    params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (16, 32, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.3)
    n = 6   # 5 K-steps: 2 blocked sweeps + 1 rest sweep
    ref = state
    for _ in range(n):
        ref, _ = model.step(ref, params)
    got = _run_sub((2, 1, 1), state, params, n, block=2)
    assert int(got.step) == n
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=2e-5)


def test_kernel_shard_wrap_y_matches_y_exchange_fluct():
    """The wrap_y sweep (y-unsharded mesh) and the ppermute y-exchange
    sweep (y-sharded mesh) must produce the same fluctuating trajectory:
    hash noise is keyed by global coordinates and the wrap pads carry
    bitwise the same values the exchange shipped."""
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    shape = (16, 64, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    n = 4
    a = _run_sub((2, 1, 1), state, params, n, block=2, tile=(8, 64))
    b = _run_sub((1, 2, 1), state, params, n, block=2, tile=(16, 32))
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f),
                               rtol=1e-3, atol=5e-6)
    np.testing.assert_allclose(np.asarray(a.g), np.asarray(b.g),
                               rtol=1e-3, atol=5e-6)
    # identical injected noise: the mass gap is pure accumulation
    # round-off across the differing tile shapes (XLA:CPU contracts
    # FMAs shape-dependently under interpret; ~1e-6 relative here)
    np.testing.assert_allclose(float(jnp.sum(a.f)), float(jnp.sum(b.f)),
                               rtol=5e-6)


def test_kernel_shard_rejects_z_sharded():
    params = LBMParams()
    mesh = mesh_lib.make_mesh((1, 1, 8))
    with pytest.raises(ValueError, match="z unsharded"):
        kernel_par.make_kernel_nsteps(mesh, params, 4)


def test_supports():
    mesh = mesh_lib.make_mesh((2, 4, 1))
    assert kernel_par.supports(mesh, (8, 32, 128))
    assert not kernel_par.supports(mesh, (8, 32, 64))   # Z % 128
    assert not kernel_par.supports(mesh, (9, 32, 128))  # not divisible
    meshz = mesh_lib.make_mesh((1, 1, 8))
    assert not kernel_par.supports(meshz, (8, 32, 128))


def test_supports_block_depth():
    """A heavily x-sharded mesh whose local X is shallower than the
    2*block halo must be rejected up front (run.py then falls back to
    the jnp engine instead of failing at trace time)."""
    mesh = mesh_lib.make_mesh((8, 1, 1))
    assert kernel_par.supports(mesh, (32, 8, 128))            # loc X = 4
    assert not kernel_par.supports(mesh, (16, 8, 128))        # loc X = 2 < 4
    assert kernel_par.supports(mesh, (16, 8, 128), block=1)
    # supports() is conservative (assumes sd=2); the runtime guard uses
    # the actual stencil depth, so the coupled case (sd=2) trips it at
    # loc X = 2 while the uncoupled case (sd=1) legitimately runs.
    params = LBMParams(alpha0=0.5, kBT=1e-5)
    with pytest.raises(ValueError, match="too shallow"):
        kernel_par.make_kernel_nsteps(mesh, params, 8, block=2)(
            mesh_lib.shard_state(
                model.init_mixture((16, 8, 128), params,
                                   dtype=jnp.float32), mesh))


def test_default_mesh_routes_to_kernel_path():
    """The make_mesh() DEFAULT layout must be fast-path eligible: the
    round-2 default (1,1,N) z-slab silently degraded `--engine auto`
    multi-chip runs to the jnp chunk engine (VERDICT r2 missing #2).
    Matches BoxArray.maxSize any-axis decomposition
    (main_run_job.cpp:140-143) with the performant axis as default."""
    mesh = mesh_lib.make_mesh()
    assert mesh.shape["z"] == 1
    assert kernel_par.supports(mesh, (256, 256, 256))
    assert kernel_par.supports(mesh, (64, 64, 128))


def test_kernel_shard_use_ref_matches_single_device():
    """USE_REF_STATE on the shard_map path (LBM_binary.H:92-106): the
    sharded kernel consuming the ppermute-extended ref stack must
    reproduce the single-device fused kernel's use_ref trajectory (hash
    noise is keyed by global coordinates, so the streams agree)."""
    from bflbm_tpu.kernels import fused_step
    from jax._src import pallas  # noqa: F401  (import check only)
    from jax.experimental.pallas import tpu as pltpu

    params = LBMParams(alpha0=0.0, kBT=1e-5)
    shape = (16, 64, 128)
    n = 4
    rng = np.random.default_rng(3)
    rho_ref = jnp.asarray(1.0 + 0.2 * rng.random(shape), jnp.float32)
    ref2 = jnp.stack([rho_ref, 0.5 * rho_ref])

    state = model.init_mixture(shape, params, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ref = fused_step.make_nsteps(
            params, n, force=True, tile=(shape[0], shape[1]), block=2,
            noise_impl="hash", transform="mxu",
            use_ref=True)(state, ref2)

    mesh = mesh_lib.make_mesh((2, 4, 1))
    run = kernel_par.make_kernel_nsteps(
        mesh, params, n, block=2, tile=(8, 16), noise_impl="hash",
        transform="mxu", interpret=True, donate=False, use_ref=True)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    got = run(mesh_lib.shard_state(state, mesh),
              jax.device_put(
                  ref2, jax.sharding.NamedSharding(
                      mesh, jax.sharding.PartitionSpec(
                          None, *mesh_lib.SPATIAL_AXES))))
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=1e-3, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=1e-3, atol=5e-6)
    # identical injected noise: global mass matches to accumulation
    # round-off across the differing tile shapes, far below the
    # per-step noise scale (~1e-3 relative)
    np.testing.assert_allclose(float(jnp.sum(got.f)),
                               float(jnp.sum(ref.f)), rtol=5e-6)


def test_kernel_shard_use_ref_overlap_split_matches_serial():
    """The compact-band split (round 5) threads the USE_REF_STATE
    stack through band-sized ext inputs; a fluctuating use_ref split
    trajectory must match the serial sweep to f32 round-off.  (Unlike
    the no-ref case — bitwise, test above — use_ref rounds differently
    across decompositions at a few ulps/step near the seams: the ref
    operand's differing ext layouts perturb the amplitude pipeline's
    vector arithmetic.  Measured 2.4e-7 after 2 steps; a band
    row-offset bug in the ref threading would show at the ~1e-3
    amplitude scale.  Same tolerance rationale as
    test_kernel_shard_use_ref_matches_single_device.)"""
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    shape = (16, 96, 128)
    rng = np.random.default_rng(7)
    rho_ref = jnp.asarray(1.0 + 0.2 * rng.random(shape), jnp.float32)
    ref2 = jnp.stack([rho_ref, 0.5 * rho_ref])
    mesh = mesh_lib.make_mesh((2, 4, 1))
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, *mesh_lib.SPATIAL_AXES))
    outs = []
    for ov in (True, False):
        run = kernel_par.make_kernel_nsteps(
            mesh, params, 3, block=1, noise_impl="hash",
            transform="mxu", interpret=True, donate=False,
            use_ref=True, overlap=ov)
        st = model.init_mixture(shape, params, dtype=jnp.float32)
        outs.append(run(mesh_lib.shard_state(st, mesh),
                        jax.device_put(ref2, spec)))
    np.testing.assert_allclose(np.asarray(outs[0].f),
                               np.asarray(outs[1].f),
                               rtol=0, atol=5e-6)
    np.testing.assert_allclose(np.asarray(outs[0].g),
                               np.asarray(outs[1].g),
                               rtol=0, atol=5e-6)


def test_kernel_shard_use_ref_zero_region_bitwise():
    """Cells whose ref densities are zero draw zero noise on the sharded
    path too: the fluctuating use_ref run must bitwise equal the kBT=0
    run on the eroded interior of the zero region, across shard
    boundaries (a misaligned halo extension of the ref stack would shift
    the zero/noise boundary)."""
    shape = (16, 64, 128)
    n = 3
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    params0 = LBMParams(alpha0=0.0, kBT=0.0)

    zero = np.zeros(shape, bool)
    lo, hi = (2, 8, 0), (14, 56, shape[2])
    zero[lo[0]:hi[0], lo[1]:hi[1], :] = True
    rho_ref = jnp.asarray(np.where(zero, 0.0, 1.0), jnp.float32)
    ref2 = jnp.stack([rho_ref, rho_ref])

    mesh = mesh_lib.make_mesh((2, 4, 1))
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, *mesh_lib.SPATIAL_AXES))
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    run = kernel_par.make_kernel_nsteps(
        mesh, params, n, block=2, tile=(8, 16), noise_impl="hash",
        transform="mxu", interpret=True, donate=False, use_ref=True)
    got = run(mesh_lib.shard_state(state, mesh),
              jax.device_put(ref2, spec))
    state0 = model.init_mixture(shape, params0, dtype=jnp.float32)
    base = _run((2, 4, 1), state0, params0, n, block=2, tile=(8, 16))
    df = np.asarray(got.f) - np.asarray(base.f)
    interior = np.zeros(shape, bool)
    interior[lo[0] + n:hi[0] - n, lo[1] + n:hi[1] - n, :] = True
    assert np.all(df[:, interior] == 0.0), np.abs(df[:, interior]).max()
    outside = np.zeros(shape, bool)
    outside[:, :lo[1] - n, :] = True
    assert np.abs(df[:, outside]).max() > 1e-5
