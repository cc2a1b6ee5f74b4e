#!/usr/bin/env python
"""Asserting hardware regression suite for the fused Pallas kernel.

Runs on the real TPU (NOT interpret mode) and FAILS loudly on any
regression the CPU suite cannot see: the multi-tile sweep-load DMA
pipeline, temporal-blocking seam consistency, the hardware-PRNG and
hash noise statistics, and the ext-mode (shard_map) kernel.  Prints a
JSON summary and writes it to benchmarks/results/tpu_verify.json
(committed as the regression artifact).

Usage:  python benchmarks/tpu_verify.py [--fast]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bflbm_tpu.config import LBMParams
from bflbm_tpu.kernels import fused_step
from bflbm_tpu.lattice import B, CS2, M, Q
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.utils.timing import fetch_scalar

RESULTS = {}
T0 = time.time()


def log(name, **kw):
    kw = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
          for k, v in kw.items()}
    RESULTS[name] = kw
    print("[%6.1fs] %s: %s" % (time.time() - T0, name, kw), flush=True)


def check(cond, name, **kw):
    log(name, ok=bool(cond), **kw)
    assert cond, (name, kw)


def parity_deterministic(block):
    """Multi-tile kernel (incl. sweep loads + temporal blocking) vs jnp
    at kBT=0 with full coupling."""
    params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (32, 32, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.25)
    n = 5
    stepj = jax.jit(lambda s: model.step(s, params)[0])
    ref = state
    for _ in range(n):
        ref = stepj(ref)
    fetch_scalar(ref)
    got = fused_step.make_nsteps(params, n, block=block)(state)
    fetch_scalar(got)
    df = float(jnp.max(jnp.abs(got.f - ref.f)))
    dg = float(jnp.max(jnp.abs(got.g - ref.g)))
    check(df < 3e-5 and dg < 3e-5, f"parity_kBT0_block{block}",
          max_df=df, max_dg=dg)


def tiling_invariance():
    """With hash noise the fluctuating trajectory is independent of the
    kernel tiling — the seam-consistency guarantee of temporal blocking."""
    params = LBMParams(alpha0=1.5, kBT=1e-5, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (32, 32, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.25)
    n = 9  # 8 K-steps = 4 blocked sweeps
    from bflbm_tpu.state import SimState

    def copy(s):  # make_nsteps donates its argument (whole pytree)
        return SimState(f=jnp.array(s.f), g=jnp.array(s.g),
                        key=jnp.array(s.key), step=jnp.array(s.step))

    a = fused_step.make_nsteps(params, n, block=2, tile=(8, 16),
                               noise_impl="hash")(copy(state))
    b = fused_step.make_nsteps(params, n, block=2, tile=(16, 8),
                               noise_impl="hash")(copy(state))
    fetch_scalar(a), fetch_scalar(b)
    fa, fb = np.asarray(a.f), np.asarray(b.f)
    d = float(np.max(np.abs(fa - fb)))
    scale = float(np.max(np.abs(fa)))
    dm = abs(fa.sum() - fb.sum()) / abs(fa.sum())
    check(d < 1e-4 * scale + 1e-6 and dm < 1e-6, "tiling_invariance",
          max_df=d, mass_rel=dm)


def parity_fluctuating_hash(block):
    """DIRECT fluctuating kernel-vs-jnp parity on hardware: with
    noise_impl="hash" the real (non-interpret) Pallas kernel consumes
    the same coordinate-keyed stream the jnp engine draws via
    noise_source="hash", so kBT>0 trajectories must agree to f32
    round-off — amplitude application, collide, stream, seam recompute
    and the multi-tile DMA pipeline all cross-checked on one noise
    realization (the interpret-mode analog is
    tests/test_fused_kernel.py::test_fluctuating_cross_engine_parity_hash).
    """
    params = LBMParams(alpha0=1.5, kBT=1e-5, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (32, 32, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.25)
    n = 5
    stepj = jax.jit(lambda s: model.step(s, params,
                                         noise_source="hash")[0])
    ref, _ = model.step(state, params)   # chunk-entry prelude (threefry)
    for _ in range(n - 1):
        ref = stepj(ref)
    fetch_scalar(ref)
    got = fused_step.make_nsteps(params, n, block=block,
                                 noise_impl="hash")(state)
    fetch_scalar(got)
    df = float(jnp.max(jnp.abs(got.f - ref.f)))
    dg = float(jnp.max(jnp.abs(got.g - ref.g)))
    check(df < 3e-5 and dg < 3e-5, f"parity_fluct_hash_block{block}",
          max_df=df, max_dg=dg)


def noise_statistics(noise_impl, noise_dist="clt4"):
    """Per-mode injected-noise variance ratios vs the FDT amplitudes
    (NoiseCovariance.ipynb cell 3 analog for the in-kernel streams).

    From a uniform rest state the streamed moments equal the input
    moments, relaxation and forcing vanish, so one K-step injects
    exactly xi: m(out) - m(in) = xi_a per cell.
    """
    rho0, phi0 = 1.0, 1.0
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    shape = (32, 32, 128)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    seed = jnp.array([987654321, 3], jnp.int32)
    fo, go = fused_step._fused_step_call(
        params, shape, (8, 16), True, seed, state.f, state.g,
        block=1, noise_impl=noise_impl, noise_dist=noise_dist)
    fetch_scalar(fo)
    mm = np.asarray(M, np.float64)
    dmf = np.einsum("ki,ixyz->kxyz", mm,
                    np.asarray(fo, np.float64) - np.asarray(state.f))
    dmg = np.einsum("ki,ixyz->kxyz", mm,
                    np.asarray(go, np.float64) - np.asarray(state.g))
    lam = params.lam_f
    pref = 2.0 * (lam - 0.5 * lam * lam) * params.kBT
    ratios = {}
    worst = 0.0
    for a in range(1, Q):
        if a < 4:
            var_th = pref * rho0 * phi0 / (rho0 + phi0)
        else:
            var_th = pref / CS2 * float(B[a]) * rho0
        rf = float(dmf[a].var() / var_th)
        rg = float(dmg[a].var() / var_th)
        ratios[a] = (round(rf, 4), round(rg, 4))
        worst = max(worst, abs(rf - 1), abs(rg - 1))
    # momentum anti-correlation between species (LBM_binary.H:117-118)
    cc = float(np.corrcoef(dmf[1].ravel(), dmg[1].ravel())[0, 1])
    name = f"noise_variance_{noise_impl}" + (
        "" if noise_dist == "clt4" else f"_{noise_dist}")
    # worst_dev at this sample count (32*32*128 cells, one step) has a
    # ~0.5-1% sampling floor per mode: entries near 1% are resolution,
    # not bias — the 16x re-sample resolves e.g. hash_clt2 to 0.16%
    # at 2.1M samples (bound_r4.json noise_var_resample).
    check(worst < 0.03 and cc < -0.999,
          name, worst_dev=round(worst, 4), mom_anticorr=round(cc, 5),
          sample_floor="~0.5-1% at 131k cells; 16x resample 0.16% "
                       "(bound_r4.json)")


def conservation():
    """Mass conservation through 100 noisy blocked steps (momentum-mode
    noise is anti-correlated; mass-mode noise is zero)."""
    params = LBMParams(alpha0=1.5, kBT=1e-5, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (32, 32, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.25)
    m0 = float(jnp.sum(state.f)) + float(jnp.sum(state.g))
    out = fused_step.make_nsteps(params, 101, block=2)(state)
    fetch_scalar(out)
    m1 = float(jnp.sum(out.f)) + float(jnp.sum(out.g))
    drift = abs(m1 - m0) / m0
    check(drift < 2e-6, "mass_conservation_100steps", rel_drift=drift)


def mass_drift_ab():
    """SIGNED coherent mass drift per step, "eof" vs "eofc" (compensated
    mass row), 200 fluctuating steps at 64x64x256 — the production-like
    scale where the coherent component dominates the finite-N random
    mean.  Exact f64 host-side sums (device jnp.sum would add its own
    f32 rounding at this size).  Decision data for ROADMAP item
    "forward-transform mass rounding": if eofc does NOT cut the drift,
    the residual lives in the back-transform telescoping rounding, not
    the forward pair sums."""
    params = LBMParams(alpha0=0.0, kBT=1e-5, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (64, 64, 256)
    n = 200
    drifts = {}
    for tr in ("eof", "eofc"):
        st = model.init_mixture(shape, params, dtype=jnp.float32, seed=9)
        m0 = (np.asarray(st.f, np.float64).sum()
              + np.asarray(st.g, np.float64).sum())
        out = fused_step.make_nsteps(params, n, transform=tr)(st)
        fetch_scalar(out)
        m1 = (np.asarray(out.f, np.float64).sum()
              + np.asarray(out.g, np.float64).sum())
        drifts[tr] = (m1 - m0) / m0 / n
    log("mass_drift_ab",
        eof_per_step=drifts["eof"], eofc_per_step=drifts["eofc"],
        ratio=(abs(drifts["eofc"]) / max(abs(drifts["eof"]), 1e-300)))


def ext_mode_parity():
    """shard_map ext-mode kernel (1-device mesh: ppermute degenerates to
    the local periodic wrap) vs jnp at kBT=0 — compiles and validates
    the ext DMA layout on real hardware."""
    from bflbm_tpu.parallel import kernel as kernel_par
    from bflbm_tpu.parallel import mesh as mesh_lib

    params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    shape = (32, 32, 128)
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.25)
    n = 5
    stepj = jax.jit(lambda s: model.step(s, params)[0])
    ref = state
    for _ in range(n):
        ref = stepj(ref)
    fetch_scalar(ref)
    mesh = mesh_lib.make_mesh((1, 1, 1), jax.devices()[:1])
    run = kernel_par.make_kernel_nsteps(mesh, params, n, block=2,
                                        donate=False)
    got = run(state)
    fetch_scalar(got)
    df = float(jnp.max(jnp.abs(got.f - ref.f)))
    check(df < 3e-5, "ext_mode_parity_kBT0", max_df=df)


def ext_mode_multitile():
    """The multi-tile DMA pipeline x ext-mode (shard_map) composition —
    the call structure real multi-chip runs use — on the single chip
    (round-2 verdict item 5; the reference's safe_test_gpu_cpu.cpp
    analog).  Three checks at (64, 128, 128), where the default tiles
    give a 4x8 interior grid:

      1. kBT=0 parity of the serial ext-mode sweep vs jnp;
      2. kBT=0 parity of the overlap='force' SPLIT sweep (interior call
         + 4 seam-band calls, the exact multi-chip overlap structure);
      3. hash-noise fluctuating trajectory bitwise identical between
         the split and serial sweeps (global-coordinate noise keying).
    """
    from bflbm_tpu.parallel import kernel as kernel_par
    from bflbm_tpu.parallel import mesh as mesh_lib
    from bflbm_tpu.state import SimState

    def copy(s):
        return SimState(f=jnp.array(s.f), g=jnp.array(s.g),
                        key=jnp.array(s.key), step=jnp.array(s.step))

    shape = (64, 128, 128)
    mesh = mesh_lib.make_mesh((1, 1, 1), jax.devices()[:1])
    n = 4

    params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    state = model.init_droplet(shape, params, dtype=jnp.float32,
                               radius=0.25)
    bx, by = fused_step._choose_tile(shape, 2, False)
    assert shape[0] // bx >= 2 and shape[1] // by >= 2, (bx, by)
    stepj = jax.jit(lambda s: model.step(s, params)[0])
    ref = state
    for _ in range(n):
        ref = stepj(ref)
    fetch_scalar(ref)
    got = kernel_par.make_kernel_nsteps(
        mesh, params, n, block=2, donate=False, overlap=False)(state)
    fetch_scalar(got)
    df = float(jnp.max(jnp.abs(got.f - ref.f)))
    check(df < 3e-5, "ext_mode_multitile_parity", max_df=df,
          grid=(shape[0] // bx, shape[1] // by))

    got2 = kernel_par.make_kernel_nsteps(
        mesh, params, n, block=2, donate=False, overlap="force")(state)
    fetch_scalar(got2)
    df2 = float(jnp.max(jnp.abs(got2.f - ref.f)))
    check(df2 < 3e-5, "ext_mode_overlap_parity", max_df=df2)

    params_n = LBMParams(alpha0=0.0, kBT=1e-5)
    st = model.init_mixture(shape, params_n, dtype=jnp.float32)
    a = kernel_par.make_kernel_nsteps(
        mesh, params_n, 3, block=1, noise_impl="hash", donate=False,
        overlap="force")(copy(st))
    b = kernel_par.make_kernel_nsteps(
        mesh, params_n, 3, block=1, noise_impl="hash", donate=False,
        overlap=False)(copy(st))
    fetch_scalar(a), fetch_scalar(b)
    d = float(np.max(np.abs(np.asarray(a.f) - np.asarray(b.f))))
    check(d == 0.0, "ext_mode_overlap_noise_bitwise", max_df=d)

    # 4/5. round-5 strips y exchange (the y-sharded-mesh path, forced
    # on the 1-device mesh where the 1-rank ppermute degenerates to the
    # periodic self-wrap): multi-tile grid exercises the strip
    # out-DMAs, the per-row-position ext fragment cases and the
    # fresh-load "hi" case that interpret tests (single-tile) cannot.
    got3 = kernel_par.make_kernel_nsteps(
        mesh, params, n, block=2, donate=False, overlap=False,
        y_exchange="strips")(state)
    fetch_scalar(got3)
    df3 = float(jnp.max(jnp.abs(got3.f - ref.f)))
    check(df3 < 3e-5, "ext_mode_ystrips_parity", max_df=df3)

    c = kernel_par.make_kernel_nsteps(
        mesh, params_n, 3, block=2, noise_impl="hash", donate=False,
        overlap=False, y_exchange="strips")(copy(st))
    b2 = kernel_par.make_kernel_nsteps(
        mesh, params_n, 3, block=2, noise_impl="hash", donate=False,
        overlap=False)(copy(st))
    fetch_scalar(c), fetch_scalar(b2)
    d2 = float(np.max(np.abs(np.asarray(c.f) - np.asarray(b2.f))))
    check(d2 == 0.0, "ext_mode_ystrips_noise_bitwise", max_df=d2)


def noise_dump_covariance():
    """End-to-end WriteOutNoise + NoiseCovariance analog on a PALLAS-
    engine trajectory (round-2 verdict item 7; Debug.H:381-409 +
    NoiseCovariance.ipynb cell 3): run.py with engine='pallas' dumps
    the exact chunk-boundary noise (the threefry draw the next chunk's
    entry step consumes — run.py's chunk-cadence invariant), and the
    analysis CLI's per-mode FDT ratio table on those dumps must sit at
    1 within sampling error."""
    import argparse as _ap
    import shutil
    import tempfile

    from bflbm_tpu import analysis
    from bflbm_tpu import run as run_mod
    from bflbm_tpu.config import preset

    out = tempfile.mkdtemp(prefix="bflbm_noise_dump_")
    try:
        cfg = preset("mixture-fluct").replace(
            shape=(32, 32, 128), nsteps=1200, step_continue=0,
            out_noise_int=20, plot_int=0, print_int=0, sf_window=0,
            init="mixture", out_dir=out)
        run_mod.run(cfg, engine="pallas")  # raises if kernel unavailable
        ns = _ap.Namespace(dir=out, skip=10, kBT=cfg.params.kBT,
                           tau=cfg.params.tau_f, rho=1.0, phi=1.0)
        table = analysis.cmd_noise(ns)
        ratios = np.asarray(
            [table[f"{fg}_a{a}"]["mean"] for fg in ("f", "g")
             for a in range(1, 19)])
        dev = float(np.max(np.abs(ratios - 1.0)))
        anticorr = table["momentum_anticorr"]
        check(dev < 0.05 and abs(anticorr + 1.0) < 0.05,
              "noise_dump_covariance_pallas",
              worst_dev=dev, anticorr=anticorr, n_modes=len(ratios))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def use_ref_kernel():
    """USE_REF_STATE on the kernel path (LBM_binary.H:92-106): the
    (rho_eq, phi_eq) stack streamed as a third operand.  Hardware
    checks: (1) cells whose ref densities are zero draw exactly zero
    noise -> bitwise equal to the kBT=0 run on the eroded interior of
    the zero region, with the production hw+hash hybrid noise and
    temporal blocking; (2) ref-mode throughput (the extra ~5% HBM
    stream)."""
    shape = (128, 256, 256)
    n = 6
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    params0 = LBMParams(alpha0=0.0, kBT=0.0)
    st = model.init_mixture(shape, params, dtype=jnp.float32)
    zero = np.zeros(shape, bool)
    lo, hi = (16, 16, 0), (80, 112, shape[2])
    zero[lo[0]:hi[0], lo[1]:hi[1], :] = True
    rho_ref = jnp.asarray(np.where(zero, 0.0, 1.0), jnp.float32)
    ref2 = jnp.stack([rho_ref, rho_ref])
    got = fused_step.make_nsteps(params, n, block=2,
                                 use_ref=True)(st, ref2)
    st = model.init_mixture(shape, params, dtype=jnp.float32)
    base = fused_step.make_nsteps(params0, n, block=2)(st)
    df = np.asarray(got.f) - np.asarray(base.f)
    inner = np.zeros(shape, bool)
    inner[lo[0] + n:hi[0] - n, lo[1] + n:hi[1] - n, :] = True
    interior_max = float(np.abs(df[:, inner]).max())
    outside = np.zeros(shape, bool)
    outside[:lo[0] - n, :, :] = True
    outside_max = float(np.abs(df[:, outside]).max())
    check(interior_max == 0.0 and outside_max > 1e-5,
          "use_ref_zero_region_bitwise", interior_max=interior_max,
          outside_max=outside_max)
    # throughput with a realistic (nonzero) ref
    shape = (256, 256, 256)
    cells = float(np.prod(shape))
    nthr = 50
    st = model.init_mixture(shape, params, dtype=jnp.float32)
    ref2 = jnp.stack([jnp.full(shape, 1.0, jnp.float32),
                      jnp.full(shape, 1.0, jnp.float32)])
    run = fused_step.make_nsteps(params, nthr, use_ref=True)
    st = run(st, ref2)
    fetch_scalar(st)
    tt = time.time()
    for _ in range(2):
        st = run(st, ref2)
        fetch_scalar(st)
    dt = (time.time() - tt) / 2
    log("mlups_fluct_use_ref", mlups=round(cells * nthr / dt / 1e6, 1),
        ms_per_step=round(dt / nthr * 1000, 3))


def throughput(fast):
    """MLUPS for block 1 vs 2, fluctuating + deterministic + coupled."""
    shape = (256, 256, 256)
    cells = float(np.prod(shape))
    n = 50
    cases = [("fluct", dict(alpha0=0.0, kBT=1e-5), {}),
             ("fluct_b2", dict(alpha0=0.0, kBT=1e-5), dict(block=2)),
             ("coupled", dict(alpha0=1.5, kBT=1e-5), {}),
             ("determ", dict(alpha0=0.0, kBT=0.0), {}),
             # A/B the round-3 factored transform against round-2's
             # parity-paired default on the compute-bound paths (the
             # decision data for _DEFAULT_TRANSFORM)
             ("fluct_b2_eo", dict(alpha0=0.0, kBT=1e-5),
              dict(block=2, transform="eo")),
             ("determ_eo", dict(alpha0=0.0, kBT=0.0),
              dict(transform="eo")),
             # compensated-mass-row cost (decision data for whether
             # "eofc" can be the default on the DMA-bound path)
             ("fluct_eofc", dict(alpha0=0.0, kBT=1e-5),
              dict(transform="eofc")),
             # block=3 temporal blocking (interpret parity already
             # pinned in tests/test_fused_kernel.py; VMEM fits: ext
             # block ~35 MB at 256^3 with bx=16)
             ("determ_b3", dict(alpha0=0.0, kBT=0.0), dict(block=3)),
             ("fluct_b3", dict(alpha0=0.0, kBT=1e-5), dict(block=3)),
             # CLT-2 byte-pair normals (the bench-scored generator;
             # validated: ACCEPTANCE B-kernel-clt2 + noise_*_clt2)
             ("fluct_b2_clt2", dict(alpha0=0.0, kBT=1e-5),
              dict(block=2, noise_dist="clt2")),
             ("coupled_clt2", dict(alpha0=1.5, kBT=1e-5),
              dict(noise_dist="clt2")),
             # the r4c scored rungs (exact-relaxation optima,
             # relax_r4/relax2_r4): u8 single-byte deviates at the
             # fluct b2 optimum; determ block=4
             ("fluct_b2_u8", dict(alpha0=0.0, kBT=1e-5),
              dict(block=2, noise_dist="u8")),
             ("determ_b4", dict(alpha0=0.0, kBT=0.0), dict(block=4)),
             ("coupled_b2_u8", dict(alpha0=1.5, kBT=1e-5),
              dict(block=2, noise_dist="u8"))]
    if fast:
        cases = cases[:2]
    for name, pkw, nkw in cases:
        # per-case isolation: an experimental variant that fails to
        # compile (e.g. fluct_b3 runs out of VMEM at 256^3 — register
        # spill slots of the 3-phase noise sweep) must not abort the
        # measured cases after it
        try:
            params = LBMParams(**pkw)
            st = model.init_mixture(shape, params, dtype=jnp.float32)
            run = fused_step.make_nsteps(params, n, **nkw)
            st = run(st)
            fetch_scalar(st)  # compile + warm
            tt = time.time()
            reps = 2
            for _ in range(reps):
                st = run(st)
                fetch_scalar(st)
            dt = (time.time() - tt) / reps
            log(f"mlups_{name}", mlups=round(cells * n / dt / 1e6, 1),
                ms_per_step=round(dt / n * 1000, 3))
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            msg = str(e)
            log(f"mlups_{name}", error=type(e).__name__ + (
                ": vmem OOM" if "vmem" in msg else ""))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated section names")
    args = ap.parse_args()
    sections = {
        "parity1": lambda: parity_deterministic(1),
        "parity2": lambda: parity_deterministic(2),
        "parity_fluct1": lambda: parity_fluctuating_hash(1),
        "parity_fluct2": lambda: parity_fluctuating_hash(2),
        "tiling": tiling_invariance,
        "noise_hw": lambda: noise_statistics("hw"),
        "noise_hash": lambda: noise_statistics("hash"),
        "noise_hw_clt2": lambda: noise_statistics("hw", "clt2"),
        "noise_hash_clt2": lambda: noise_statistics("hash", "clt2"),
        "conservation": conservation,
        "mass_drift": mass_drift_ab,
        "ext": ext_mode_parity,
        "ext_multitile": ext_mode_multitile,
        "noise_dump": noise_dump_covariance,
        "use_ref": use_ref_kernel,
        "throughput": lambda: throughput(args.fast),
    }
    names = args.only.split(",") if args.only else list(sections)
    failed = []
    for name in names:
        try:
            sections[name]()
        except AssertionError as e:
            failed.append(name)
            print(f"FAILED {name}: {e}", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
    outdir = os.path.join(os.path.dirname(__file__), "results")
    os.makedirs(outdir, exist_ok=True)
    RESULTS["failed"] = failed
    path = os.path.join(outdir, "tpu_verify.json")
    merged = {}
    if args.only and os.path.exists(path):
        # partial run: keep entries from sections not re-run
        with open(path) as fh:
            merged = json.load(fh)
    merged.update(RESULTS)
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps({"failed": failed}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
