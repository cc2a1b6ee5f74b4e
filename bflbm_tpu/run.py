"""Run driver + CLI: the replacement for ``main_run_job.cpp``.

Implements the reference pipeline (SURVEY.md §3.1) as a library function
plus a CLI: init (mixture/stripe/droplet/checkpoint) -> scanned step loop
with frame output, online structure-factor accumulation over the trailing
window, NaN sentinel, metrics -> end-of-run checkpoint -> (deterministic
runs) trailing-window time-average stored as the equilibrium-state
artifact (main_run_job.cpp:428-439).

Usage:
    python -m bflbm_tpu.run --preset mixture-eq --out out/mixture
    python -m bflbm_tpu.run --preset droplet-eq --nsteps 2000
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import LBMParams, RunConfig, preset, preset_names
from .io import checkpoint as ckpt
from .io import fields as fields_io
from .io.metrics import MetricsWriter
from .models import binary_fluid as model
from .observables import structfact as sf_lib
from .ops import hydro as hydro_ops
from .state import SimState
from .utils import debug


def _chunked(total: int, chunk: int):
    done = 0
    while done < total:
        n = min(chunk, total - done)
        yield done, n
        done += n


def _pick_chunk(events, nsteps: int, cap: int) -> int:
    """Steps per device execution: gcd of the event cadences, capped.

    Sparse cadences (e.g. print_int=5000 as the only event) would
    otherwise become one multi-minute device call — which the tunneled
    backend's RPC layer kills ("TPU worker crashed") and which starves
    the NaN sentinel.  The cap keeps every event on a chunk boundary by
    taking the largest divisor of the gcd <= cap (cap 0 = uncapped).
    With no events there is no boundary-alignment constraint (the run
    loop handles a remainder chunk), so return min(nsteps, cap) rather
    than a divisor — a prime nsteps must not degrade the chunk to 1."""
    if not events:
        return min(nsteps, cap) if cap else nsteps
    chunk = events[0]
    for v in events[1:]:
        chunk = math.gcd(chunk, v)
    chunk = max(1, min(chunk, nsteps))
    if cap and chunk > cap:
        chunk = max(d for d in range(1, cap + 1) if chunk % d == 0)
    return chunk


def run(cfg: RunConfig, *, mesh=None, engine: str = "auto",
        on_frame: Optional[Callable] = None,
        kernel_opts: Optional[dict] = None) -> SimState:
    """Execute a configured run; returns the final state.

    mesh: optional jax.sharding.Mesh for multi-device execution (GSPMD).
    engine: 'auto' (fused Pallas kernel on TPU where supported, else
    jnp), 'jnp', 'pallas', or 'halo' (shard_map + ppermute; needs mesh).
    on_frame(step, packed_hydro) is called at plot_int cadence.
    kernel_opts: optional overrides for the Pallas engines (block, tile,
    transform, noise_impl, noise_dist) — see kernels.fused_step.
    """
    kernel_opts = kernel_opts or {}
    p = cfg.params
    state = model.make_initial_state(cfg)
    if mesh is not None:
        from .parallel import mesh as mesh_lib

        state = mesh_lib.shard_state(state, mesh)

    os.makedirs(cfg.out_dir, exist_ok=True)
    metrics = MetricsWriter(os.path.join(cfg.out_dir, "metrics.jsonl"))

    # async frame writer: large frames go to background writer threads
    # (reference analog: AMReX async plotfile I/O)
    frame_writer = None
    if cfg.plot_int > 0 and cfg.plot_save and cfg.plot_fmt in ("auto",
                                                               "native"):
        nbytes = 22 * int(np.prod(cfg.shape)) * np.dtype(np.float32).itemsize
        if nbytes >= fields_io._AUTO_NATIVE_BYTES:
            from .io import native as native_io

            if native_io.available():
                frame_writer = native_io.AsyncFieldWriter()

    # USE_REF_STATE noise path: amplitudes from the stored equilibrium
    # state in the COM frame (main_run_job.cpp:216-235 + LBM_binary.H:92)
    ref_state = None
    if cfg.use_ref_state:
        if not cfg.ref_state_path:
            raise ValueError("use_ref_state requires ref_state_path")
        from .observables import stats as stats_obs

        rho_eq, phi_eq, _ = ckpt.load_equilibrium(cfg.ref_state_path)
        rho_eq = jnp.asarray(rho_eq, cfg.dtype)
        phi_eq = jnp.asarray(phi_eq, cfg.dtype)
        com_ref = np.asarray(stats_obs.center_of_mass(rho_eq))
        ref_state = (rho_eq, phi_eq, com_ref)

    # jnp-engine noise stream selector (RunConfig.noise_source): "hash"
    # = the per-cell coordinate-keyed stream (RANDRAW analog) — jnp
    # engine only; kernel engines select streams via noise_impl.
    nsrc = dict(noise_source=cfg.noise_source, noise_dist=cfg.noise_dist)
    if cfg.noise_source != "threefry":
        if engine == "auto":
            # a non-default noise_source IS a jnp-engine selection:
            # resolve auto to jnp rather than forcing callers to spell
            # engine='jnp' themselves
            engine = "jnp"
        elif engine != "jnp":
            raise ValueError(
                f"noise_source={cfg.noise_source!r} selects the jnp "
                "engine's stream; use engine='jnp' or 'auto' (kernel "
                "engines select their streams via kernel_opts "
                "noise_impl/noise_dist)")
    step_plain = jax.jit(lambda s: model.step(s, p, ref_state, **nsrc)[0],
                         donate_argnums=0)
    hydro_only = jax.jit(
        lambda s: hydro_ops.pack(model.prelude(s, p, ref_state, **nsrc)[0]))
    noise_only = (jax.jit(
        lambda s: model.prelude(s, p, ref_state, **nsrc)[1:3])
        if cfg.out_noise_int > 0 else None)

    # Fast bulk advancement: between observable events, advance `chunk`
    # steps at once through the selected engine (fused Pallas kernel on
    # TPU where the shape supports it; jnp scan otherwise).
    events = [v for v in (cfg.plot_int, cfg.print_int, cfg.out_noise_int,
                          cfg.droplet_int,
                          cfg.sf_every if (p.noise_on and cfg.sf_window)
                          else 0) if v]
    chunk = _pick_chunk(events, cfg.nsteps, cfg.chunk_cap)
    run_chunk = None
    sess = None
    if cfg.use_ref_state and engine not in ("auto", "jnp", "pallas"):
        raise ValueError(
            f"engine {engine!r} unavailable: USE_REF_STATE threads the "
            "equilibrium state through every step (jnp engine, or a "
            "kernel session — single-device or shard_map — with guarded "
            "per-chunk COM rolling)")
    on_tpu = jax.devices()[0].platform == "tpu"
    # test hook: exercise the session run loop on CPU in Pallas
    # interpret mode (single-tile shards; see kernels/session.py)
    interp = not on_tpu and bool(os.environ.get("BFLBM_SESSION_INTERPRET"))
    multi = mesh is not None and mesh.size > 1
    if engine in ("auto", "pallas") and (on_tpu or interp):
        # Persistent post-collide kernel session (kernels/session.py):
        # one jnp entry at run start, chunks advance RESIDENT in
        # post-collide space, and the ~130 ms boundary conversion is
        # paid only when an observable needs a post-stream view — so
        # production-cadence chunking (~100 steps) runs at the
        # 1000-step-chunk benchmark rate.  Covers single-device (with
        # lattice axis permutation) and shard_map meshes (with MESH
        # permutation: z-sharded meshes run the fast path too).
        from .kernels import session as session_lib

        sess = session_lib.make_session(
            p, cfg.shape, mesh=mesh if multi else None,
            ref_fields=ref_state if cfg.use_ref_state else None,
            interpret=interp, **kernel_opts)
        if sess is None and multi:
            import warnings

            degrade = ("raising (engine='pallas' was requested "
                       "explicitly)" if engine == "pallas" else
                       "falling back to the MUCH slower jnp chunk "
                       "engine")
            warnings.warn(
                f"mesh {dict(mesh.shape)} cannot run the fused-kernel "
                f"shard_map path for domain {cfg.shape} under any axis "
                "permutation (needs an unsharded 128-multiple lane axis "
                f"and 8-multiple local y) — {degrade}", stacklevel=2)
    if sess is None:
        # warn only on a SMALL chunk (per-chunk entry/exit overhead on
        # the non-resident engines) — a chunk_cap-limited chunk of
        # O(100+) is deliberate and cheap
        if events and chunk < min(min(events), 50) and chunk < cfg.nsteps:
            import warnings

            warnings.warn(
                f"event cadences {events} give a chunk of only {chunk} "
                "step(s): the run pays the chunk entry/exit overhead "
                "every time — make the cadences multiples of a common "
                "base for TPU throughput", stacklevel=2)
        if chunk > 2 and engine == "halo" and mesh is not None:
            from .parallel import halo as halo_par

            run_chunk = halo_par.make_halo_nsteps(mesh, p, chunk)
        if run_chunk is None and engine not in ("auto", "jnp"):
            raise ValueError(
                f"engine {engine!r} unavailable for this configuration"
                + (f" (event cadences collapse chunks to {chunk} "
                   "step(s); chunk engines need chunk > 2)"
                   if chunk <= 2 else ""))
    # Noise dumps (WriteOutNoise analog, Debug.H:381-409) are EXACT for
    # every dumped step under every engine: out_noise_int divides the
    # chunk size (gcd above), so each dump lands on a chunk boundary
    # where `noise_only(state)` draws the same threefry split the next
    # chunk's first step consumes (a kernel session fully EXITS at dump
    # boundaries and re-enters through the jnp prelude, which consumes
    # exactly the dumped draw — kernels/session.py docstring).
    # Non-dumped steps inside a kernel chunk use the in-kernel hash/HW
    # streams, which are not dumped — same cadence semantics as the
    # reference, whose WriteOutNoise only writes every out_noise_step.
    if sess is None and run_chunk is None and chunk > 1:
        def _scan_chunk(s):
            def body(st, _):
                st, _h = model.step(st, p, ref_state, **nsrc)
                return st, None
            out, _ = jax.lax.scan(body, s, None, length=chunk)
            return out

        run_chunk = jax.jit(_scan_chunk, donate_argnums=0)

    # structure factors over the trailing window (main_run_job.cpp:330,342-349)
    sf_state = None
    sf_start = cfg.step_continue + cfg.nsteps - cfg.sf_window
    use_sf = p.noise_on and cfg.sf_window > 0

    # frame 0 output (main_run_job.cpp:313-323)
    first = int(state.step)
    if cfg.plot_int > 0 and cfg.step_continue == 0:
        packed = hydro_only(state)
        if cfg.plot_save:
            fields_io.write_frame(cfg.out_dir, first, packed,
                                  fmt=cfg.plot_fmt)
        if on_frame:
            on_frame(first, packed)

    # equilibrium-state trailing average (deterministic runs)
    eq_accum = None
    eq_count = 0
    eq_paths = []  # frame files in the window, for the convergence report
    eq_start = cfg.step_continue + cfg.nsteps - cfg.t_window

    t0 = time.perf_counter()
    last = cfg.step_continue + cfg.nsteps
    step_i = first
    pc = None  # session-resident post-collide state
    try:
        while step_i < last:
            n = min(chunk, last - step_i)
            if sess is not None:
                if pc is None:
                    pc = sess.enter(state)  # donates; counts as 1 step
                    state = None
                    if n > 1:
                        pc = sess.advance(pc, n - 1)
                else:
                    pc = sess.advance(pc, n)
            elif run_chunk is not None and n == chunk:
                state = run_chunk(state)
            else:
                for _ in range(n):
                    state = step_plain(state)
            step_i += n

            dump_due = (noise_only is not None
                        and step_i % cfg.out_noise_int == 0)
            need_hydro = (
                (cfg.plot_int > 0 and step_i % cfg.plot_int == 0)
                or (use_sf and step_i >= sf_start and step_i % cfg.sf_every == 0)
                or (cfg.print_int > 0 and step_i % cfg.print_int == 0)
                or (cfg.droplet_int > 0 and step_i % cfg.droplet_int == 0)
                or step_i == last
            )
            if sess is not None:
                if dump_due or step_i >= last:
                    # full session exit: a noise dump must dump the draw
                    # the next step consumes (the re-entry prelude), and
                    # the end-of-run checkpoint needs the standard state
                    state = sess.exit(pc)
                    pc = None
                    view = state
                else:
                    view = sess.exit_view(pc) if need_hydro else None
            else:
                view = state

            if dump_due:
                xi_f, xi_g = noise_only(view)
                fields_io.write_noise_frame(cfg.out_dir, step_i, xi_f, xi_g)

            packed = hydro_only(view) if need_hydro else None

            if use_sf and step_i >= sf_start and step_i % cfg.sf_every == 0:
                if sf_state is None:
                    sf_state = sf_lib.init_structfact(
                        len(sf_lib.REFERENCE_PAIRS), cfg.shape)
                sf_state = sf_lib.accumulate(sf_state, packed,
                                             sf_lib.REFERENCE_PAIRS)

            if cfg.plot_int > 0 and step_i % cfg.plot_int == 0:
                if cfg.plot_save:
                    path = fields_io.write_frame(cfg.out_dir, step_i, packed,
                                                 fmt=cfg.plot_fmt,
                                                 writer=frame_writer)
                if on_frame:
                    on_frame(step_i, packed)
                if not p.noise_on and cfg.t_window > 0 and step_i >= eq_start:
                    arr = np.asarray(packed)
                    eq_accum = arr if eq_accum is None else eq_accum + arr
                    eq_count += 1
                    if cfg.plot_save:
                        eq_paths.append(path)

            if cfg.droplet_int > 0 and step_i % cfg.droplet_int == 0:
                # online droplet-radius series (radius_steps_out analog:
                # the reference fits the droplet INSIDE the step loop and
                # appends (W, R) every plot_int, main_run_job.cpp:353-378
                # + Debug.H:360-378) — long campaigns get live
                # convergence monitoring instead of flying blind until
                # offline analysis; consumed by `analysis.py radius`
                metrics.log(step_i, **_droplet_record(np.asarray(packed[0])))

            if cfg.print_int > 0 and step_i % cfg.print_int == 0:
                rho = packed[0]
                rec = {"mlups": (step_i - first)
                       * np.prod(cfg.shape) / (time.perf_counter() - t0) / 1e6}
                if bool(debug.has_nonfinite(rho)):
                    ckpt.save_state(
                        os.path.join(cfg.out_dir, f"abort{step_i:07d}"), view)
                    raise FloatingPointError(
                        f"non-finite density at step {step_i}; "
                        "state checkpointed")
                st = debug.field_stats(rho)
                rec.update({k: float(v) for k, v in st.items()})
                rec["mass_f"] = float(debug.mass(view.f))
                rec["mass_g"] = float(debug.mass(view.g))
                if sess is not None and cfg.use_ref_state:
                    # USE_REF_STATE per-chunk COM-roll guard (the
                    # reference re-rolls every step, LBM_binary.H:92-106;
                    # per-chunk is exact only while round(COM) is
                    # constant over the chunk — the session counts the
                    # chunks where it wasn't)
                    rec["ref_roll_violations"] = sess.ref_violations()
                metrics.log(step_i, **rec)

    finally:
        # drain pending async frame writes on ANY exit (an exception
        # or interrupt mid-run must not silently drop submitted frames;
        # the eq read-back below also needs the frames on disk)
        if frame_writer is not None:
            frame_writer.close()

    if sess is not None and cfg.use_ref_state and sess.ref_violations():
        import warnings

        warnings.warn(
            f"USE_REF_STATE: {sess.ref_violations()} chunk(s) saw the "
            "rounded COM shift change mid-chunk — the per-chunk "
            "equilibrium-state roll deviated from the reference's "
            "per-step update_com there; reduce chunk_cap (the droplet "
            "is drifting >1 cell per chunk)", stacklevel=2)

    # end-of-run artifacts
    ckpt.save_state(
        os.path.join(cfg.out_dir, f"checkpoint{last:07d}"), state,
        extra={"config": _cfg_json(cfg)})
    if sf_state is not None:
        s = np.asarray(sf_lib.finalize(sf_state))
        np.savez(os.path.join(cfg.out_dir, f"structfact{last:07d}.npz"),
                 s_k=s, pairs=np.asarray(sf_lib.REFERENCE_PAIRS),
                 names=np.asarray(sf_lib.pair_names()))
    if eq_accum is not None and eq_count > 0:
        mean = eq_accum / eq_count
        ckpt.save_equilibrium(
            os.path.join(cfg.out_dir, "equilibrium"),
            mean[0], mean[1], mean[5])
        # PrintConvergence analog (Debug.H:276-358): deviation field
        # (1/N) sum_t |rho_t - rho_mean| over the trailing window, reported
        # as ||.||_1 (cell mean) and ||.||_inf (cell max) norms.
        conv = {"window_frames": eq_count}
        if eq_paths:
            dev = np.zeros_like(mean[0])
            for path in eq_paths:
                dev += np.abs(fields_io.read_frame(path)["rho"] - mean[0])
            dev /= len(eq_paths)
            conv.update({"rho_dev_l1": float(dev.mean()),
                         "rho_dev_linf": float(dev.max()),
                         "window_frames": len(eq_paths)})
        with open(os.path.join(cfg.out_dir, "convergence.json"), "w") as fh:
            json.dump(conv, fh)
        metrics.log(last, **conv)
    metrics.close()
    return state


def _droplet_record(rho: np.ndarray) -> dict:
    """One online droplet-fit record: tanh-profile (R, W) fit about the
    excess-mass COM (fittingDropletParams, LBM_hydrovs.H:117-213) plus
    the always-robust equivalent-sphere radius.  A non-converged tanh
    fit (e.g. mid-quench, no droplet yet) drops the (R, W) keys but
    still logs R_mass and the COM."""
    from .observables import droplet as drop_obs

    excess = rho - rho[0, 0, 0]
    com = drop_obs.center_of_mass(excess)
    rec = {"droplet_com": [float(c) for c in com],
           "droplet_R_mass": float(drop_obs.radius_from_mass(rho))}
    try:
        fit = drop_obs.fit_droplet(rho, com)
    except (RuntimeError, ValueError):
        return rec
    rec["droplet_R"] = fit["R"]
    rec["droplet_W"] = fit["W"]
    return rec


def _cfg_json(cfg: RunConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["dtype"] = str(np.dtype(cfg.dtype)) if cfg.dtype else None
    return d


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=preset_names(), default="mixture-eq")
    ap.add_argument("--out", default=None)
    ap.add_argument("--nsteps", type=int, default=None)
    ap.add_argument("--shape", type=int, nargs=3, default=None)
    ap.add_argument("--kBT", type=float, default=None)
    ap.add_argument("--alpha0", type=float, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--plot-int", type=int, default=None)
    ap.add_argument("--print-int", type=int, default=None)
    ap.add_argument("--plot-fmt", default=None,
                    choices=["auto", "npz", "native", "h5", "amrex"])
    ap.add_argument("--sf-window", type=int, default=None)
    ap.add_argument("--sf-every", type=int, default=None)
    ap.add_argument("--out-noise-int", type=int, default=None)
    ap.add_argument("--init-width", type=float, default=None,
                    help="initial tanh interface width in cells "
                         "(0 = sqrt(kappa); stabilizes deep quenches)")
    ap.add_argument("--radius", type=float, default=None,
                    help="droplet init radius (fraction of box)")
    ap.add_argument("--rho-lo", type=float, default=None)
    ap.add_argument("--rho-hi", type=float, default=None)
    ap.add_argument("--kappa", type=float, default=None)
    ap.add_argument("--tau-f", type=float, default=None)
    ap.add_argument("--tau-g", type=float, default=None)
    ap.add_argument("--ref-state", default=None,
                    help="equilibrium artifact enabling USE_REF_STATE noise")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--mesh", type=int, nargs=3, default=None,
                    help="device mesh shape (x y z)")
    ap.add_argument("--engine", choices=["auto", "jnp", "pallas", "halo"],
                    default="auto")
    ap.add_argument("--block", type=int, default=None,
                    help="kernel temporal-blocking depth (default auto)")
    ap.add_argument("--transform", default=None,
                    choices=["unrolled", "eo", "eof", "eofc", "mxu"],
                    help="kernel moment-transform variant")
    ap.add_argument("--noise-dist", default=None,
                    choices=["clt4", "clt2", "u8", "bm"],
                    help="kernel normal generator (clt2: cheapest, "
                    "exact first/second moments, support +-2.44 sigma)")
    ap.add_argument("--mass-restore-int", type=int, default=None,
                    help="session engines: re-pin total f/g mass to the "
                    "run's invariant every N steps (default 1000; 0 "
                    "disables) — bounds the secular f32 drift at one "
                    "interval's rounding (the reference computes in "
                    "double and never drifts)")
    ap.add_argument("--noise-source", default=None,
                    choices=["threefry", "hash"],
                    help="jnp-engine noise stream; 'hash' = per-cell "
                    "coordinate-keyed (RANDRAW analog, reconstructible; "
                    "requires --engine jnp)")
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace (TensorBoard/xprof "
                    "format) covering the whole run")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize() "
                    "(coordinator/process env vars per the JAX docs) "
                    "before building the mesh; the state pytree is a "
                    "plain sharded array set, so nothing else changes")
    args = ap.parse_args(argv)

    if args.distributed:
        jax.distributed.initialize()

    cfg = preset(args.preset)
    if args.out:
        cfg = cfg.replace(out_dir=args.out)
    if args.nsteps is not None:
        cfg = cfg.replace(nsteps=args.nsteps)
    if args.shape is not None:
        cfg = cfg.replace(shape=tuple(args.shape))
    if args.seed is not None:
        cfg = cfg.replace(seed=args.seed)
    if args.plot_int is not None:
        cfg = cfg.replace(plot_int=args.plot_int)
    if args.print_int is not None:
        cfg = cfg.replace(print_int=args.print_int)
    if args.plot_fmt is not None:
        cfg = cfg.replace(plot_fmt=args.plot_fmt)
    if args.sf_window is not None:
        cfg = cfg.replace(sf_window=args.sf_window)
    if args.sf_every is not None:
        cfg = cfg.replace(sf_every=args.sf_every)
    if args.out_noise_int is not None:
        cfg = cfg.replace(out_noise_int=args.out_noise_int)
    if args.radius is not None:
        cfg = cfg.replace(init_radius=args.radius)
    if args.init_width is not None:
        cfg = cfg.replace(init_width=args.init_width)
    if args.ref_state:
        cfg = cfg.replace(use_ref_state=True, ref_state_path=args.ref_state)
    for name in ("rho_lo", "rho_hi", "kappa", "tau_f", "tau_g"):
        v = getattr(args, name)
        if v is not None:
            cfg = cfg.with_params(**{name: v})
    if args.checkpoint:
        cfg = cfg.replace(checkpoint_path=args.checkpoint, init="checkpoint")
    if args.kBT is not None:
        cfg = cfg.with_params(kBT=args.kBT)
    if args.alpha0 is not None:
        cfg = cfg.with_params(alpha0=args.alpha0)
    if args.noise_source is not None:
        cfg = cfg.replace(noise_source=args.noise_source,
                          **({"noise_dist": args.noise_dist}
                             if args.noise_dist is not None else {}))
    if args.f64:
        jax.config.update("jax_enable_x64", True)
        cfg = cfg.replace(dtype=jnp.float64)

    mesh = None
    if args.mesh is not None:
        from .parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(tuple(args.mesh))

    import contextlib

    prof = (jax.profiler.trace(args.profile_dir) if args.profile_dir
            else contextlib.nullcontext())
    kernel_opts = {k: v for k, v in (("block", args.block),
                                     ("transform", args.transform),
                                     ("noise_dist", args.noise_dist),
                                     ("mass_restore_int",
                                      args.mass_restore_int))
                   if v is not None}
    with prof:
        state = run(cfg, mesh=mesh, engine=args.engine,
                    kernel_opts=kernel_opts)
    print(json.dumps({"final_step": int(state.step),
                      "out_dir": cfg.out_dir}))


if __name__ == "__main__":
    main()
