#!/usr/bin/env python
"""Benchmark: MLUPS for the fused D3Q19 binary FLBM step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MLUPS", "vs_baseline": N}

vs_baseline is measured MLUPS / per-chip north-star target.  The driver
target is >=5 GLUPS aggregate on a v5e-8 (BASELINE.json), i.e. 625 MLUPS
per chip; the reference publishes no throughput numbers (BASELINE.md).
"""

import argparse
import json
import os
import sys

PER_CHIP_TARGET_MLUPS = 5000.0 / 8.0  # north-star 5 GLUPS on 8 chips


def watchdog_reexec():
    """The tunneled TPU backend intermittently hangs at init (CLAUDE.md);
    a hang here would zero the scored benchmark.  Parent mode: re-exec
    this script as a child, kill+retry if it goes silent through the
    init window (normal init can take 2-5 min), forward its stdout."""
    import subprocess
    import threading
    import time

    env = dict(os.environ, BFLBM_BENCH_CHILD="1")
    init_window, hard_timeout = 420.0, 1800.0
    # deadline- (not attempt-)bounded: tunnel outages can last hours and
    # a benchmark that gives up after 3 init hangs scores zero
    budget = float(os.environ.get("BFLBM_BENCH_BUDGET_S", "5400"))
    deadline = time.time() + budget
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)]
                                + sys.argv[1:], env=env,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)
        last = [time.time()]
        got = [False]

        def pump():
            for line in proc.stdout:
                last[0] = time.time()
                if line.strip() and "is experimental" not in line:
                    got[0] = True
                sys.stdout.write(line)
                sys.stdout.flush()

        def pump_err():
            # the child prints "[bench] backend alive" to stderr once
            # the tunneled backend completes a real op — from then on
            # the init window stops gating and only the hard timeout
            # bounds the (possibly slow, cache-cold) 256^3 compile
            for line in proc.stderr:
                if "[bench] backend alive" in line:
                    got[0] = True
                    last[0] = time.time()
                sys.stderr.write(line)
                sys.stderr.flush()

        th = threading.Thread(target=pump, daemon=True)
        th.start()
        th2 = threading.Thread(target=pump_err, daemon=True)
        th2.start()
        t0 = time.time()
        while proc.poll() is None:
            time.sleep(2.0)
            now = time.time()
            if not got[0] and now - last[0] > init_window:
                print(f"[bench watchdog] no output after {init_window}s; "
                      "killing", file=sys.stderr, flush=True)
                proc.kill()
                break
            if now - t0 > hard_timeout:
                print(f"[bench watchdog] hard timeout {hard_timeout}s",
                      file=sys.stderr, flush=True)
                proc.kill()
                break
        proc.wait()
        th.join(timeout=10)
        if proc.returncode == 0:
            return 0
        print(f"[bench watchdog] attempt {attempt} -> "
              f"{proc.returncode}; retrying in 20 s "
              f"({deadline - time.time():.0f}s of budget left)",
              file=sys.stderr, flush=True)
        time.sleep(20.0)
    return 1


if os.environ.get("BFLBM_BENCH_CHILD", "") != "1" and __name__ == "__main__":
    sys.exit(watchdog_reexec())

import jax  # noqa: E402

# Persistent compile cache ACROSS watchdog retries (round 5, VERDICT r4
# #7): the r4 scored run burned two 420-s init-hang kills (~26% of the
# bench budget) and every retry re-paid the full 256^3 compile.  With
# the cache, a killed attempt's compile work carries over and a normal
# window scores on attempt 1 even after earlier kills.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BFLBM_JAX_CACHE",
                                 "/tmp/bflbm_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bflbm_tpu.config import LBMParams  # noqa: E402
from bflbm_tpu.models import binary_fluid as model  # noqa: E402
from bflbm_tpu.utils.timing import time_steps  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=None)
    # 100-step chunks AT PRODUCTION CADENCE: since kernels/session.py
    # the state stays RESIDENT in post-collide space across chunks, so
    # the chunk size no longer buys throughput (the old per-chunk jnp
    # entry/exit cost ~130 ms at 256^3: r3 ladder 978.7 @ 50 ->
    # 1217.9 @ 1000).  100 is the physics campaigns' S(k)/frame
    # cadence — the scored number now IS the production number.
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--kBT", type=float, default=1e-5)
    ap.add_argument("--alpha0", type=float, default=0.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--impl", choices=["auto", "jnp", "pallas"],
                    default="auto")
    ap.add_argument("--coupled", action="store_true",
                    help="benchmark the coupled model (alpha0=1.5): "
                    "exercises the in-kernel density + 19-pt gradient "
                    "force path of the production interface/droplet cases")
    args = ap.parse_args()
    if args.coupled:
        args.alpha0 = 1.5

    platform = jax.devices()[0].platform
    # tiny probe BEFORE the big build: its completion both proves the
    # tunneled backend actually initialized (the watchdog's init window
    # stops gating once any line lands) and distinguishes "backend hung
    # at init" (kill+retry) from "256^3 compile is slow" (let it run —
    # the hard timeout still bounds it)
    from bflbm_tpu.utils.timing import fetch_scalar as _fs
    _fs(jnp.ones((8, 128)) * 2.0)
    print(f"[bench] backend alive: {platform}", file=sys.stderr,
          flush=True)
    if args.shape is None:
        # full benchmark config on accelerators, small smoke on CPU
        args.shape = [256, 256, 256] if platform != "cpu" else [64, 64, 64]
    shape = tuple(args.shape)
    params = LBMParams(alpha0=args.alpha0, kBT=args.kBT)

    state = model.init_mixture(shape, params, dtype=jnp.float32)

    impl = args.impl
    if impl == "auto":
        try:
            from bflbm_tpu.kernels import fused_step  # noqa: F401

            impl = "pallas" if platform == "tpu" else "jnp"
        except Exception:
            impl = "jnp"

    cells = int(np.prod(shape))

    from bflbm_tpu.utils.timing import fetch_scalar

    # Fallback ladder: a deterministic compile/run failure of the newest
    # kernel variant must not zero the scored benchmark.  Fastest
    # validated config first: the persistent session (state resident in
    # post-collide space between chunks — kernels/session.py) with
    # u8 single-byte uniform deviates (Ladd's original FLBM noise;
    # exact first/second moments; per-mode variance 0.15% and S(k)
    # equipartition validated on HW — u8_r4.json, acceptance_u8), then
    # CLT-2 byte-pair normals (ACCEPTANCE.md B-kernel-clt2), the CLT-4
    # default, the round-2-validated "eo" transform, the non-resident
    # per-chunk kernel, then jnp.  Hangs are handled by the watchdog
    # parent, crashes here.
    attempts = []
    if impl == "pallas":
        attempts += [("session:u8", ("session", {"noise_dist": "u8"})),
                     ("session:clt2", ("session", {"noise_dist": "clt2"})),
                     ("session", ("session", {})),
                     ("session:eo", ("session", {"transform": "eo"})),
                     ("pallas:chunked", ("nsteps", {}))]
    attempts += [("jnp", ("jnp", None))]

    run_n = state_b = None
    for label, (kind, kw) in attempts:
        try:
            # fresh state per attempt: a failed donated execution may
            # have invalidated the previous buffer
            state = model.init_mixture(shape, params, dtype=jnp.float32)
            if kind == "session":
                from bflbm_tpu.kernels.session import FusedSession

                sess = FusedSession(params, shape, **kw)
                pc = sess.enter(state)

                def run_n(p, _s=sess):  # noqa: F811
                    return _s.advance(p, args.steps)
            elif kind == "nsteps":
                from bflbm_tpu.kernels.fused_step import make_nsteps

                run_n = make_nsteps(params, args.steps, **kw)
                pc = state
            else:
                run_n = jax.jit(
                    lambda s: model.nsteps(s, params, args.steps),
                    donate_argnums=0)
                pc = state
            state_b = run_n(pc)  # compile + warmup
            fetch_scalar(state_b)
            impl = label
            break
        except Exception as e:  # noqa: BLE001 — deliberate ladder
            print(f"[bench] {label} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
            run_n = state_b = None
    if run_n is None:
        raise SystemExit("all benchmark paths failed")

    # chain repeats on the evolving state: measures the production
    # steady-state step rate (no re-init inside the timed region)
    carry = {"s": state_b}

    def bench_once():
        carry["s"] = run_n(carry["s"])
        fetch_scalar(carry["s"])  # true completion barrier (utils.timing)
        return carry["s"]

    res = time_steps(bench_once, cells, args.steps, warmup=1,
                     repeats=args.repeats)

    out = {
        "metric": f"MLUPS {shape[0]}x{shape[1]}x{shape[2]} D3Q19 binary "
                  f"FLBM (kBT={args.kBT}"
                  + (f", alpha0={args.alpha0}" if args.alpha0 else "")
                  + f", {impl}, {platform})",
        "value": round(res["mlups"], 2),
        "unit": "MLUPS",
        "vs_baseline": round(res["mlups"] / PER_CHIP_TARGET_MLUPS, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
