"""Round-5 long-run f32 mass-drift measurement (VERDICT r4 #5).

The reference computes in double (amrex::Real, GNUmakefile default) and
never drifts; our f32 kernel's exact-mass collision leaves a residual
~1e-9/step relative drift from forward-transform pair-sum rounding
(ACCEPTANCE r3/r4), i.e. ~0.1% over an 800k-step campaign.  Round 5
adds a cadenced global exact-mass restore
(fused_step.mass_restore_step, session default every 1000 steps): the
defect is re-pinned to the entry invariant, so the SECULAR drift is
bounded by one interval's rounding (~1e-6 relative) independent of run
length.

This script measures, at the scored config (256^3, kBT=1e-5, u8,
session auto block), over 100k steps:

  restore_on   — session default (mass_restore_int=1000)
  restore_off  — mass_restore_int=0 (the r4 behavior)

reporting per-10k-step relative total-mass series, the end-to-end
drift/step, and the throughput ratio (must be within 2%).

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 5400 -- \
         python benchmarks/tpu_massdrift_r5.py [--steps 100000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bflbm_tpu.config import LBMParams  # noqa: E402
from bflbm_tpu.kernels.session import FusedSession  # noqa: E402
from bflbm_tpu.models import binary_fluid as model  # noqa: E402
from bflbm_tpu.utils.timing import fetch_scalar  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--steps", type=int, default=100_000)
ap.add_argument("--shape", type=int, nargs=3, default=[256, 256, 256])
args = ap.parse_args()

SHAPE = tuple(args.shape)
CELLS = float(np.prod(SHAPE))
CHUNK = 10_000
params = LBMParams(alpha0=0.0, kBT=1e-5)
t0 = time.time()
results = {"steps": args.steps, "shape": SHAPE}


def run(label, mri):
    sess = FusedSession(params, SHAPE, noise_dist="u8",
                        mass_restore_int=mri)
    st = model.init_mixture(SHAPE, params, dtype=jnp.float32)
    m0 = float(np.asarray(jnp.sum(st.f, dtype=jnp.float64)
                          if st.f.dtype == jnp.float64
                          else jnp.sum(st.f)))
    pc = sess.enter(st)
    pc = sess.advance(pc, 100)   # compile + warmup
    fetch_scalar(pc)
    print(json.dumps({"label": label, "warm": True,
                      "t": round(time.time() - t0, 1)}), flush=True)
    series = []
    tt = time.time()
    done = 100
    while done < args.steps:
        n = min(CHUNK, args.steps - done)
        # 1000-step sub-chunks (= chunk_cap, the production cadence):
        # a single 10k-step device program outlives the tunnel's RPC
        # window and crashes the worker
        for _ in range(n // 1000):
            pc = sess.advance(pc, 1000)
        rem = n % 1000
        if rem:
            pc = sess.advance(pc, rem)
        done += n
        mf = float(np.asarray(jnp.sum(sess.exit_view(pc).f)))
        series.append(round(mf / m0 - 1.0, 12))
        print(json.dumps({"label": label, "step": done,
                          "rel": series[-1],
                          "t": round(time.time() - t0, 1)}), flush=True)
    wall = time.time() - tt
    mlups = CELLS * (done - 100) / wall / 1e6
    drift_per_step = series[-1] / done
    results[label] = {
        "rel_mass_series_per_10k": series,
        "end_rel_drift": series[-1],
        "drift_per_step": drift_per_step,
        "mlups": round(mlups, 1),
        "wall_s": round(wall, 1),
    }
    print(json.dumps({label: results[label]["end_rel_drift"],
                      "mlups": results[label]["mlups"],
                      "t": round(time.time() - t0, 1)}), flush=True)


run("restore_on", 1000)
run("restore_off", 0)

on, off = results["restore_on"], results["restore_off"]
results["throughput_ratio"] = round(on["mlups"] / off["mlups"], 4)
results["verdict_done"] = (abs(on["drift_per_step"]) <= 1e-10
                           and results["throughput_ratio"] >= 0.98)

out = os.path.join(os.path.dirname(__file__), "results",
                   "massdrift_r5.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
