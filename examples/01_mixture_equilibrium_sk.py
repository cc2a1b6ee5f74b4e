"""Mixture equilibration + equilibrium structure factors.

Mirrors the reference's ``Mixture.ipynb`` / ``ReadMe.ipynb`` workflow
(and the ``Parameters`` "Mixture" recipe): the two-phase protocol — a
deterministic (kBT=0) equilibration writes an equilibrium-state
artifact, a fluctuating (kBT=1e-5) continuation accumulates on-device
structure factors — followed by the equipartition check that
S_rho(k)/(kBT/cs^2) is flat at 1.

Run:  python examples/01_mixture_equilibrium_sk.py [--cpu]
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_HERE, os.path.dirname(_HERE)]  # examples/ + repo root
from _common import (ensure_dir, example_argparser, pick, setup_backend,
                     show)

args = example_argparser(__doc__, "out/examples/mixture").parse_args()
setup_backend(args)

from bflbm_tpu import analysis, run as run_mod  # noqa: E402
from bflbm_tpu.config import preset  # noqa: E402

n = 16 * args.scale
ensure_dir(args.out)

# --- Step I: deterministic equilibration (Parameters: Mixture Step I) ---
n_eq = pick(args, 100, 20)
eq = preset("mixture-eq").replace(
    shape=(n, n, n), nsteps=n_eq, plot_int=pick(args, 50, 10),
    t_window=pick(args, 40, 20),
    out_dir=os.path.join(args.out, "eq"))
run_mod.run(eq)
ckpt = os.path.join(eq.out_dir, f"checkpoint{eq.nsteps:07d}")

# --- Step II: fluctuating continuation with structure factors ---------
fl = preset("mixture-fluct").replace(
    shape=(n, n, n), nsteps=n_eq + pick(args, 120 * args.scale, 40),
    step_continue=n_eq, plot_int=pick(args, 40, 20),
    sf_window=pick(args, 100 * args.scale, 20), sf_every=5,
    init="checkpoint", checkpoint_path=ckpt,
    out_dir=os.path.join(args.out, "fluct"))
run_mod.run(fl)

# --- Analysis: equipartition ratios (Mixture.ipynb cell 2) ------------
analysis.main(["sk", "--dir", fl.out_dir, "--kBT", str(fl.params.kBT)])
show("expected", {"rho*rho, phi*phi": "~1.0 +- a few % at this size",
                  "ufx/ufy/ufz": "~0.75 — the corrected-velocity "
                  "(3/4)kBT identity (LBM_validation.H; "
                  "tests/test_physics_validation.py)",
                  "ubx/uby/ubz": "~1.0 (bare velocity, kBT/2 "
                  "normalization)"})
