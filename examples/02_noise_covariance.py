"""Thermal-noise covariance audit (fluctuation-dissipation check).

Mirrors the reference's ``NoiseCovariance.ipynb`` + ``WriteOutNoise``
(``Debug.H:381-409``): run a fluctuating mixture while dumping the
injected per-mode noise fields, then compare every mode's measured
variance against the analytic FDT amplitude

    momentum a=1..3 :  (2 lam - lam^2) kBT rho phi / rho_t
    ghost    a>=4   :  (2 lam - lam^2) kBT / cs^2 * b_a * rho

All engines dump the exact stream the trajectory consumed (the Pallas
kernel's coordinate-keyed hash noise is pure, so dumps are
reconstructed bit-exactly — see ``run.py``).

Run:  python examples/02_noise_covariance.py [--cpu]
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_HERE, os.path.dirname(_HERE)]  # examples/ + repo root
from _common import (ensure_dir, example_argparser, pick, setup_backend,
                     show)

args = example_argparser(__doc__, "out/examples/noise").parse_args()
setup_backend(args)

from bflbm_tpu import analysis, run as run_mod  # noqa: E402
from bflbm_tpu.config import preset  # noqa: E402

n = 16 * args.scale
ensure_dir(args.out)

cfg = preset("mixture-fluct").replace(
    shape=(n, n, n), nsteps=pick(args, 40, 10), step_continue=0,
    init="mixture", plot_int=0, sf_window=0, out_noise_int=2,
    out_dir=args.out)
run_mod.run(cfg)

# --- Analysis: per-mode <xi^2> / FDT table (NoiseCovariance.ipynb) -----
analysis.main(["noise", "--dir", args.out,
               "--kBT", str(cfg.params.kBT),
               "--tau", str(cfg.params.tau_f)])
show("expected", {"every mode ratio": "~1.0 +- few % (20 dumped frames)",
                  "momentum anticorrelation": "-1.0 between species"})

# --- Same audit on the coordinate-keyed stream (RANDRAW analog) --------
# noise_source="hash" makes the jnp engine's noise a pure function of
# (key, step, cell) — the stream noise_impl="hash" kernel runs consume —
# so any dumped frame is reconstructible offline from the run config.
cfg2 = cfg.replace(out_dir=args.out + "_hash", noise_source="hash")
ensure_dir(cfg2.out_dir)
run_mod.run(cfg2, engine="jnp")
analysis.main(["noise", "--dir", cfg2.out_dir,
               "--kBT", str(cfg2.params.kBT),
               "--tau", str(cfg2.params.tau_f)])
show("expected (hash stream)",
     {"every mode ratio": "~1.0 +- few % (CLT-4 byte-sum normals)"})
