"""Droplet Brownian motion: COM MSD and Stokes-Einstein.

Mirrors the reference's ``xdg_msd_calc.ipynb`` workflow (and the
droplet part of ``Droplet_Fluctuation.ipynb``): equilibrate a droplet,
run a fluctuating continuation tracking the center of mass, compute the
mean-square displacement of the unwrapped COM trajectory, and compare
the diffusion coefficient with the finite-box Stokes-Einstein value
D = kBT / (6 pi eta R) * (1 - 2.837 R / L).

Production statistics need O(1M) steps over a 64^3 box (ACCEPTANCE.md
phase E: D/D_SE = 1.003 +- 0.032 over 7 independent trajectories); at
this smoke size the ratio lands within a factor ~2.

Run:  python examples/05_droplet_msd.py [--cpu]
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_HERE, os.path.dirname(_HERE)]  # examples/ + repo root
from _common import (ensure_dir, example_argparser, pick, setup_backend,
                     show)

args = example_argparser(__doc__, "out/examples/msd").parse_args()
setup_backend(args)

from bflbm_tpu import analysis, run as run_mod  # noqa: E402
from bflbm_tpu.config import preset  # noqa: E402

ensure_dir(args.out)
n = 24 * args.scale

n_eq = pick(args, 800, 60)
eq = preset("droplet-msd-eq").replace(
    shape=(n, n, n), nsteps=n_eq, plot_int=0, init_radius=0.25,
    out_dir=os.path.join(args.out, "eq"))
run_mod.run(eq)
ckpt = os.path.join(eq.out_dir, f"checkpoint{eq.nsteps:07d}")

fl = preset("droplet-msd-fluct").replace(
    shape=(n, n, n), nsteps=n_eq + pick(args, 600 * args.scale, 120),
    step_continue=n_eq,
    plot_int=pick(args, 20, 10), init="checkpoint", checkpoint_path=ckpt,
    out_dir=os.path.join(args.out, "fluct"))
run_mod.run(fl)

print("MSD / Stokes-Einstein (xdg_msd_calc):")
analysis.main(["msd", "--dir", fl.out_dir,
               "--kBT", str(fl.params.kBT),
               "--tau", str(fl.params.tau_f), "--skip", "2"])
show("expected", {"ratio": "-> 1.0 with production statistics "
                  "(ACCEPTANCE.md phase E)"})
