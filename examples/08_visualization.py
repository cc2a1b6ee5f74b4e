"""Visualization: slices, interface profiles, S(k), time series.

Mirrors the reference's ``Visualization.ipynb`` / ``Viewer.ipynb`` /
``PlotFig.ipynb``: run a small droplet case and render the standard
figures with the bundled viz CLI (matplotlib) — a mid-plane density
slice, the radial/axis profile, the radially-averaged structure factor,
and the per-frame mean time series.

Run:  python examples/08_visualization.py [--cpu]
PNG outputs land in --out.
"""

import glob
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_HERE, os.path.dirname(_HERE)]  # examples/ + repo root
from _common import (ensure_dir, example_argparser, pick, setup_backend,
                     show)

args = example_argparser(__doc__, "out/examples/viz").parse_args()
setup_backend(args)

from bflbm_tpu import run as run_mod, viz  # noqa: E402
from bflbm_tpu.config import preset  # noqa: E402

ensure_dir(args.out)
n = 24 * args.scale
cfg = preset("droplet-eq").replace(
    shape=(n, n, n), nsteps=pick(args, 600, 60),
    plot_int=pick(args, 100, 20), init_radius=0.3,
    out_dir=os.path.join(args.out, "run"))
run_mod.run(cfg)
last = sorted(glob.glob(os.path.join(cfg.out_dir, "plt*.npz")))[-1]

viz.main(["slice", "--frame", last, "--field", "rho", "--axis", "2",
          "--out", os.path.join(args.out, "slice_rho.png")])
viz.main(["profile", "--frame", last, "--axis", "0",
          "--out", os.path.join(args.out, "profile.png")])
viz.main(["series", "--dir", cfg.out_dir, "--field", "rho",
          "--out", os.path.join(args.out, "series.png")])
show("outputs", sorted(os.path.basename(p) for p in
                       glob.glob(os.path.join(args.out, "*.png"))))
