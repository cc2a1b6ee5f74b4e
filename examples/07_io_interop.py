"""I/O interop: npz / HDF5 / AMReX plotfile round trips + checkpointing.

Mirrors the reference's ``HDF5RW.ipynb`` and its AMReX plotfile output
(``AMReX_FileIO.H:18-113``): run a short simulation writing frames in
each supported format, read everything back, verify the fields agree
bitwise, and demonstrate checkpoint/resume reproducing the unbroken
trajectory (the RNG key is part of the checkpoint, so the resumed run
continues the SAME noise stream — stronger than the reference's
restart).

The ``amrex`` format writes reference-compatible plotfile directories
(Header + Level_0/ VisMF files), so output from this framework can be
post-processed by AMReX tooling and vice versa.

Run:  python examples/07_io_interop.py [--cpu]
"""

import glob
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_HERE, os.path.dirname(_HERE)]  # examples/ + repo root
from _common import ensure_dir, example_argparser, setup_backend, show

args = example_argparser(__doc__, "out/examples/io").parse_args()
setup_backend(args)

from bflbm_tpu import run as run_mod  # noqa: E402
from bflbm_tpu.config import preset  # noqa: E402
from bflbm_tpu.io import fields as fields_io  # noqa: E402

ensure_dir(args.out)
n = 16 * args.scale
base = preset("mixture-fluct").replace(
    shape=(n, n, n), nsteps=30, step_continue=0, init="mixture",
    plot_int=10, sf_window=0)

# --- one short run per format ------------------------------------------
frames = {}
for fmt in ("npz", "h5", "amrex", "native"):
    cfg = base.replace(plot_fmt=fmt, out_dir=os.path.join(args.out, fmt))
    try:
        run_mod.run(cfg)
    except (ImportError, ModuleNotFoundError) as e:
        print(f"[skip] {fmt}: {e}")  # h5 needs h5py
        continue
    paths = sorted(glob.glob(os.path.join(cfg.out_dir, "plt*")))
    frames[fmt] = fields_io.read_frame(paths[-1])

ref = frames["npz"]
for fmt, d in frames.items():
    same = all(np.array_equal(ref[k], d[k]) for k in ("rho", "phi"))
    show(fmt, {"fields": sorted(k for k in d if k != "step"),
               "bitwise_equal_to_npz": bool(same)})

# --- checkpoint / resume -------------------------------------------------
cont = base.replace(plot_fmt="npz", nsteps=60, step_continue=30,
                    init="checkpoint",
                    checkpoint_path=os.path.join(
                        args.out, "npz", "checkpoint0000030"),
                    out_dir=os.path.join(args.out, "resumed"))
run_mod.run(cont)
straight = base.replace(plot_fmt="npz", nsteps=60,
                        out_dir=os.path.join(args.out, "straight"))
run_mod.run(straight)
a = fields_io.read_frame(os.path.join(args.out, "resumed", "plt0000060.npz"))
b = fields_io.read_frame(os.path.join(args.out, "straight", "plt0000060.npz"))
show("resume", {"trajectory_unbroken": bool(np.array_equal(a["rho"],
                                                           b["rho"]))})
