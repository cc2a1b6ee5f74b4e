"""Extended capillary run: continue the interface trajectory from the
phase-C checkpoint (603k) by another 400k steps and analyze only the
fully-equilibrated window — approximating the reference's 500k-800k
analysis window of an 800k-step run."""
import os, sys, glob, json, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from bflbm_tpu.config import preset
from bflbm_tpu import run as run_mod
from bflbm_tpu.observables import interface as iface
from bflbm_tpu.io import fields as fields_io

src = "out/acceptance2/interface-fluct"
ck = sorted(glob.glob(os.path.join(src, "checkpoint*.npz")))[-1]
start = int(ck.split("checkpoint")[-1].split(".")[0])
steps = 400_000
cfg = preset("interface-fluct").replace(
    nsteps=steps, step_continue=start, checkpoint_path=ck[:-4],
    plot_int=500, print_int=steps // 8,
    out_dir="out/acceptance2/interface-fluct2")
t0 = time.time()
run_mod.run(cfg)
wall = time.time() - t0

frames = sorted(glob.glob(os.path.join(cfg.out_dir, "plt*.npz")))
level = 0.5 * (0.1 + 3.0)
heights = []
for f in frames:
    d = fields_io.read_frame(f)
    try:
        heights.append(iface.interface_height(d["rho"], level)[4, :])
    except ValueError:
        pass
k, s = iface.capillary_spectrum_ref(np.asarray(heights))
kBT = 1e-5
gamma = iface.fit_capillary_gamma_window(k, s, kBT)
per_mode = {f"gamma_m{m}": round(float(kBT / (s[m - 1] * k[m - 1] ** 2)), 6)
            for m in (1, 2, 3, 5, 8, 12)}
print(json.dumps({"phase": "C2", "from_step": start, "steps": steps,
                  "wall_s": round(wall, 1), "n_frames": len(heights),
                  "gamma_ref": 0.012162,
                  "gamma_capillary": round(gamma, 6),
                  "rel_dev": round(abs(gamma / 0.012162 - 1), 4),
                  **per_mode}), flush=True)
