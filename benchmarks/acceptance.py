"""Acceptance physics runs — the reference's headline validations at full
scale on TPU (BASELINE.md):

  A. mixture equilibration (two-phase protocol entry)
  B. fluctuating mixture -> equilibrium structure factors S(k) flat at
     the Mixture.ipynb normalizations (target: within 1%)
  C. flat interface -> capillary-wave spectrum gamma (target: 0.012162)
  D. droplet radius sweep -> Laplace-law gamma slope + equilibrium radii
     (target radii R/L: 0.176, 0.204, 0.231, 0.257, 0.283)

Usage: python benchmarks/acceptance.py <phase> [--steps N] [--out DIR]
Each phase prints one JSON line with its results.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def phase_a(args):
    from bflbm_tpu.config import preset
    from bflbm_tpu import run as run_mod

    cfg = preset("mixture-eq").replace(out_dir=f"{args.out}/mixture-eq",
                                       plot_int=100, t_window=200)
    state = run_mod.run(cfg)
    return {"phase": "A", "final_step": int(state.step),
            "out": cfg.out_dir}


def phase_b(args):
    from bflbm_tpu.config import preset
    from bflbm_tpu import run as run_mod
    from bflbm_tpu.observables import structfact as sf_lib

    steps = args.steps or 200_000
    window = min(steps // 2, 100_000)
    cfg = preset("mixture-fluct").replace(
        nsteps=steps, step_continue=500,
        checkpoint_path=f"{args.out}/mixture-eq/checkpoint0000500",
        sf_window=window, sf_every=100, plot_int=0, print_int=steps // 10,
        out_dir=f"{args.out}/mixture-fluct")
    t0 = time.time()
    state = run_mod.run(cfg)
    wall = time.time() - t0

    sf_files = sorted(glob.glob(os.path.join(cfg.out_dir, "structfact*")))
    with np.load(sf_files[-1], allow_pickle=True) as d:
        sk = np.fft.ifftshift(d["s_k"], axes=(-3, -2, -1))
        names = [str(n) for n in d["names"]]
    kBT = 1e-5
    cs2 = 1.0 / 3.0
    # Equilibrium normalizations (Mixture.ipynb cells 1-2): bare LB
    # velocities carry kBT/rho; the REAL velocities in the 22-comp
    # schema carry the 3/4-identity; uf.ug cross carries 1/4 kBT.
    norm = {"rho*rho": kBT / cs2, "phi*phi": kBT / cs2,
            "ufx*ufx": 0.75 * kBT, "ufy*ufy": 0.75 * kBT,
            "ufz*ufz": 0.75 * kBT,
            "ufx*ugx": 0.25 * kBT,
            "ufbarx*ufbarx": kBT, "ugbarx*ugbarx": kBT,
            "ubx*ubx": kBT / 2, "uby*uby": kBT / 2, "ubz*ubz": kBT / 2}
    out = {"phase": "B", "steps": steps, "wall_s": round(wall, 1),
           "sf_frames": int(window // 100)}
    worst = 0.0
    for p, name in enumerate(names):
        if name not in norm:
            continue
        k, s = sf_lib.radial_average(np.real(sk[p]))
        r = float(np.mean(s) / norm[name])
        out[name] = round(r, 5)
        worst = max(worst, abs(r - 1.0))
    out["worst_abs_dev"] = round(worst, 5)
    return out


def phase_c(args):
    from bflbm_tpu.config import preset
    from bflbm_tpu import run as run_mod
    from bflbm_tpu.observables import interface as iface
    from bflbm_tpu.io import fields as fields_io

    out_eq = f"{args.out}/interface-eq"
    if not os.path.exists(os.path.join(out_eq, "checkpoint0003000.npz")):
        cfg0 = preset("interface-eq").replace(out_dir=out_eq, plot_int=0)
        run_mod.run(cfg0)

    steps = args.steps or 200_000
    cfg = preset("interface-fluct").replace(
        nsteps=steps, step_continue=3000,
        checkpoint_path=f"{out_eq}/checkpoint0003000",
        plot_int=500, print_int=steps // 10,
        out_dir=f"{args.out}/interface-fluct")
    t0 = time.time()
    run_mod.run(cfg)
    wall = time.time() - t0

    frames = sorted(glob.glob(os.path.join(cfg.out_dir, "plt*.npz"))
                    + glob.glob(os.path.join(cfg.out_dir, "plt*.bflbm")))
    skip = len(frames) // 2  # discard noise-equilibration transient
    heights = []
    level = 0.5 * (0.1 + 3.0)
    for f in frames[skip:]:
        d = fields_io.read_frame(f)
        # per-column NaN fill (overhangs) instead of dropping whole frames
        h = iface.fill_missing(iface.interface_height(d["rho"], level))
        heights.append(h[4, :])
    k, s = iface.capillary_spectrum_ref(np.asarray(heights))
    kBT = 1e-5
    gamma = iface.fit_capillary_gamma_window(k, s, kBT)
    per_mode = {f"gamma_m{m}": round(float(kBT / (s[m - 1] * k[m - 1] ** 2)), 6)
                for m in (1, 2, 3, 5, 8)}
    return {"phase": "C", "steps": steps, "wall_s": round(wall, 1),
            "n_frames": len(heights), "gamma_ref": 0.012162,
            "gamma_capillary": round(gamma, 6),
            "rel_dev": round(abs(gamma / 0.012162 - 1), 4), **per_mode}


def phase_d(args):
    from bflbm_tpu.config import preset
    from bflbm_tpu import run as run_mod
    from bflbm_tpu.io import fields as fields_io
    from bflbm_tpu.observables import droplet as drop_obs

    radii = [0.2, 0.23, 0.25, 0.28, 0.3]
    ref_radii = [0.1760534, 0.20426208, 0.23111422, 0.25739767, 0.2831091]
    steps = args.steps or 20_000
    results = []
    for r in radii:
        cfg = preset("droplet-eq").replace(
            nsteps=steps, init_radius=r, plot_int=0,
            out_dir=f"{args.out}/droplet-r{r:.2f}")
        state = run_mod.run(cfg)
        rho = np.asarray(state.f.sum(axis=0))
        phi = np.asarray(state.g.sum(axis=0))
        com = drop_obs.center_of_mass(rho - rho[0, 0, 0])
        fit = drop_obs.fit_droplet(rho, com)
        dp = drop_obs.laplace_delta_p(rho, phi, 1.5, com)
        results.append({"init_r": r, "R_over_L": round(fit["R"] / 32, 6),
                        "delta_p": round(dp, 6)})
    gamma, icpt = drop_obs.surface_tension_laplace(
        [32 * x["R_over_L"] for x in results],
        [x["delta_p"] for x in results])
    devs = [abs(a["R_over_L"] - b) / b for a, b in zip(results, ref_radii)]
    # The reference fits DeltaP vs 1/(R/L) and quotes slope/2
    # (Surface_Tension.ipynb cell 17 saved output: slope 0.0215679,
    # "theoretical surface tension" 0.0107839 at alpha0=1.5).  Our fit
    # uses lattice-unit R; conversion: k_ref = gamma_lat / (L/2).
    k_ref_conv = gamma / 16.0
    return {"phase": "D", "steps": steps, "runs": results,
            "gamma_laplace_slope_lat": round(gamma, 6),
            "laplace_intercept": round(icpt, 6),
            "slope_ref_convention": round(k_ref_conv, 6),
            "slope_reference_value": 0.021567889346707517,
            "slope_rel_dev": round(abs(k_ref_conv / 0.021567889 - 1), 5),
            "ref_radii": ref_radii,
            "radius_max_rel_dev": round(max(devs), 5)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["a", "b", "c", "d"])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--out", default="out/acceptance")
    args = ap.parse_args()
    fn = {"a": phase_a, "b": phase_b, "c": phase_c, "d": phase_d}
    print(json.dumps(fn[args.phase](args)), flush=True)


if __name__ == "__main__":
    main()
