#!/usr/bin/env python
"""Debiased capillary-wave gamma from the ensemble mode series.

Processes the `hk_series.npy` files written by acceptance.py c-ens
(campaign 2+): per-frame Fourier amplitudes h_k(t) of the x=4 slice and
of the x-averaged height, m = 0..32, frames every 500 steps.

Corrections applied per mode and run:
1. finite-window mean-subtraction debias — the production estimator
   subtracts the window-mean profile, which removes E[|a_bar|^2] =
   (g/T) sigma^2 of a correlated series (g = sum_l (1-|l|/T) rho(l),
   measured from the series' own autocorrelation):
   S_corr = S_meas / (1 - g/T).
2. transverse-mode noise floor — a single slice's spectrum is the kx=0
   mode plus sum_{kx != 0} modes; fitting S(k) = kBT/(gamma k^2) + C
   absorbs the ky-independent floor.  The x-averaged channel has no
   floor by construction (C fitted as a consistency check).

Usage: python benchmarks/capillary_debias.py out/acceptance2/interface-ens-90000-*
"""
import glob
import json
import os
import sys

import numpy as np

KBT = 1e-5
NY = 256
M_FIT = np.arange(2, 13)   # modes for the (gamma, C) fit
REF = 0.012162


def autocorr_g(a, lmax=None):
    """g = sum_{|l|<T} (1 - |l|/T) rho(l) for a complex series a_t,
    rho from the unbiased sample autocovariance, truncated at the
    first non-positive rho (standard initial-positive-sequence rule)."""
    a = a - a.mean()
    T = len(a)
    lmax = lmax or T // 4
    c0 = np.mean(np.abs(a) ** 2)
    if c0 == 0:
        return 1.0
    g = 1.0
    for l in range(1, lmax):
        rho = np.real(np.mean(a[l:] * np.conj(a[:-l]))) / c0
        if rho <= 0:
            break
        g += 2.0 * (1.0 - l / T) * rho
    return g


def process_run(path):
    hk = np.load(os.path.join(path, "hk_series.npy"))  # (T, 2, 33)
    T = hk.shape[0]
    out = {}
    for ch, name in ((0, "slice"), (1, "xavg")):
        s_meas, s_corr, g_eff, stderr = [], [], [], []
        for m in range(33):
            a = hk[:, ch, m]  # raw backward-norm FFT (the reference's
            #                   cell 9 convention: no 1/N scaling)
            g = autocorr_g(a)
            var = np.mean(np.abs(a - a.mean()) ** 2)
            corr = var / max(1e-9, (1.0 - g / T))
            s_meas.append(var)
            s_corr.append(corr)
            g_eff.append(g)
            stderr.append(corr * np.sqrt(2.0 * g / T))
        out[name] = {"s_meas": np.array(s_meas),
                     "s_corr": np.array(s_corr),
                     "g": np.array(g_eff),
                     "stderr": np.array(stderr)}
    return out


def fit_gamma_floor(k, s, serr):
    """Weighted LS of s = kBT/(gamma k^2) + C -> (gamma, C, dgamma)."""
    x = 1.0 / k ** 2
    w = 1.0 / serr ** 2
    sw, sx, sy = np.sum(w), np.sum(w * x), np.sum(w * s)
    sxx, sxy = np.sum(w * x * x), np.sum(w * x * s)
    det = sw * sxx - sx * sx
    slope = (sw * sxy - sx * sy) / det
    icpt = (sxx * sy - sx * sxy) / det
    dslope = np.sqrt(sw / det)
    gamma = KBT / slope
    dgamma = gamma * dslope / slope
    return gamma, icpt, abs(dgamma)


def main():
    argv = sys.argv[1:]
    out_path = "out/acceptance2/capillary_debias.json"
    if argv and argv[0] == "--out":
        out_path = argv[1]
        argv = argv[2:]
    dirs = sorted(sum([glob.glob(p) for p in argv], []))
    runs = [process_run(d) for d in dirs if
            os.path.exists(os.path.join(d, "hk_series.npy"))]
    if not runs:
        print(json.dumps({"error": "no hk_series.npy found"}))
        return
    k = 2 * np.pi * np.arange(33) / NY
    result = {"n_runs": len(runs), "gamma_ref": REF}
    for name in ("slice", "xavg"):
        sc = np.stack([r[name]["s_corr"] for r in runs])  # (R, 33)
        sm = np.stack([r[name]["s_meas"] for r in runs])
        g = np.stack([r[name]["g"] for r in runs])
        mean_c = sc.mean(axis=0)
        err_c = sc.std(axis=0, ddof=1) / np.sqrt(len(runs))
        # per-run fits -> ensemble of gammas (robust error bar)
        gammas = []
        for r in range(len(runs)):
            gam, c0, _ = fit_gamma_floor(
                k[M_FIT], sc[r, M_FIT], runs[r][name]["stderr"][M_FIT])
            gammas.append(gam)
        gammas = np.array(gammas)
        # ensemble-mean spectrum fit
        gam_e, c_e, dgam_e = fit_gamma_floor(k[M_FIT], mean_c[M_FIT],
                                             np.maximum(err_c[M_FIT],
                                                        1e-12))
        per_mode = {int(m): {
            "gamma_raw": float(KBT / (sm.mean(axis=0)[m] * k[m] ** 2)),
            "gamma_debiased": float(KBT / (mean_c[m] * k[m] ** 2)),
            # cross-run scatter of the debiased per-mode gamma
            "gamma_stderr": float(KBT / (mean_c[m] * k[m] ** 2)
                                  * err_c[m] / mean_c[m]),
            "g_autocorr": float(g.mean(axis=0)[m]),
        } for m in range(1, 13)}
        result[name] = {
            "gamma_fit_ensemble_spectrum": round(float(gam_e), 6),
            "gamma_fit_err": round(float(dgam_e), 6),
            "floor_C": float(c_e),
            "gamma_per_run_mean": round(float(gammas.mean()), 6),
            "gamma_per_run_stderr": round(
                float(gammas.std(ddof=1) / np.sqrt(len(gammas))), 6),
            "rel_dev": round(float(gammas.mean() / REF - 1), 4),
            "rel_stderr": round(
                float(gammas.std(ddof=1) / np.sqrt(len(gammas)) / REF), 4),
            "per_mode": per_mode,
        }
    print(json.dumps(result))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
