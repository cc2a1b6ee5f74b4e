#!/usr/bin/env python
"""First-principles droplet diffusion constant (acceptance phase E).

Acceptance E measures the droplet's Brownian MSD on the xdg_msd_calc
protocol (32^3, alpha0=4, rho_hi=1, rho_lo=0, kBT=5e-5; COM of the
threshold-filtered density) and compares D_fit = slope/6 against
finite-box Stokes-Einstein: the 7-seed ensemble gave
D_fit/D_SE = 1.003 +- 0.032 (ACCEPTANCE.md E).  Here D is PREDICTED
from exact linear response of the production step — no hydrodynamic
theory, no fit, no free parameters — the phase-E analog of
capillary_model.py (phase C) and droplet_model.py (phase F).

Method.  Linearize the fluctuating update s' = F(s, n) at the
deterministic equilibrium droplet s* (M = dF/ds, B = dF/dn) and take
the COM cotangent l = d com(s)/d s of the EXACT measured functional
(threshold filter rho > 0.06, grid coordinates — acceptance.py
reduce_frame).  The COM after T steps is a linear functional of the
noise history,

    com_T - com_drift = sum_{j=0}^{T-1} (B^T (M^T)^j l) . n_{T-1-j},

so Var(com_T) = sum_j inc_j with inc_j = ||B^T (M^T)^j l||^2 — one
jax.vjp of the step per term.  inc_j is the squared displacement the
droplet EVENTUALLY inherits from the noise injected j steps earlier:
as j grows, the injected momentum completes its Stokes relaxation
around the periodic box and inc_j converges to a constant; Brownian
motion IS that plateau, Var(com_T) ~ 2 D T with

    D = lim_j inc_j / 2             (per axis).

Unlike every other observable in this machinery the COM is the
droplet's NEUTRAL translation coordinate — its Gram increments must
NOT decay; the certificate here is plateau flatness (trailing-window
relative slope), not a geometric tail.  The finite-box Stokes-Einstein
factor (1 - 2.84 R/L) the measurement needs as an input emerges from
the exact step dynamics automatically.

Stages (artifacts in out/msd_model/):
  profile   refine out/acceptance2/droplet-msd-eq32/checkpoint0020000
            (the state phase E's trajectories branch from) to the
            deterministic fixed point;
  adjoint   the inc_j series for the 3 COM cotangents (vmapped vjp);
            checkpoints every 100 terms; plateau certificate;
  report    D_pred vs the measured 7-seed ensemble (re-fit from the
            saved msd_rows.npy when present) and vs D_SE.

Reference anchors: xdg_msd_calc.ipynb (protocol + Dse/Db cells),
LBM_binary.H:73-132 (noise model), system_unit.ipynb (32^3 droplet).
"""
import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# size-dependent globals, bound by _set_size() from --size (default 32)
OUT = None
EQ_CKPT = None
MEASURED_GLOB = None
SHAPE = None

KBT = 5e-5
THRESH = 0.06   # acceptance.py reduce_frame img_filter


def _set_size(n):
    global OUT, EQ_CKPT, MEASURED_GLOB, SHAPE
    SHAPE = (n, n, n)
    suffix = "" if n == 32 else str(n)
    OUT = os.path.join(ROOT, "out", "msd_model" + suffix)
    EQ_CKPT = os.path.join(ROOT, "out", "acceptance2",
                           f"droplet-msd-eq{n}", "checkpoint0020000.npz")
    MEASURED_GLOB = os.path.join(ROOT, "out", "acceptance2",
                                 f"droplet-msd-fluct{n}*", "msd_rows.npy")


def make_params():
    from bflbm_tpu.config import LBMParams
    return LBMParams(alpha0=4.0, kBT=KBT, kappa=0.001,
                     rho_lo=0.0, rho_hi=1.0)


def step_explicit(fg, n, params):
    """Production step, 33 unit normals explicit (same construction as
    droplet_model.step_explicit — ops/noise.thermal_noise layout)."""
    from bflbm_tpu.ops import collide as collide_ops
    from bflbm_tpu.ops import hydro as hydro_ops
    from bflbm_tpu.ops import noise as noise_ops
    from bflbm_tpu.ops import stream as stream_ops

    f, g = fg
    hbar = hydro_ops.hydrovars_bar(f, g, params)
    amp_mom, amp_gf, amp_gg = noise_ops.noise_amplitudes(
        hbar.rho, hbar.phi, params, f.dtype)
    zero = jnp.zeros((1,) + f.shape[1:], f.dtype)
    xi_mom = amp_mom[None] * n[:3]
    xi_f = jnp.concatenate([zero, xi_mom, amp_gf * n[3:18]])
    xi_g = jnp.concatenate([zero, -xi_mom, amp_gg * n[18:33]])
    h = hydro_ops.hydrovars(f, g, xi_f, xi_g, params, hbar)
    f1, g1 = collide_ops.collide(f, g, h, xi_f, xi_g, params)
    return (stream_ops.stream(f1), stream_ops.stream(g1))


def _grids(dtype):
    return [jnp.arange(nn, dtype=dtype).reshape(
        tuple(nn if d == i else 1 for i in range(3)))
        for i, (nn, d) in enumerate(zip(SHAPE, range(3)))]


def com_obs_thresh(f):
    """The exact phase-E COM functional of the f-species density:
    threshold-filtered, plain grid coordinates (acceptance.py
    reduce_frame; the droplet sits at the box center so no wrap).

    CAVEAT (measured, see report.json): this functional is only
    a.e.-differentiable — its linearization drops the threshold-
    boundary terms, so its translation response is ~0.86 instead of 1
    and the raw plateau UNDERCOUNTS the physical diffusion by that
    factor squared.  Kept as the diagnostic; the headline prediction
    uses com_obs_smooth (unit response by construction).  The MEASURED
    MSD is insensitive to the choice: any estimator tracking the
    droplet with bounded error has the same long-lag slope."""
    rho = jnp.sum(f, axis=0)
    filt = jnp.where(rho > THRESH, rho, 0.0)
    mass = jnp.sum(filt)
    return jnp.stack([jnp.sum(filt * g)
                      for g in _grids(f.dtype)]) / mass


def com_obs_smooth(f, rho_bg):
    """Excess-mass COM: com = sum (rho - rho_bg) x / sum (rho - rho_bg)
    — SMOOTH in the state (no threshold), with EXACTLY unit response to
    a rigid translation of the profile (numerator shifts by
    excess*Delta, denominator is translation-invariant), so the adjoint
    plateau normalizes directly to the physical diffusion constant.
    The un-filtered background noise this admits adds only a DECAYING
    contribution to the Gram increments (background fluctuations
    decorrelate), not to the plateau."""
    rho = jnp.sum(f, axis=0)
    ex = rho - rho_bg
    mass = jnp.sum(ex)
    return jnp.stack([jnp.sum(ex * g) for g in _grids(f.dtype)]) / mass


# ---------------------------------------------------------------------------


def stage_profile(args):
    params = make_params()
    d = np.load(EQ_CKPT)
    fg = (jnp.asarray(d["f"], jnp.float32), jnp.asarray(d["g"], jnp.float32))
    zero_n = jnp.zeros((33,) + SHAPE, jnp.float32)

    @jax.jit
    def chunk(fg):
        def body(c, _):
            return step_explicit(c, zero_n, params), None
        out, _ = jax.lax.scan(body, fg, None, length=1000)
        return out

    t0 = time.time()
    hist = []
    res = None
    for it in range(args.profile_chunks):
        fg_new = chunk(fg)
        res = max(float(jnp.max(jnp.abs(fg_new[0] - fg[0]))),
                  float(jnp.max(jnp.abs(fg_new[1] - fg[1]))))
        hist.append(res)
        fg = fg_new
        if res < 2e-7:          # f32 fixed-point wander floor
            break
        if len(hist) >= 4 and abs(hist[-1] / hist[-3] - 1.0) < 1e-3:
            break
    f_star, g_star = np.asarray(fg[0]), np.asarray(fg[1])
    rho = f_star.sum(axis=0)
    from bflbm_tpu.observables.droplet import radius_from_mass
    os.makedirs(OUT, exist_ok=True)
    np.savez(os.path.join(OUT, "profile.npz"), f=f_star, g=g_star,
             residual=res, steps=1000 * (it + 1),
             r0_mass=radius_from_mass(rho))
    print(json.dumps({"stage": "profile", "steps": 1000 * (it + 1),
                      "residual_per_step": res,
                      "rho_bg": float(rho[0, 0, 0]),
                      "rho_max": float(rho.max()),
                      "r0_mass": float(radius_from_mass(rho)),
                      "wall_s": round(time.time() - t0, 1)}))


def stage_adjoint(args):
    params = make_params()
    d = np.load(os.path.join(OUT, "profile.npz"))
    fg = (jnp.asarray(d["f"], jnp.float32), jnp.asarray(d["g"], jnp.float32))
    if args.obs == "smooth":
        rho_bg = float(np.asarray(d["f"]).sum(axis=0)[0, 0, 0])
        def obs(f):
            return com_obs_smooth(f, rho_bg)
    else:
        obs = com_obs_thresh
    print(json.dumps({"stage": "adjoint", "obs": args.obs,
                      "backend_up": True,
                      "com": [float(v) for v in np.asarray(
                          jax.jit(obs)(fg[0]))]}), flush=True)

    # 3 COM cotangents; l_g = 0 (the estimator reads the f-density only)
    Lf = jax.jacrev(obs)(fg[0])            # (3, 19, X, Y, Z)
    Lg = jnp.zeros((3,) + fg[1].shape, jnp.float32)

    # sanity: translation response of the cotangent.  The x-shift jvp
    # (central-difference direction) is ~-1 for the smooth estimator
    # (the sign is the derivative convention of the roll difference);
    # the thresholded estimator's a.e. derivative loses the boundary
    # terms and lands near -0.86 — its plateau must be normalized by
    # this response squared (stage_report does so).
    df = 0.5 * (jnp.roll(fg[0], -1, axis=1) - jnp.roll(fg[0], 1, axis=1))
    _, do = jax.jvp(obs, (fg[0],), (df,))
    trans = [float(v) for v in np.asarray(do)]

    zero_n = jnp.zeros((33,) + SHAPE, jnp.float32)
    _, vjp = jax.vjp(lambda c, n: step_explicit(c, n, params), fg, zero_n)

    @jax.jit
    def chunk(V):
        def body(carry, _):
            Vf, Vg = carry
            (dS, dN) = jax.vmap(lambda vf, vg: vjp((vf, vg)))(Vf, Vg)
            dF, dG = dS
            inc = jnp.sum(dN.reshape(3, -1) ** 2, axis=1)
            return (dF, dG), inc
        (Vf, Vg), incs = jax.lax.scan(body, V, None, length=args.chunk)
        return (Vf, Vg), incs

    V = (Lf, Lg)
    incs_all = []
    t0 = time.time()

    def save():
        np.savez(os.path.join(OUT, f"adjoint_{args.obs}.npz"),
                 incs=np.concatenate(incs_all, axis=0),
                 translation_jvp=np.asarray(trans))

    converged = False
    for it in range(args.max_chunks):
        V, incs = chunk(V)
        incs_all.append(np.asarray(incs, np.float64))
        series = np.concatenate(incs_all, axis=0)
        j = series.shape[0]
        # plateau certificate: trailing-window means move < tol
        W = max(50, args.chunk)
        flat = None
        if j >= 3 * W:
            m1 = series[-W:].mean(axis=0)
            m0 = series[-2 * W:-W].mean(axis=0)
            flat = float(np.max(np.abs(m1 / m0 - 1.0)))
        print(json.dumps({"chunk": it, "terms": j,
                          "inc_mean_lastW": [float(v) for v in
                                             series[-50:].mean(axis=0)],
                          "flatness": flat,
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)
        save()
        if flat is not None and flat < args.plateau_tol:
            converged = True
            break
    series = np.concatenate(incs_all, axis=0)
    W = max(50, args.chunk)
    D_axis = series[-W:].mean(axis=0) / 2.0
    print(json.dumps({
        "stage": "adjoint", "terms": int(series.shape[0]),
        "converged": converged,
        "translation_jvp": trans,
        "D_pred_axis": [float(v) for v in D_axis],
        "D_pred": float(D_axis.mean()),
        "wall_s": round(time.time() - t0, 1)}))


def _plateau(series, W=100):
    """Plateau estimate of the per-axis increment series: trailing-W
    mean, plus an exponential-approach fit inc_j = A - B r^j on the
    trailing 2/3 (closes the residual approach when the run stopped
    with a still-rising tail).  Returns (D_window, D_extrap) per axis."""
    j0 = series.shape[0] // 3
    tail = series[j0:]
    Dw = series[-W:].mean(axis=0) / 2.0
    Dx = []
    for a in range(series.shape[1]):
        y = tail[:, a]
        # fit the approach from the FIRST DIFFERENCES, which are A-free:
        # y_{j+1} - y_j = B (1-r) r^j, so a log-linear fit of the
        # positive diffs gives (r, B) in one shot; then
        # A = mean(y + B r^j).  Exact for an exact A - B r^j series.
        A = float(y[-W:].mean())
        dif = np.diff(y)
        ok = dif > 0
        if ok.sum() >= 10:
            j = np.arange(len(dif))[ok]
            lr = np.polyfit(j, np.log(dif[ok]), 1)
            r = float(np.exp(lr[0]))
            if 0 < r < 1:
                B = float(np.exp(lr[1])) / (1.0 - r)
                A = float((y + B * r ** np.arange(len(y))).mean())
        Dx.append(A / 2.0)
    return Dw, np.asarray(Dx)


def stage_report(args):
    from bflbm_tpu.observables import msd as msd_obs
    d = np.load(os.path.join(OUT, "adjoint_smooth.npz"))
    series = d["incs"]
    W = 100
    D_win, D_ext = _plateau(series, W)
    D_axis = D_ext
    D_pred = float(D_axis.mean())
    prof = np.load(os.path.join(OUT, "profile.npz"))
    # the same D_SE inputs acceptance E uses (eta = rho0 cs2 (tau-1/2))
    eta = 1.0 * (1.0 / 3.0) * 0.5
    out = {"D_pred_axis": [float(v) for v in D_axis],
           "D_pred_window": [float(v) for v in D_win],
           "D_pred": D_pred,
           "terms": int(series.shape[0]),
           "translation_jvp": [float(v) for v in d["translation_jvp"]],
           "r0_mass_eq": float(prof["r0_mass"]),
           "measured": []}
    # diagnostic: the thresholded (exact-measured-functional) cotangent
    # underestimates by its translation response squared — record that
    # the a^2-normalized thresholded plateau agrees with the smooth one
    p_th = os.path.join(OUT, "adjoint_thresh.npz")
    if os.path.exists(p_th):
        dth = np.load(p_th)
        a = float(np.abs(dth["translation_jvp"]).max())
        _, Dth = _plateau(dth["incs"], W)
        out["thresh_diag"] = {
            "translation_response": a,
            "D_raw": float(Dth.mean()),
            "D_normalized": float(Dth.mean() / a ** 2),
            "normalized_over_smooth": float(Dth.mean() / a ** 2 / D_pred),
        }
    d_fits = []
    for path in sorted(glob.glob(MEASURED_GLOB)):
        arr = np.load(path)
        steps_f, coms = arr[:, 0], arr[:, 2:5]
        traj = msd_obs.unwrap_periodic(coms, SHAPE)
        ts, m = msd_obs.msd(steps_f, traj, 100)
        d_fit = float(np.polyfit(ts, m, 1)[0] / 6.0)
        d_fits.append(d_fit)
        out["measured"].append(
            {"path": os.path.relpath(path, ROOT), "D_fit": d_fit})
    if d_fits:
        out["D_fit_mean"] = float(np.mean(d_fits))
        if len(d_fits) > 1:
            out["D_fit_stderr"] = float(np.std(d_fits, ddof=1)
                                        / np.sqrt(len(d_fits)))
        out["pred_over_measured"] = D_pred / out["D_fit_mean"]
        # Stokes-Einstein with the ensemble's own mean filtered radius
        rs = [float(np.load(p)[:, 1].mean())
              for p in sorted(glob.glob(MEASURED_GLOB))]
        R = float(np.mean(rs))
        out["R_mass_mean"] = R
        out["D_se"] = msd_obs.stokes_einstein(R, float(SHAPE[0]), eta, KBT)
        out["pred_over_se"] = D_pred / out["D_se"]
    with open(os.path.join(OUT, "report.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["profile", "adjoint", "report"])
    ap.add_argument("--obs", choices=["smooth", "thresh"],
                    default="smooth")
    ap.add_argument("--size", type=int, default=32,
                    help="domain edge (32 = system_unit droplet, "
                         "64 = the reference's xdg_msd_calc data set)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--profile-chunks", type=int, default=40)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--max-chunks", type=int, default=20)
    ap.add_argument("--plateau-tol", type=float, default=0.02)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    _set_size(args.size)
    if args.out:
        global OUT
        OUT = args.out
    os.makedirs(OUT, exist_ok=True)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    {"profile": stage_profile, "adjoint": stage_adjoint,
     "report": stage_report}[args.stage](args)


if __name__ == "__main__":
    main()
