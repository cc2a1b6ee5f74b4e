"""Deliberately naive per-cell numpy implementation of one FLBM timestep.

Written independently of bflbm_tpu's vectorized ops (explicit loops,
moments evaluated by direct polynomial sums over the velocity set) so the
two implementations only share the published model equations — any
transcription bug in the fast path shows up as a mismatch here.  Formulas
follow LBM_binary.H (collide :451-516, hydrovars :196-295, stencils
:134-150, noise amplitudes :113-127).
"""

from __future__ import annotations

import numpy as np

C = np.array(
    [[0, 0, 0],
     [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
     [1, 1, 0], [-1, -1, 0], [1, -1, 0], [-1, 1, 0],
     [0, 1, 1], [0, -1, -1], [0, 1, -1], [0, -1, 1],
     [1, 0, 1], [-1, 0, -1], [1, 0, -1], [-1, 0, 1]], dtype=int)
W = np.array([1 / 3] + [1 / 18] * 6 + [1 / 36] * 12)
CS2 = 1.0 / 3.0


def basis_row(k, c):
    cx, cy, cz = c
    c2 = cx * cx + cy * cy + cz * cz
    table = [
        1.0, cx, cy, cz, c2 - 1, 3 * cx * cx - c2, cy * cy - cz * cz,
        cx * cy, cy * cz, cx * cz,
        (3 * c2 - 5) * cx, (3 * c2 - 5) * cy, (3 * c2 - 5) * cz,
        (cy * cy - cz * cz) * cx, (cz * cz - cx * cx) * cy,
        (cx * cx - cy * cy) * cz,
        3 * c2 * c2 - 6 * c2 + 1,
        (2 * c2 - 3) * (3 * cx * cx - c2),
        (2 * c2 - 3) * (cy * cy - cz * cz),
    ]
    return table[k]


M = np.array([[basis_row(k, C[i]) for i in range(19)] for k in range(19)])
B = np.array([sum(W[i] * M[k, i] ** 2 for i in range(19)) for k in range(19)])


def mom(fcell):
    return M @ fcell


def pop(mcell):
    return np.array([
        W[i] * sum(M[k, i] * mcell[k] / B[k] for k in range(19))
        for i in range(19)
    ])


def grad_at(field, x, y, z, shape):
    g = np.zeros(3)
    for i in range(19):
        xp = (x + C[i, 0]) % shape[0]
        yp = (y + C[i, 1]) % shape[1]
        zp = (z + C[i, 2]) % shape[2]
        g += W[i] / CS2 * field[xp, yp, zp] * C[i]
    return g


def naive_step(f, g, xi_f, xi_g, tau_f, tau_g, alpha0, eps=1.1920928955078125e-07):
    """One collide+stream given pre-drawn per-mode noise (19,X,Y,Z)."""
    shape = f.shape[1:]
    fx, gx = np.array(f, dtype=np.float64), np.array(g, dtype=np.float64)
    rho = fx.sum(axis=0)
    phi = gx.sum(axis=0)
    lam_f = 1.0 / (tau_f + 0.5)
    lam_g = 1.0 / (tau_g + 0.5)

    f_out = np.zeros_like(fx)
    g_out = np.zeros_like(gx)
    hydro = {}
    uf_all = np.zeros((3,) + shape)
    ug_all = np.zeros((3,) + shape)

    # per-cell collide
    f_post = np.zeros_like(fx)
    g_post = np.zeros_like(gx)
    for x in range(shape[0]):
        for y in range(shape[1]):
            for z in range(shape[2]):
                fc = fx[:, x, y, z]
                gc = gx[:, x, y, z]
                r, p = rho[x, y, z], phi[x, y, z]
                jf = (fc[:, None] * C).sum(axis=0)
                jg = (gc[:, None] * C).sum(axis=0)
                ufb = jf / r if abs(r) > eps else np.zeros(3)
                ugb = jg / p if abs(p) > eps else np.zeros(3)
                gphi = grad_at(phi, x, y, z, shape)
                grho = grad_at(rho, x, y, z, shape)
                af = -CS2 * alpha0 * r * gphi / r if abs(r) > eps else np.zeros(3)
                ag = -CS2 * alpha0 * p * grho / p if abs(p) > eps else np.zeros(3)
                nfv = xi_f[1:4, x, y, z] / r if abs(r) > eps else np.zeros(3)
                ngv = xi_g[1:4, x, y, z] / p if abs(p) > eps else np.zeros(3)
                rt = r + p
                du = ufb - ugb + 0.5 * (af - ag)
                uf = ufb + 0.5 * af - 0.5 * lam_f * (p / rt) * du + 0.5 * nfv
                ug = ugb + 0.5 * ag + 0.5 * lam_g * (r / rt) * du + 0.5 * ngv
                vb = (r * uf + p * ug) / rt

                mf = mom(fc)
                mg = mom(gc)

                def meq(n, u):
                    out = np.zeros(19)
                    out[0] = n
                    out[1:4] = n * u
                    u2 = u @ u
                    out[4] = n * u2
                    out[5] = n * (3 * u[0] ** 2 - u2)
                    out[6] = n * (u[1] ** 2 - u[2] ** 2)
                    out[7] = n * u[0] * u[1]
                    out[8] = n * u[1] * u[2]
                    out[9] = n * u[0] * u[2]
                    return out

                def phim(n, u, a, tau):
                    s = 1.0 / (1.0 + 1.0 / (2.0 * tau))
                    out = np.zeros(19)
                    out[1:4] = s * n * a
                    au = a @ u
                    out[4] = s * 2 * n * au
                    out[5] = s * n * (6 * a[0] * u[0] - 2 * au)
                    out[6] = s * 2 * n * (a[1] * u[1] - a[2] * u[2])
                    out[7] = s * n * (a[0] * u[1] + a[1] * u[0])
                    out[8] = s * n * (a[1] * u[2] + a[2] * u[1])
                    out[9] = s * n * (a[0] * u[2] + a[2] * u[0])
                    return out

                mf = mf + lam_f * (meq(r, vb) - mf) + phim(r, uf, af, tau_f) \
                    + xi_f[:, x, y, z]
                mg = mg + lam_g * (meq(p, vb) - mg) + phim(p, ug, ag, tau_g) \
                    + xi_g[:, x, y, z]
                f_post[:, x, y, z] = pop(mf)
                g_post[:, x, y, z] = pop(mg)
                uf_all[:, x, y, z] = uf
                ug_all[:, x, y, z] = ug

    # push streaming, exactly as the reference scatter
    for i in range(19):
        for x in range(shape[0]):
            for y in range(shape[1]):
                for z in range(shape[2]):
                    xp = (x + C[i, 0]) % shape[0]
                    yp = (y + C[i, 1]) % shape[1]
                    zp = (z + C[i, 2]) % shape[2]
                    f_out[i, xp, yp, zp] = f_post[i, x, y, z]
                    g_out[i, xp, yp, zp] = g_post[i, x, y, z]

    hydro["uf"] = uf_all
    hydro["ug"] = ug_all
    hydro["rho"] = rho
    hydro["phi"] = phi
    return f_out, g_out, hydro
