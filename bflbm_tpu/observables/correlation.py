"""Correlation / time-evolution diagnostics.

Reference: ``Correlation.ipynb`` (axis line-cuts of accumulated structure
factors, e.g. S_ufbarx(kx) at ky=kz=0 and the ufbarx*nfbarx cross
spectrum) and ``VelocityEvolution.ipynb`` (time series of field means /
extrema over stored frames).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def axis_cut(sk: np.ndarray, axis: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Line cut of a 3D spectrum along one k axis with the other two at 0.

    sk must be UNshifted (k=0 at index 0).  Returns (k, S) for k > 0 up
    to the Nyquist index, k in integer frequency units.
    """
    sk = np.asarray(sk)
    n = sk.shape[axis]
    idx = [0, 0, 0]
    cuts = []
    ks = []
    for m in range(1, n // 2):
        idx[axis] = m
        cuts.append(sk[tuple(idx)])
        ks.append(m)
    return np.asarray(ks, float), np.asarray(cuts)


def time_series(frames: Sequence[Dict[str, np.ndarray]],
                field: str = "rho") -> Dict[str, np.ndarray]:
    """Per-frame mean/std/min/max of a hydro field over stored frames
    (VelocityEvolution.ipynb monitoring; Debug.H:210-228)."""
    means, stds, mins, maxs, steps = [], [], [], [], []
    for d in frames:
        a = np.asarray(d[field])
        means.append(a.mean())
        stds.append(a.std())
        mins.append(a.min())
        maxs.append(a.max())
        steps.append(int(d.get("step", len(steps))))
    return {"step": np.asarray(steps), "mean": np.asarray(means),
            "std": np.asarray(stds), "min": np.asarray(mins),
            "max": np.asarray(maxs)}


def time_mean_density(frames: Sequence[Dict[str, np.ndarray]],
                      fields=("rho", "phi")) -> Dict[str, np.ndarray]:
    """Ensemble (time) mean density fields over a frame window —
    Correlation.ipynb cell 7's mean-density builder / the equilibrium
    state estimator."""
    acc = {f: None for f in fields}
    n = 0
    for d in frames:
        for f in fields:
            a = np.asarray(d[f], np.float64)
            acc[f] = a if acc[f] is None else acc[f] + a
        n += 1
    return {f: acc[f] / max(n, 1) for f in fields}


def velocity_autocorrelation(series: np.ndarray, tmax: int) -> np.ndarray:
    """Time-origin-averaged autocorrelation C(t) = <v(0) . v(t)> of a
    (T, ...) velocity sample series (normalized to C(0) = 1)."""
    v = np.asarray(series, float).reshape(len(series), -1)
    c = np.array([
        np.mean(np.sum(v[t:] * v[:len(v) - t], axis=1))
        for t in range(min(tmax, len(v)))
    ])
    return c / c[0] if c[0] != 0 else c
