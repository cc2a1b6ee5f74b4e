"""Predict a fluctuation variance from the step's own Jacobian.

A capability BEYOND the reference: its validation compares measured
spectra against continuum theory (``surface_tension_predict.ipynb``,
``Mixture.ipynb`` cell 7's S(k) equipartition); here the stationary
variance of an observable is PREDICTED from exact linear response of
the production timestep itself — no continuum limit, no fit — and then
confirmed by (a) a fluctuating simulation and (b) the equipartition
theory value.  This is the demo-sized version of the machinery that
closed the per-mode capillary spectrum (benchmarks/capillary_model.py,
ACCEPTANCE C-model) and the droplet shape spectrum
(benchmarks/droplet_model.py, ACCEPTANCE F-model).

Method.  For the fluctuating update s' = F(s, n) (n = the 33 unit
normals per cell of ops/noise.thermal_noise) linearized at a
deterministic fixed point s*, a scalar observable o = l . (s - s*) has
stationary variance given by the adjoint Gram series

    Var(o) = sum_{j>=0} || B^T (M^T)^j l ||^2,
    M = dF/ds|_(s*,0),   B = dF/dn|_(s*,0),

evaluated matrix-free with ONE reverse-mode sweep (jax.vjp of the
step) per term.  Here s* is the uniform mixture (an exact fixed point
at alpha0=0) and o = the real part of a density Fourier mode
rho_k / sqrt(N) — so the prediction can be checked against the
equilibrium structure factor identity
Var(o) = S_rho(k)/2 = kBT * rho_f / (2 c_s^2) for the f-species
density mode (the reference's Mixture.ipynb cell-7 equipartition, our
examples/01 + ACCEPTANCE B).

Run:  python examples/10_linear_response_prediction.py [--cpu]
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_HERE, os.path.dirname(_HERE)]  # examples/ + repo root
from _common import (ensure_dir, example_argparser, pick, setup_backend,
                     show)

args = example_argparser(__doc__, "out/examples/linear_response").parse_args()
setup_backend(args)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bflbm_tpu.config import preset  # noqa: E402
from bflbm_tpu.lattice import CS2  # noqa: E402
from bflbm_tpu.models import binary_fluid as model  # noqa: E402
from bflbm_tpu.ops import collide as collide_ops  # noqa: E402
from bflbm_tpu.ops import hydro as hydro_ops  # noqa: E402
from bflbm_tpu.ops import noise as noise_ops  # noqa: E402
from bflbm_tpu.ops import stream as stream_ops  # noqa: E402

cfg = preset("mixture-fluct")
params = cfg.params
n_edge = 16 * args.scale
shape = (8 * args.scale, n_edge, n_edge)
N = float(np.prod(shape))
ensure_dir(args.out)

# the fixed point: uniform mixture (exact at alpha0=0 — no gradients,
# zero velocity, equilibrium populations are stationary)
state0 = model.init_mixture(shape, params, dtype=jnp.float32, seed=0)
fg_star = (state0.f, state0.g)
rho_f = float(jnp.sum(fg_star[0])) / N

# observable: o = Re(rho_k)/sqrt(N) for k along y (m-th mode); linear
# in f with cotangent cos(k.x)/sqrt(N) on every population of f
m_mode = 2
ky = 2.0 * np.pi * m_mode / shape[1]
yy = np.arange(shape[1])
cosk = np.broadcast_to(np.cos(ky * yy)[None, :, None], shape)
l_f = jnp.asarray(np.broadcast_to(cosk[None], (19,) + shape)
                  / np.sqrt(N), jnp.float32)
l_g = jnp.zeros_like(l_f)


def step_explicit(fg, n):
    """Production step with the 33 unit normals explicit (the same
    construction benchmarks/droplet_model.py validates against the
    production engines; noise layout = ops/noise.thermal_noise)."""
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


# ---- predict: adjoint Gram series, one vjp per term -------------------
zero_n = jnp.zeros((33,) + shape, jnp.float32)
_, vjp = jax.vjp(step_explicit, fg_star, zero_n)
vjp = jax.jit(vjp)

t0 = time.time()
V = (l_f, l_g)
var_pred = 0.0
terms = []
j = 0
while True:
    (dF, dG), dn = vjp(V)
    inc = float(jnp.sum(dn * dn))
    var_pred += inc
    terms.append(inc)
    V = (dF, dG)
    j += 1
    if (j >= 20 and inc < 1e-6 * var_pred) or j >= 5000:
        break
t_pred = time.time() - t0

# ---- measure: fluctuating trajectory from the same fixed point --------
steps_per_sample = 5
n_samples = pick(args, 4000 * args.scale, 300)
stepj = jax.jit(lambda s: model.step(s, params)[0])


@jax.jit
def advance(s):
    for _ in range(steps_per_sample):
        s = stepj(s)
    return s


cosk_j = jnp.asarray(cosk / np.sqrt(N), jnp.float32)
state = state0
# burn-in ~5 mode relaxation times so the mode thermalizes
for _ in range(pick(args, 40, 8)):
    state = advance(state)
os_ = np.empty(n_samples)
t0 = time.time()
for i in range(n_samples):
    state = advance(state)
    rho = jnp.sum(state.f, axis=0)          # f-species density
    os_[i] = float(jnp.sum(rho * cosk_j))
t_meas = time.time() - t0
var_meas = float(np.var(os_))
# crude stderr: ~independent at this spacing (tau ~ 1/(nu k^2) steps)
se_meas = var_meas * np.sqrt(2.0 / n_samples)

# ---- theory: S_rho(k) equipartition (ideal mixture, alpha0=0) ---------
var_theory = 0.5 * params.kBT * rho_f / CS2

out = {
    "shape": list(shape), "mode_m": m_mode, "rho_f": rho_f,
    "terms": j, "wall_predict_s": round(t_pred, 1),
    "wall_measure_s": round(t_meas, 1),
    "var_predicted": var_pred,
    "var_measured": var_meas, "stderr_measured": se_meas,
    "var_theory_equipartition": var_theory,
    "pred_over_theory": var_pred / var_theory,
    "meas_over_pred": var_meas / var_pred,
}
show("linear response prediction", out)
import json  # noqa: E402

with open(os.path.join(args.out, "linear_response.json"), "w") as fh:
    json.dump(out, fh, indent=1)
show("expected", {
    "pred_over_theory": "~1.00 (the step's linear response IS the "
                        "discrete equipartition at alpha0=0)",
    "meas_over_pred": "1.0 +- few % (finite sampling)"})
