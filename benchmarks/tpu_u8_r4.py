"""u8 noise generator (Ladd-style variance-matched uniform deviates):
hardware validation + throughput A/B at 256^3 (round 4).

Checks, in order:
  1. per-mode injected-variance vs FDT for hw/u8 and hash/u8 at 2.1M
     samples (the tpu_bound_r4 re-sample harness; bar 1%)
  2. session-rate throughput of fluct b2 u8 vs clt2 on this window

The full equilibrium S(k) acceptance through the production stream is
the established procedure, run separately:
    python benchmarks/acceptance.py b-kernel --noise-dist u8 \
        --out out/acceptance_u8
(the same second-moment observable the clt2 rung was accepted on —
ACCEPTANCE.md B-kernel-clt2.)

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3600 -- \
         python benchmarks/tpu_u8_r4.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bflbm_tpu.config import LBMParams  # noqa: E402
from bflbm_tpu.kernels import fused_step, session  # noqa: E402
from bflbm_tpu.lattice import B, CS2, M, Q  # noqa: E402
from bflbm_tpu.models import binary_fluid as model  # noqa: E402
from bflbm_tpu.utils.timing import fetch_scalar  # noqa: E402

t0 = time.time()
results = {}


def log(label, val):
    results[label] = val
    print(json.dumps({label: val, "t": round(time.time() - t0, 1)}),
          flush=True)


# ------------------------- 1. per-mode variance ---------------------
def noise_variance(noise_impl, shape=(64, 64, 256), steps=2):
    rho0, phi0 = 1.0, 1.0
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    mm = np.asarray(M, np.float64)
    lam = params.lam_f
    pref = 2.0 * (lam - 0.5 * lam * lam) * params.kBT
    var_f = np.zeros((Q,))
    var_g = np.zeros((Q,))
    f_in = np.asarray(state.f, np.float64)
    g_in = np.asarray(state.g, np.float64)
    for s in range(steps):
        seed = jnp.array([987654321 + 7919 * s, 3 + s], jnp.int32)
        fo, go = fused_step._fused_step_call(
            params, shape, (16, 16), True, seed, state.f, state.g,
            block=1, noise_impl=noise_impl, noise_dist="u8")
        fetch_scalar(fo)
        var_f += np.einsum("ki,ixyz->kxyz", mm,
                           np.asarray(fo, np.float64) - f_in
                           ).reshape(Q, -1).var(axis=1)
        var_g += np.einsum("ki,ixyz->kxyz", mm,
                           np.asarray(go, np.float64) - g_in
                           ).reshape(Q, -1).var(axis=1)
    var_f /= steps
    var_g /= steps
    worst = 0.0
    for a in range(1, Q):
        var_th = (pref * rho0 * phi0 / (rho0 + phi0) if a < 4
                  else pref / CS2 * float(B[a]) * rho0)
        worst = max(worst, abs(var_f[a] / var_th - 1),
                    abs(var_g[a] / var_th - 1))
    log(f"noise_variance_{noise_impl}_u8", round(worst, 5))
    return worst


w1 = noise_variance("hw")
w2 = noise_variance("hash")
params = LBMParams(alpha0=0.0, kBT=1e-5)

# --------------------------- 2. throughput --------------------------
SHAPE = (256, 256, 256)
CELLS = float(np.prod(SHAPE))
N = 100


def bench(label, **kw):
    try:
        stt = model.init_mixture(SHAPE, params, dtype=jnp.float32)
        ss = session.FusedSession(params, SHAPE, **kw)
        p = ss.enter(stt)
        p = ss.advance(p, N)
        fetch_scalar(p)
        best = 1e9
        for _ in range(3):
            tt = time.time()
            p = ss.advance(p, N)
            fetch_scalar(p)
            best = min(best, time.time() - tt)
        log(label, round(CELLS * N / best / 1e6, 1))
    except Exception as e:  # noqa: BLE001
        log(label, f"FAIL: {type(e).__name__}: {e}"[:160])


bench("fluct b2 (16,16) u8", tile=(16, 16), block=2, noise_dist="u8")
bench("fluct b2 (16,16) clt2 recheck", tile=(16, 16), block=2,
      noise_dist="clt2")

out = os.path.join(os.path.dirname(__file__), "results", "u8_r4.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
