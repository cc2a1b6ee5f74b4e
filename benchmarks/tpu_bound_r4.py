"""Round-4 boundedness decomposition of the fused kernel at 256^3.

Motivation: VERDICT r3 item #2 assumes the fluctuating blocked kernel
sits at a ~233 GB/s Pallas DMA ceiling, making over-read bytes the
throughput lever.  Today's tile_r4 sweep contradicts that premise:
determ b1 (16,16) at 1004.5 MLUPS moves (1.25+1)*152 = 342 B/cell/step
= 343 GB/s, and fluct b1 (32,8) 1036.8 moves 335 GB/s — the kernel's
pipelined access pattern achieves ~340+ GB/s on today's window (the
probe's 233 GB/s measures unpipelined single-descriptor streams).  The
scored fluct b2 (16,16) at 1209.9 moves only 190 B/cell/step =
230 GB/s, far below what the DMA engines deliver — so at block=2 the
kernel should be COMPUTE-bound, and the lever is noise + transform +
seam-recompute work, not bytes.

This script fills in the missing cells to pin that decomposition on
ONE window (all rates via the session-resident make_ksteps path):

  determ b2 (16,16)      — b2 compute floor (no noise): the gap to
                           determ b1's DMA rate isolates recompute +
                           per-phase overhead
  fluct  b1 (16,16) clt2 — all-HW single-phase noise under b1 DMA
  fluct  b2 (16,16) clt2 hash-all — hybrid seam split vs all-hash delta
  fluct  b2 (16,16) clt4 — the clt2 generator saving on this window

Plus VERDICT item #9: re-sample noise_variance hash/clt2 with 8x the
cells (64x64x256 vs 32x32x128) + 2 steps: the 1.08% committed worst
dev is at the resolution of a 131k-sample variance estimate
(sigma ~ sqrt((2+kappa_ex)/N) ~ 0.33%/mode, max over 36 modes ~ 0.7-1%);
1M samples puts the bar at ~0.3%.

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3000 -- \
         python benchmarks/tpu_bound_r4.py
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

SHAPE = (256, 256, 256)
CELLS = float(np.prod(SHAPE))
N = 100
t0 = time.time()
results = {}


def bench(label, params, **kw):
    try:
        st = model.init_mixture(SHAPE, params, dtype=jnp.float32)
        sess = session.FusedSession(params, SHAPE, **kw)
        pc = sess.enter(st)
        pc = sess.advance(pc, N)  # compile + warmup
        fetch_scalar(pc)
        best = 1e9
        for _ in range(3):
            tt = time.time()
            pc = sess.advance(pc, N)
            fetch_scalar(pc)
            best = min(best, time.time() - tt)
        mlups = CELLS * N / best / 1e6
        results[label] = round(mlups, 1)
    except Exception as e:  # noqa: BLE001
        results[label] = f"FAIL: {type(e).__name__}: {e}"[:120]
    print(json.dumps({label: results[label],
                      "t": round(time.time() - t0, 1)}), flush=True)


FL = LBMParams(alpha0=0.0, kBT=1e-5)
DM = LBMParams(alpha0=0.0, kBT=0.0)

bench("determ b2 (16,16)", DM, tile=(16, 16), block=2)
bench("fluct b1 (16,16) clt2", FL, tile=(16, 16), block=1,
      noise_dist="clt2")
bench("fluct b2 (16,16) clt2 hash-all", FL, tile=(16, 16), block=2,
      noise_dist="clt2", noise_impl="hash")
bench("fluct b2 (16,16) clt4", FL, tile=(16, 16), block=2)
bench("fluct b2 (16,16) clt2", FL, tile=(16, 16), block=2,
      noise_dist="clt2")


# ------------------------- noise variance re-sample (VERDICT #9) ----
def noise_variance(noise_impl, noise_dist, shape=(64, 64, 256),
                   steps=2):
    """Per-mode injected variance vs FDT over steps x |shape| samples.

    From a uniform rest state every K-step injects exactly xi per cell
    (tpu_verify.noise_statistics rationale); accumulating dm over a few
    independent steps multiplies the sample count without a bigger
    footprint."""
    rho0, phi0 = 1.0, 1.0
    params = LBMParams(alpha0=0.0, kBT=1e-5)
    state = model.init_mixture(shape, params, dtype=jnp.float32)
    mm = np.asarray(M, np.float64)
    lam = params.lam_f
    pref = 2.0 * (lam - 0.5 * lam * lam) * params.kBT
    var_f = np.zeros((Q,))
    var_g = np.zeros((Q,))
    nsamp = 0
    f_in = np.asarray(state.f, np.float64)
    g_in = np.asarray(state.g, np.float64)
    for s in range(steps):
        seed = jnp.array([987654321 + 7919 * s, 3 + s], jnp.int32)
        fo, go = fused_step._fused_step_call(
            params, shape, (16, 16), True, seed, state.f, state.g,
            block=1, noise_impl=noise_impl, noise_dist=noise_dist)
        fetch_scalar(fo)
        dmf = np.einsum("ki,ixyz->kxyz", mm,
                        np.asarray(fo, np.float64) - f_in)
        dmg = np.einsum("ki,ixyz->kxyz", mm,
                        np.asarray(go, np.float64) - g_in)
        var_f += dmf.reshape(Q, -1).var(axis=1)
        var_g += dmg.reshape(Q, -1).var(axis=1)
        nsamp += dmf[0].size
    var_f /= steps
    var_g /= steps
    worst = 0.0
    for a in range(1, Q):
        if a < 4:
            var_th = pref * rho0 * phi0 / (rho0 + phi0)
        else:
            var_th = pref / CS2 * float(B[a]) * rho0
        worst = max(worst, abs(var_f[a] / var_th - 1),
                    abs(var_g[a] / var_th - 1))
    label = f"noise_variance_{noise_impl}_{noise_dist}_resampled"
    results[label] = {"worst_dev": round(worst, 5), "samples": nsamp}
    print(json.dumps({label: results[label]}), flush=True)


noise_variance("hash", "clt2")
noise_variance("hash", "clt4")

out = os.path.join(os.path.dirname(__file__), "results", "bound_r4.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
