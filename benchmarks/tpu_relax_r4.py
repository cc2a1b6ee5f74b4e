"""Exact-relaxation (tau = 1/2) specialization A/B (round 4c).

Every reference recipe runs tau_f = tau_g = 1/2 (lambda_bar = 1,
LBM_binary.H:74-80), where the MRT collision replaces ALL non-conserved
moments by m_eq + forcing + noise.  fused_step._k_compute now exploits
this: the forward transform shrinks to the four conserved rows
(_eof_mom_c, ~36 VPU ops/species vs 68) and the deterministic back
transform elides the identically-zero ghost rows (_eof_pops_c10, ~70 vs
114).  The boundedness decomposition (tpu_bound_r4.py) showed b2/b3 are
COMPUTE-bound (~2.3 ms exposed transform/recompute at b2), so this cuts
directly into the exposed-compute term.

This sweep re-times the production rungs at 256^3 through the
persistent session, same protocol as tpu_block_r4.py (same-session A/B:
compare against block_r4.json / u8_r4.json numbers measured on the
2026-08-19 window).

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3600 -- \
         python benchmarks/tpu_relax_r4.py
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
from bflbm_tpu.kernels import session  # noqa: E402
from bflbm_tpu.models import binary_fluid as model  # noqa: E402
from bflbm_tpu.utils.timing import fetch_scalar  # noqa: E402

t0 = time.time()
results = {}


def log(label, val):
    results[label] = val
    print(json.dumps({label: val, "t": round(time.time() - t0, 1)}),
          flush=True)


SHAPE = (256, 256, 256)
CELLS = float(np.prod(SHAPE))
N = 102   # divisible by 2 and 3 (block remainder sweeps distort b3)


def bench(label, params, **kw):
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


fluct = LBMParams(alpha0=0.0, kBT=1e-5)
determ = LBMParams(alpha0=0.0, kBT=0.0)
coupled = LBMParams(alpha0=1.1, kBT=1e-5)

# the scored rungs (tpu A/B vs block_r4.json: determ b3 1657.8,
# fluct b3 u8 1326.9, fluct b2 u8 1311.0; u8_r4.json fluct b2 clt2 1255.9)
bench("determ b3", determ, block=3)
bench("determ b2", determ, block=2)
bench("fluct b3 u8", fluct, block=3, noise_dist="u8")
bench("fluct b2 u8", fluct, block=2, noise_dist="u8")
bench("fluct b3 clt2", fluct, block=3, noise_dist="clt2")
# coupled keeps the sd=2 halo but gets the same transform cut
bench("coupled b2 clt2", coupled, block=2, noise_dist="clt2")
# freed VMEM (fewer live moment rows): retry the tiles that OOMed
bench("determ b4", determ, block=4)
bench("fluct b4 u8", fluct, block=4, noise_dist="u8")
bench("fluct b3 (32,16) u8", fluct, block=3, tile=(32, 16),
      noise_dist="u8")

out = os.path.join(os.path.dirname(__file__), "results", "relax_r4.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
