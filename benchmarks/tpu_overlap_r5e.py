"""Round-5e: overlap split on the PADDED CARRY — zero-copy band windows.

The r4 split materialized full exchanged ext blocks (exchange_halo
concat), ~2.8 GB/sweep of pure HBM copy = ~90% of the split penalty
(overlap_r5b.json).  Bands now read band-sized ext inputs built from
thin slices + ppermuted strips and write compact outputs assembled
in place (parallel/kernel.py round-5 local_sweep).  Cases (256^3, b2,
u8, 100-step chunks, session rate):

  serial — overlap=False baseline (the production auto choice)
  force  — the compact-input split (VERDICT r4 #3 target: <= ~15%)

Run: python benchmarks/tpu_retry.py --init-window 420 --timeout 3000 -- \
         python benchmarks/tpu_overlap_r5e.py
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
from bflbm_tpu.parallel import mesh as mesh_lib  # noqa: E402
from bflbm_tpu.utils.timing import fetch_scalar  # noqa: E402

SHAPE = (256, 256, 256)
CELLS = float(np.prod(SHAPE))
N = 100
t0 = time.time()
results = {}
mesh = mesh_lib.make_mesh((1, 1, 1))


def bench(label, params, overlap):
    try:
        st = model.init_mixture(SHAPE, params, dtype=jnp.float32)
        sess = session.ShardedSession(mesh, params, SHAPE,
                                      overlap=overlap, block=2,
                                      noise_dist="u8")
        pc = sess.enter(st)
        pc = sess.advance(pc, N)
        fetch_scalar(pc)
        best = 1e9
        for _ in range(3):
            tt = time.time()
            pc = sess.advance(pc, N)
            fetch_scalar(pc)
            best = min(best, time.time() - tt)
        results[label] = round(CELLS * N / best / 1e6, 1)
        results[label + " ms"] = round(best / N * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        results[label] = f"FAIL: {type(e).__name__}: {e}"[:160]
    print(json.dumps({label: results[label],
                      "t": round(time.time() - t0, 1)}), flush=True)


FL = LBMParams(alpha0=0.0, kBT=1e-5)
DM = LBMParams(alpha0=0.0, kBT=0.0)

for pname, par in (("fluct", FL), ("determ", DM)):
    bench(f"{pname} serial", par, False)
    bench(f"{pname} force", par, "force")
    s = results.get(f"{pname} serial ms")
    d = results.get(f"{pname} force ms")
    if isinstance(s, float) and isinstance(d, float):
        results[f"{pname} penalty_pct"] = round(100 * (d / s - 1), 1)

out = os.path.join(os.path.dirname(__file__), "results",
                   "overlap_r5e.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
