"""Round-4 ICI-overlap split cost A/B (VERDICT r3 item #3).

Measures the single-chip (1-device mesh, exchanges = local wraps)
penalty of overlap='force' (interior + 4 direct-window seam-band
calls) vs overlap=False (one whole-block call) at 256^3, session rate.
r3 measured +21.4% fluctuating with cut()-sliced band inputs; the
window-origin band reads (fused_step win=) remove the slice
materialization — target <= ~8%.
Re-run post exact-relaxation (r4c): the split recompute is cheaper now.

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3000 -- \
         python benchmarks/tpu_overlap_r4c.py
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


def bench(label, params, **kw):
    try:
        st = model.init_mixture(SHAPE, params, dtype=jnp.float32)
        sess = session.ShardedSession(mesh, params, SHAPE, **kw)
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
        results[label] = f"FAIL: {type(e).__name__}: {e}"[:160]
    print(json.dumps({label: results[label],
                      "t": round(time.time() - t0, 1)}), flush=True)


FL = LBMParams(alpha0=0.0, kBT=1e-5)
DM = LBMParams(alpha0=0.0, kBT=0.0)

bench("fluct b2 clt2 serial", FL, block=2, noise_dist="clt2",
      overlap=False)
bench("fluct b2 clt2 force", FL, block=2, noise_dist="clt2",
      overlap="force")
bench("determ b2 serial", DM, block=2, overlap=False)
bench("determ b2 force", DM, block=2, overlap="force")

for k in ("fluct b2 clt2", "determ b2"):
    a, b = results.get(f"{k} serial"), results.get(f"{k} force")
    if isinstance(a, float) and isinstance(b, float):
        results[f"{k} penalty_pct"] = round(100.0 * (a / b - 1.0), 1)

out = os.path.join(os.path.dirname(__file__), "results",
                   "overlap_r4c.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
