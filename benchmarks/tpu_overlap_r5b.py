"""Round-5b: overlap-split x-band cost — per-call marginals.

overlap_r5.json showed the split penalty is concentrated in the two
thin x-band calls (+8.6 ms/step of the +9.3 total; launches 0.16 ms,
noise nil — determ == fluct).  Two hypotheses:
  (a) per-band cost ~4.3 ms each (structural: tiny-bx call shape);
  (b) a one-off XLA defensive copy of the aliased (fo, go) assembly
      buffers attributed to the FIRST aliasing call(s).
This probes k = 0..4 bands (SPLIT_DEBUG truncation, band order x-lo,
x-hi, y-lo, y-hi) on the deterministic case: under (a) k0->k1 and
k1->k2 each add ~4.3; under (b) k0->k1 jumps ~8 and k1->k2 adds ~0.

Run: python benchmarks/tpu_retry.py --init-window 420 --timeout 3000 -- \
         python benchmarks/tpu_overlap_r5b.py
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
from bflbm_tpu.parallel import kernel as kernel_par  # noqa: E402
from bflbm_tpu.parallel import mesh as mesh_lib  # noqa: E402
from bflbm_tpu.utils.timing import fetch_scalar  # noqa: E402

SHAPE = (256, 256, 256)
CELLS = float(np.prod(SHAPE))
N = 100
t0 = time.time()
results = {}
mesh = mesh_lib.make_mesh((1, 1, 1))
DM = LBMParams(alpha0=0.0, kBT=0.0)

for k in (0, 1, 2, 3, 4):
    kernel_par.SPLIT_DEBUG = k
    label = f"determ force_k{k}"
    try:
        st = model.init_mixture(SHAPE, DM, dtype=jnp.float32)
        sess = session.ShardedSession(mesh, DM, SHAPE, overlap="force",
                                      block=2)
        pc = sess.enter(st)
        pc = sess.advance(pc, N)
        fetch_scalar(pc)
        best = 1e9
        for _ in range(3):
            tt = time.time()
            pc = sess.advance(pc, N)
            fetch_scalar(pc)
            best = min(best, time.time() - tt)
        results[label + " ms"] = round(best / N * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        results[label + " ms"] = f"FAIL: {type(e).__name__}: {e}"[:160]
    finally:
        kernel_par.SPLIT_DEBUG = None
    print(json.dumps({label: results[label + " ms"],
                      "t": round(time.time() - t0, 1)}), flush=True)

ks = [results.get(f"determ force_k{k} ms") for k in range(5)]
if all(isinstance(v, float) for v in ks):
    results["marginals_ms"] = [round(b - a, 3)
                               for a, b in zip(ks, ks[1:])]

out = os.path.join(os.path.dirname(__file__), "results",
                   "overlap_r5b.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
