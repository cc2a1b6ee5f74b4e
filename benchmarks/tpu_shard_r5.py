"""Round-5: separate-strip y exchange — single-chip A/B.

VERDICT r4 #2: y-sharded (2-D) meshes paid ~0.92 ms/step of strided
slice/DUS y-halo ops (r4d path).  Round 5 replaces them with
kernel-written edge strips (fused_step ystrips + parallel/kernel
_strip_exchange): the kernel writes its interior edge rows into compact
strip buffers during the overlapped out-DMA phase, the sweep ppermutes
the strips whole, and the next kernel call reads them as separate
operands — no strided y ops at all.

On one chip we cannot run a real y-sharded mesh, but y_exchange="strips"
on a 1-device mesh degenerates the 1-rank ppermute to the periodic
self-wrap, running the EXACT strips call structure (strip out-DMAs,
strip operands, strip x-exchange) against the same physics as wrap_y —
bitwise-tested in test_kernel_ystrips_forced_matches_wrap_y_bitwise.
Cases (256^3, 100-step chunks, resident sharded sessions):

  wrap   — y_exchange auto -> wrap_y (the r4e optimum, baseline)
  strips — y_exchange strips (what a y-sharded mesh now runs)
  dus    — y_exchange dus (the r4d path a y-sharded mesh used to run)

The y-sharded projection is then: strips-rate vs dus-rate at identical
kernel work (the ppermute itself is free on 1 rank in both).

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3600 -- \
         python benchmarks/tpu_shard_r5.py
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
mesh1 = mesh_lib.make_mesh((1, 1, 1))


def bench(label, params, kw):
    try:
        sess = session.ShardedSession(mesh1, params, SHAPE,
                                      overlap=False, **kw)
        st = model.init_mixture(SHAPE, params, dtype=jnp.float32)
        pc = sess.enter(st)
        pc = sess.advance(pc, N)  # compile + warmup
        fetch_scalar(pc)
        best = 1e9
        for _ in range(3):
            tt = time.time()
            pc = sess.advance(pc, N)
            fetch_scalar(pc)
            best = min(best, time.time() - tt)
        results[label] = round(CELLS * N / best / 1e6, 1)
    except Exception as e:  # noqa: BLE001
        results[label] = f"FAIL: {type(e).__name__}: {e}"[:160]
    print(json.dumps({label: results[label],
                      "t": round(time.time() - t0, 1)}), flush=True)


FL = LBMParams(alpha0=0.0, kBT=1e-5)
DM = LBMParams(alpha0=0.0, kBT=0.0)

CASES = [
    ("fluct_b2_u8", FL, dict(block=2, noise_dist="u8")),
    ("determ_b2", DM, dict(block=2)),
]

for name, par, kw in CASES:
    for yx in ("auto", "strips", "dus"):
        lab = {"auto": "wrap", "strips": "strips", "dus": "dus"}[yx]
        bench(f"{name} {lab}", par, dict(kw, y_exchange=yx))

for name, _, _ in CASES:
    w, s, d = (results.get(f"{name} {k}")
               for k in ("wrap", "strips", "dus"))
    if all(isinstance(v, float) for v in (w, s, d)):
        # ms/step = 1e3 * CELLS / (mlups * 1e6) = CELLS/1e3 / mlups
        ms = CELLS / 1e3
        results[f"{name} ms_strips_vs_wrap"] = round(ms / s - ms / w, 3)
        results[f"{name} ms_strips_win_vs_dus"] = round(ms / d - ms / s, 3)

out = os.path.join(os.path.dirname(__file__), "results",
                   "shard_r5.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
