"""Round-4f: resident padded session state — sharded-path A/B.

r4e left ~0.47 ms/step on the 1-device-mesh serial sharded path vs the
single-device session (shard_r4e.json): ~0.28 of it was the
once-per-advance() pad/unpad of the ext layout (ms_layout at 100-step
chunks), the rest shard_map misc.  r4f keeps the state RESIDENT in the
padded layout across advance() calls (kernels/session.py _resident;
parallel/kernel.py make_kernel_ksteps resident/pad_x), paying the
pad once per enter() and the unpad once per exit_view().

Cases (256^3, 100-step chunks — the production observable cadence):
  single   — FusedSession (periodic kernel, no shard machinery)
  sharded  — ShardedSession on a (1,1,1) mesh (resident, the default)
  nonres   — same session with _resident forced off (the r4e path:
             pad/unpad every advance) — isolates the win

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3600 -- \
         python benchmarks/tpu_shard_r4f.py
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


def bench(label, sess_maker):
    try:
        sess, params = sess_maker()
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
        mlups = CELLS * N / best / 1e6
        results[label] = round(mlups, 1)
    except Exception as e:  # noqa: BLE001
        results[label] = f"FAIL: {type(e).__name__}: {e}"[:160]
    print(json.dumps({label: results[label],
                      "t": round(time.time() - t0, 1)}), flush=True)


def sharded(par, kw, resident=True):
    s = session.ShardedSession(mesh1, par, SHAPE, overlap=False, **kw)
    assert s._resident
    if not resident:
        s._resident = False
    return s, par


FL = LBMParams(alpha0=0.0, kBT=1e-5)
DM = LBMParams(alpha0=0.0, kBT=0.0)

CASES = [
    ("fluct_b2_u8", FL, dict(block=2, noise_dist="u8")),
    ("determ_b2", DM, dict(block=2)),
]

for name, par, kw in CASES:
    bench(f"{name} single",
          lambda par=par, kw=kw: (session.FusedSession(par, SHAPE, **kw),
                                  par))
    bench(f"{name} sharded",
          lambda par=par, kw=kw: sharded(par, kw))
    bench(f"{name} nonres",
          lambda par=par, kw=kw: sharded(par, kw, resident=False))

for name, _, _ in CASES:
    s, sh, nr = (results.get(f"{name} {k}")
                 for k in ("single", "sharded", "nonres"))
    if all(isinstance(v, float) for v in (s, sh, nr)):
        # ms/step = 1e3 * CELLS / (mlups * 1e6) = CELLS/1e3 / mlups
        ms = CELLS / 1e3
        results[f"{name} ms_resident_win"] = round(ms / nr - ms / sh, 3)
        results[f"{name} ms_vs_single"] = round(ms / sh - ms / s, 3)

out = os.path.join(os.path.dirname(__file__), "results",
                   "shard_r4f.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
