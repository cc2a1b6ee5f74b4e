"""Round-4e sharded-path residual decomposition (ROADMAP r5 #1).

The padded-carry exchange (r4d) left ~1.3 ms/step on the 1-device-mesh
serial sharded path vs the single-device session (overlap_r4c.json:
fluct b2 clt2 1393.5 vs 1720.2, determ 1455.8 vs ~1803).  This bench
isolates the residual on one window, after the r4e cut (no per-sweep
zero refill of the unconsumed _PY-alignment pad rows):

  single    — FusedSession (periodic kernel, no shard machinery)
  sharded   — ShardedSession on a (1,1,1) mesh (padded carry + strip
              ppermute/DUS exchange; ppermute degenerates to identity)
  noexch    — same, with _pad_exchange_{x,y} monkeypatched to identity:
              the pure cost of the padded layout + shard_map wrapping
              (trajectory wrong, timing valid — identical op graph
              minus the exchange slices/DUS)

  sharded - noexch   = exchange cost (slices + ppermute + DUS)
  noexch  - single   = layout/shard_map overhead

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3600 -- \
         python benchmarks/tpu_shard_r4e.py
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


FL = LBMParams(alpha0=0.0, kBT=1e-5)
DM = LBMParams(alpha0=0.0, kBT=0.0)

CASES = [
    ("fluct_b2_clt2", FL, dict(block=2, noise_dist="clt2")),
    ("determ_b2", DM, dict(block=2)),
]

for name, par, kw in CASES:
    bench(f"{name} single",
          lambda par=par, kw=kw: (
              session.FusedSession(par, SHAPE, **kw), par))
    bench(f"{name} sharded",
          lambda par=par, kw=kw: (
              session.ShardedSession(mesh1, par, SHAPE, overlap=False,
                                     **kw), par))

# --- identity-exchange variants (timing decomposition only) ----------
_real_x, _real_y = kernel_par._pad_exchange_x, kernel_par._pad_exchange_y
_id_x = lambda a, pad, ship, n_int, y0, n_y: a  # noqa: E731
_id_y = lambda a, py, ship, n_int, fill_zeros=True: a  # noqa: E731
for tag, fx, fy in (("noexch", _id_x, _id_y), ("nox", _id_x, _real_y),
                    ("noy", _real_x, _id_y)):
    kernel_par._pad_exchange_x, kernel_par._pad_exchange_y = fx, fy
    try:
        for name, par, kw in CASES:
            bench(f"{name} {tag}",
                  lambda par=par, kw=kw: (
                      session.ShardedSession(mesh1, par, SHAPE,
                                             overlap=False, **kw), par))
    finally:
        kernel_par._pad_exchange_x = _real_x
        kernel_par._pad_exchange_y = _real_y

for name, _, _ in CASES:
    s, sh, ne = (results.get(f"{name} {k}")
                 for k in ("single", "sharded", "noexch"))
    if all(isinstance(v, float) for v in (s, sh, ne)):
        # ms/step = 1e3 * CELLS / (mlups * 1e6) = CELLS/1e3 / mlups
        ms = CELLS / 1e3
        results[f"{name} ms_exchange"] = round(ms / sh - ms / ne, 3)
        results[f"{name} ms_layout"] = round(ms / ne - ms / s, 3)

out = os.path.join(os.path.dirname(__file__), "results",
                   "shard_r4e.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
