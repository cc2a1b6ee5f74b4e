"""Exact-relaxation follow-up: re-derive the block optima (round 4c).

relax_r4.json moved every rung: determ b3 1657.8 -> 2326.4 / b4 2362.4,
fluct u8 b2 1311.0 -> 1773.3 (now ABOVE b3 1712.9 — with the transform
cheapened, the b3 seam recompute costs more than the traffic it saves),
coupled b2 1109.3.  This sweep fills the rungs the first pass skipped so
_auto_block can be re-derived from data: fluct b2 across noise dists,
fluct b1 (DMA floor), determ b2/b3/b4 re-confirm, coupled b1 vs b2.

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3600 -- \
         python benchmarks/tpu_relax2_r4.py
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
N = 120   # divisible by 1,2,3,4


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

bench("fluct b2 clt4", fluct, block=2, noise_dist="clt4")
bench("fluct b3 clt4", fluct, block=3, noise_dist="clt4")
bench("fluct b2 clt2", fluct, block=2, noise_dist="clt2")
bench("fluct b1 u8", fluct, block=1, noise_dist="u8")
bench("fluct b2 u8 recheck", fluct, block=2, noise_dist="u8")
bench("determ b4 recheck", determ, block=4)
bench("determ b3 recheck", determ, block=3)
bench("coupled b1 clt2", coupled, block=1, noise_dist="clt2")
bench("coupled b2 u8", coupled, block=2, noise_dist="u8")

out = os.path.join(os.path.dirname(__file__), "results", "relax2_r4.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
