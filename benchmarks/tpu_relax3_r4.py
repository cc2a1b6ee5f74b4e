"""Post-exact-relaxation tile/block frontier sweep (round 4c).

Fills the rungs relax_r4/relax2_r4 left unmeasured: alternative tiles
at the new fluct optimum (b2 u8), deeper deterministic blocks (the
sd=1 y-pad bound allows up to b8; VMEM is the real wall), and coupled
b3 (sd=2 pads fit: 2*3 = 6 <= _PY).

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3600 -- \
         python benchmarks/tpu_relax3_r4.py
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
N = 120   # divisible by 1..6


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

bench("fluct b2 (8,16) u8", fluct, block=2, tile=(8, 16), noise_dist="u8")
bench("fluct b2 (16,8) u8", fluct, block=2, tile=(16, 8), noise_dist="u8")
bench("fluct b2 (16,32) u8", fluct, block=2, tile=(16, 32),
      noise_dist="u8")
bench("determ b5", determ, block=5)
bench("determ b6", determ, block=6)
bench("determ b4 (8,16)", determ, block=4, tile=(8, 16))
bench("coupled b3 u8", coupled, block=3, noise_dist="u8")
bench("coupled b3 clt2", coupled, block=3, noise_dist="clt2")
bench("coupled b1 u8", coupled, block=1, noise_dist="u8")

out = os.path.join(os.path.dirname(__file__), "results", "relax3_r4.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
