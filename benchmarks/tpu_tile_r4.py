"""Round-4 tile/block sweep on the SESSION kernel rate (make_ksteps:
no jnp entry/exit in the timed region — the production path since
kernels/session.py).

Motivation (VERDICT r3 weak #2): the ext-tile x halo re-reads
(bx + 4*block)/bx of the interior per sweep.  At the current (16,16)
block=2 tile that is 1.5x in x; bx=32 cuts it to 1.25x, and the
per-slot VMEM budget arithmetic says (32, 8) FITS the existing 40 MB
budget (38ch * 40 * 24 * Z * 4 = 37.3 MB at Z=256) — the chooser just
never tries by=8 when Y%16==0.  The trade: by=8 kills the >=12-wide
hybrid-noise interior for non-final phases (all-hash fallback), so the
DMA saving races the noise-path slowdown.  Measure, don't guess.

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3000 -- \
         python benchmarks/tpu_tile_r4.py
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
        rho_std = float(jnp.std(jnp.sum(pc.f, axis=0)))
        mlups = CELLS * N / best / 1e6
        results[label] = round(mlups, 1)
        print("[%6.1fs] %-30s %7.3f ms/step  %6.0f MLUPS  (rho std %.2e)"
              % (time.time() - t0, label, best / N * 1000, mlups, rho_std),
              flush=True)
    except Exception as e:
        results[label] = "FAIL: " + str(e)[:80]
        print("[%6.1fs] %-30s FAIL %s" % (time.time() - t0, label,
                                          str(e)[:160]), flush=True)


fluct = LBMParams(alpha0=0.0, kBT=1e-5)
coup = LBMParams(alpha0=1.5, kBT=1e-5, kappa=0.1, rho_lo=0.1, rho_hi=3.0)

# scored config first (fluct clt2): baseline then candidates
bench("fluct b2 (16,16) clt2", fluct, tile=(16, 16), block=2,
      noise_dist="clt2")
bench("fluct b2 (32,8) clt2", fluct, tile=(32, 8), block=2,
      noise_dist="clt2")
bench("fluct b1 (32,8) clt2", fluct, tile=(32, 8), block=1,
      noise_dist="clt2")
bench("fluct b2 (16,8) clt2", fluct, tile=(16, 8), block=2,
      noise_dist="clt2")
bench("fluct b2 (32,16) clt2", fluct, tile=(32, 16), block=2,
      noise_dist="clt2")  # expect VMEM fail (49.8 MB/slot)
bench("fluct b3 (16,8) clt2", fluct, tile=(16, 8), block=3,
      noise_dist="clt2")
bench("fluct b1 (32,16) clt2", fluct, tile=(32, 16), block=1,
      noise_dist="clt2")
# coupled (force path, block=1 only)
bench("coup b1 (16,16) clt2", coup, tile=(16, 16), block=1,
      noise_dist="clt2")
bench("coup b1 (32,8) clt2", coup, tile=(32, 8), block=1,
      noise_dist="clt2")
# deterministic reference points
det = LBMParams(alpha0=0.0, kBT=0.0)
bench("determ b1 (16,16)", det, tile=(16, 16), block=1)
bench("determ b2 (32,8)", det, tile=(32, 8), block=2)

out = os.path.join(os.path.dirname(__file__), "results", "tile_r4.json")
with open(out, "w") as fh:
    json.dump(results, fh, indent=1)
print("wrote", out, flush=True)
