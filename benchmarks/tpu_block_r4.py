"""Temporal-block sweep under the sd=1 stencil depth (round 4).

The round-3 verdict on block=3 ("seam recompute eats the traffic
saving; fluct b3 VMEM OOM at 256^3") was measured with the hardwired
2*block halo depth.  The uncoupled case (every fluctuating headline
config, alpha0=0) actually consumes ONE neighbor cell per K
(fused_step._step_kernel sd), which halves every pad:

  block  px(old)  px(sd=1)  ext read/cell     phase-0 recompute area
    2      4        2       (16+4)^2->(16+2)^2  +56% -> +27%
    3      6        3       (16+12? no: 2*px)   b3 now pads like old b2
    4      8        4

so the old b2 VMEM/recompute envelope now holds b3 (b1-equivalent DMA
per step drops ~1/block: 342 -> 190 -> ~140 B/cell/step), and the
exposed-compute fraction the round-4 boundedness decomposition blamed
at b2 shrinks directly.  This sweep re-runs block in {2,3,4} for
determ + fluct(clt2, hybrid seam noise) at 256^3 through the
persistent session (the scored production path).

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3600 -- \
         python benchmarks/tpu_block_r4.py
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

for b in (2, 3, 4):
    bench(f"determ b{b}", determ, block=b)
for b in (2, 3, 4):
    bench(f"fluct b{b} clt2", fluct, block=b, noise_dist="clt2")
# wider tiles: the sd=1 ext slots are (bx+2*block) x (by+16) instead of
# (bx+4*block) — the bx=32 variants that VMEM-failed under sd=2
# (tile_r4.json) may now compile
bench("fluct b2 (32,16) u8", fluct, block=2, tile=(32, 16),
      noise_dist="u8")
bench("fluct b3 (16,16) u8", fluct, block=3, noise_dist="u8")
bench("determ b3 (32,16)", determ, block=3, tile=(32, 16))

out = os.path.join(os.path.dirname(__file__), "results", "block_r4.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
