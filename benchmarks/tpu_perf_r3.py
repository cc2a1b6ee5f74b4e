"""Round-3 perf sweep on the SCORED config (256^3, kBT=1e-5, alpha0=0):
tile size x temporal block x noise-impl matrix, including the new
seam-only-hash ("hybrid") noise that makes blocking pay under noise.

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3000 -- \
         python benchmarks/tpu_perf_r3.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bflbm_tpu.config import LBMParams  # noqa: E402
from bflbm_tpu.kernels import fused_step  # noqa: E402
from bflbm_tpu.models import binary_fluid as model  # noqa: E402
from bflbm_tpu.utils.timing import fetch_scalar  # noqa: E402

SHAPE = (256, 256, 256)
CELLS = float(np.prod(SHAPE))
N = 50
t0 = time.time()


def bench(label, params, **kw):
    try:
        st = model.init_mixture(SHAPE, params, dtype=jnp.float32)
        fetch_scalar(st)
        run = fused_step.make_nsteps(params, N, **kw)
        s = run(st)
        fetch_scalar(s)
        best = 1e9
        for _ in range(3):
            tt = time.time()
            s = run(s)
            fetch_scalar(s)
            best = min(best, time.time() - tt)
        rho_std = float(jnp.std(jnp.sum(s.f, axis=0)))
        print("[%6.1fs] %-34s %7.2f ms/step  %6.0f MLUPS  (rho std %.2e)"
              % (time.time() - t0, label, best / N * 1000,
                 CELLS * N / best / 1e6, rho_std), flush=True)
    except Exception as e:
        print("[%6.1fs] %-34s FAIL %s" % (time.time() - t0, label,
                                          str(e)[:140]), flush=True)


fluct = LBMParams(alpha0=0.0, kBT=1e-5)

bench("b1 (8,16) hw   [r2 default]", fluct, tile=(8, 16), block=1)
bench("b1 (16,16) hw", fluct, tile=(16, 16), block=1)
bench("b1 (16,8) hw", fluct, tile=(16, 8), block=1)
bench("b1 (32,8) hw", fluct, tile=(32, 8), block=1)
bench("b2 (8,16) hw   [all-hash p0]", fluct, tile=(8, 16), block=2)
bench("b2 (16,16) hw  [HYBRID p0]", fluct, tile=(16, 16), block=2)
bench("b2 (16,16) hash", fluct, tile=(16, 16), block=2,
      noise_impl="hash")
bench("b2 (32,8) hw   [all-hash p0]", fluct, tile=(32, 8), block=2)
bench("b3 (16,16) hw  [HYBRID p0,p1]", fluct, tile=(16, 16), block=3)

coupled = LBMParams(alpha0=1.5, kBT=1e-5)
bench("coupled b1 (8,16) hw [r2 dflt]", coupled, tile=(8, 16), block=1)
bench("coupled b1 (16,16) hw", coupled, tile=(16, 16), block=1)
bench("coupled b2 (16,16) hw [HYBRID]", coupled, tile=(16, 16), block=2)

determ = LBMParams(alpha0=0.0, kBT=0.0)
bench("determ b2 (8,16) [r2 default]", determ, tile=(8, 16), block=2)
bench("determ b2 (16,16)", determ, tile=(16, 16), block=2)
bench("determ b3 (16,16)", determ, tile=(16, 16), block=3)
print("done", flush=True)
