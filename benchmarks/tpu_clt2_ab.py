"""Hardware A/B: CLT-2 byte-pair normals vs the CLT-4 default on the
scored configs (256^3, kBT=1e-5).

CLT-2 halves the PRNG bit volume and the SWAR op count per normal
(fused_step._clt2_pair) at the cost of heavier truncation (support
+-2.44 sigma, excess kurtosis -0.6 vs -0.3); first/second moments stay
exact, which is what every validated fluctuation observable consumes.
Noise generation is the dominant fluctuating-vs-deterministic cost gap
(b1: 926 vs 1231 MLUPS), so if the generator halves, the scored number
should move by O(10%).

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3000 -- \
         python benchmarks/tpu_clt2_ab.py
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
coup = LBMParams(alpha0=1.5, kBT=1e-5, kappa=0.1, rho_lo=0.1, rho_hi=3.0)

bench("fluct b1 (16,16) clt4", fluct, tile=(16, 16), block=1)
bench("fluct b1 (16,16) clt2", fluct, tile=(16, 16), block=1,
      noise_dist="clt2")
bench("fluct b2 (16,16) hybrid clt4", fluct, tile=(16, 16), block=2)
bench("fluct b2 (16,16) hybrid clt2", fluct, tile=(16, 16), block=2,
      noise_dist="clt2")
bench("coupled b1 (16,16) clt4", coup, tile=(16, 16), block=1)
bench("coupled b1 (16,16) clt2", coup, tile=(16, 16), block=1,
      noise_dist="clt2")
