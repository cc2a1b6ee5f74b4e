import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.kernels import fused_step
from bflbm_tpu.utils.timing import fetch_scalar
shape=(256,256,256); cells=float(np.prod(shape)); t0=time.time()
def bench(tag, params, transform):
    try:
        st = model.init_mixture(shape, params, dtype=jnp.float32)
        fetch_scalar(st)
        run = fused_step.make_nsteps(params, 10, transform=transform)
        s = run(st); fetch_scalar(s)
        tt=time.time(); s = run(s); fetch_scalar(s); dt=time.time()-tt
        rho = float(jnp.sum(s.f, axis=0).std())
        print("[%6.1fs] %-14s %-9s %.1f ms/step -> %.0f MLUPS (rho std %.2e)" % (
            time.time()-t0, tag, transform, dt/10*1000, cells*10/dt/1e6, rho), flush=True)
    except Exception as e:
        print("[%6.1fs] %-14s %-9s FAIL %s" % (time.time()-t0, tag, transform, str(e)[:90]), flush=True)
noisy = LBMParams(alpha0=0.0, kBT=1e-5)
quiet = LBMParams(alpha0=0.0, kBT=0.0)
bench("noisy", noisy, "mxu")
bench("noisy", noisy, "unrolled")
bench("quiet", quiet, "mxu")
