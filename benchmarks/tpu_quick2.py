import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.kernels import fused_step
from bflbm_tpu.utils.timing import fetch_scalar
shape=(256,256,256); cells=float(np.prod(shape)); t0=time.time()
def bench(tag, params):
    st = model.init_mixture(shape, params, dtype=jnp.float32)
    fetch_scalar(st)
    run = fused_step.make_nsteps(params, 10)
    s = run(st); fetch_scalar(s)
    tt=time.time(); s = run(s); fetch_scalar(s); dt=time.time()-tt
    print("[%6.1fs] %-22s %.1f ms/step -> %.0f MLUPS" % (time.time()-t0, tag, dt/10*1000, cells*10/dt/1e6), flush=True)
bench("noisy a0=0", LBMParams(alpha0=0.0, kBT=1e-5))
bench("quiet a0=0", LBMParams(alpha0=0.0, kBT=0.0))
bench("noisy a0=1.5", LBMParams(alpha0=1.5, kBT=1e-5, rho_lo=0.1, rho_hi=3.0))
