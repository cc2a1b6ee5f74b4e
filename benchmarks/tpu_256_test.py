import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.kernels import fused_step
from bflbm_tpu.utils.timing import fetch_scalar

t0=time.time()
params = LBMParams(alpha0=0.0, kBT=1e-5)
for shape in [(256,256,256)]:
    cells = float(np.prod(shape))
    stb = model.init_mixture(shape, params, dtype=jnp.float32)
    fetch_scalar(stb)
    print("[%5.1fs] init %s" % (time.time()-t0, shape), flush=True)
    runb = fused_step.make_nsteps(params, 10)
    sb = runb(stb); fetch_scalar(sb)
    print("[%5.1fs] compiled" % (time.time()-t0), flush=True)
    tt=time.time(); sb = runb(sb); fetch_scalar(sb); dt=time.time()-tt
    print("[%5.1fs] pallas %s: %.1f ms/step -> %.0f MLUPS" % (
        time.time()-t0, shape, dt/10*1000, cells*10/dt/1e6), flush=True)
    rho = sb.f.sum(axis=0)
    print("rho mean %.6f std %.3e" % (float(rho.mean()), float(rho.std())), flush=True)
