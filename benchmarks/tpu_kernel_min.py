import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.kernels import fused_step
from bflbm_tpu.utils.timing import fetch_scalar

t0=time.time()
params = LBMParams(alpha0=0.0, kBT=0.0)
state = model.init_mixture((16,16,128), params, dtype=jnp.float32)
fetch_scalar(state)
print("init done", time.time()-t0, flush=True)
# single kernel invocation, no scan
s1 = fused_step.fused_stream_collide(state, params, tile=(8,8))
v = fetch_scalar(s1)
print("kernel compiled+ran", time.time()-t0, "val", v, flush=True)
rho = np.asarray(jnp.sum(s1.f, axis=0))
print("rho mean/std:", rho.mean(), rho.std(), flush=True)
