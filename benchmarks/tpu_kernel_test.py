import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, jax, jax.numpy as jnp, numpy as np
from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.kernels import fused_step
from bflbm_tpu.utils.timing import fetch_scalar

params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1, rho_lo=0.1, rho_hi=3.0)
state = model.init_droplet((32,32,128), params, dtype=jnp.float32, radius=0.25)
ref = state
stepj = jax.jit(lambda s: model.step(s, params)[0])
for _ in range(5):
    ref = stepj(ref)
fetch_scalar(ref)
print("jnp ref done", flush=True)
run = fused_step.make_nsteps(params, 5)
got = run(state)
df = float(jnp.max(jnp.abs(got.f - ref.f)))
dg = float(jnp.max(jnp.abs(got.g - ref.g)))
print("TPU parity kBT=0 max|df|:", df, "max|dg|:", dg, flush=True)

params2 = LBMParams(alpha0=0.0, kBT=1e-5)
st2 = model.init_mixture((32,32,128), params2, dtype=jnp.float32)
run2 = fused_step.make_nsteps(params2, 50)
s2 = run2(st2)
rho = np.asarray(jnp.sum(s2.f, axis=0))
print("noisy: rho mean", rho.mean(), "std", rho.std(), "expect", (1e-5*3*0.5)**0.5, flush=True)
