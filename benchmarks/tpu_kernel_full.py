import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.kernels import fused_step
from bflbm_tpu.utils.timing import fetch_scalar

t0=time.time()
# 1) parity vs jnp path, kBT=0, droplet with coupling
params = LBMParams(alpha0=1.5, kBT=0.0, kappa=0.1, rho_lo=0.1, rho_hi=3.0)
state = model.init_droplet((32,32,128), params, dtype=jnp.float32, radius=0.25)
stepj = jax.jit(lambda s: model.step(s, params)[0])
ref = state
for _ in range(5):
    ref = stepj(ref)
fetch_scalar(ref)
print("[%5.1fs] jnp ref done" % (time.time()-t0), flush=True)
run = fused_step.make_nsteps(params, 5)
got = run(state)
print("[%5.1fs] parity kBT=0 max|df| %.3e max|dg| %.3e" % (
    time.time()-t0,
    float(jnp.max(jnp.abs(got.f-ref.f))), float(jnp.max(jnp.abs(got.g-ref.g)))), flush=True)

# 2) noisy stability + stats
params2 = LBMParams(alpha0=0.0, kBT=1e-5)
st2 = model.init_mixture((32,32,128), params2, dtype=jnp.float32)
run2 = fused_step.make_nsteps(params2, 50)
s2 = run2(st2)
rho = np.asarray(jnp.sum(s2.f, axis=0))
print("[%5.1fs] noisy: rho mean %.6f std %.2e (expect ~%.2e)" % (
    time.time()-t0, rho.mean(), rho.std(), (1e-5*3*0.5)**0.5), flush=True)

# 3) benchmark fused kernel vs jnp at 128^3
for shape in [(128,128,128), (256,256,256)]:
    cells = float(np.prod(shape))
    stb = model.init_mixture(shape, params2, dtype=jnp.float32)
    fetch_scalar(stb)
    runb = fused_step.make_nsteps(params2, 10)
    sb = runb(stb); fetch_scalar(sb)
    print("[%5.1fs] %s compiled" % (time.time()-t0, shape), flush=True)
    tt=time.time(); sb = runb(sb); fetch_scalar(sb); dt=time.time()-tt
    print("[%5.1fs] pallas %s: %.1f ms/step -> %.0f MLUPS" % (
        time.time()-t0, shape, dt/10*1000, cells*10/dt/1e6), flush=True)
