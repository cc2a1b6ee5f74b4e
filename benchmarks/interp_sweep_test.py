import os, sys, time, faulthandler
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
faulthandler.dump_traceback_later(480, exit=True)
import jax
jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp, numpy as np
from jax.experimental.pallas import tpu as pltpu
from bflbm_tpu.config import LBMParams
from bflbm_tpu.models import binary_fluid as model
from bflbm_tpu.kernels import fused_step

t0=time.time()
params = LBMParams(alpha0=0.0, kBT=0.0)
state = model.init_mixture((4,16,8), params, dtype=jnp.float32)
ref = state
for _ in range(2):
    ref, _ = model.step(ref, params)
print('jnp done', time.time()-t0, flush=True)
with pltpu.force_tpu_interpret_mode():
    run = fused_step.make_nsteps(params, 2, force=True)
    got = run(state)
print('pallas interp done', time.time()-t0, flush=True)
print('diff', float(jnp.max(jnp.abs(got.f-ref.f))), flush=True)
