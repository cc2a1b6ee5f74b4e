import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bflbm_tpu.lattice import M, M_INV, Q
from bflbm_tpu.utils.timing import fetch_scalar

shape=(256,256,256); X,Y,Z=shape
bx,by=8,32
grid=(X//bx, Y//by)
cells=float(np.prod(shape))
t0=time.time()

def run_case(tag, kernel_body, nsteps=10):
    f = jnp.ones((Q,)+shape, jnp.float32)
    Mj = jnp.asarray(M, jnp.float32)
    Mi = jnp.asarray(M_INV, jnp.float32)
    def kern(Mr, Mir, f_hbm, o_hbm):
        i, j = pl.program_id(0), pl.program_id(1)
        def body(buf, out, sems):
            cp = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(i*bx,bx), pl.ds(pl.multiple_of(j*by,8),by), :],
                buf, sems.at[0])
            cp.start(); cp.wait()
            kernel_body(Mr, Mir, buf, out)
            cp2 = pltpu.make_async_copy(out,
                o_hbm.at[:, pl.ds(i*bx,bx), pl.ds(pl.multiple_of(j*by,8),by), :],
                sems.at[1])
            cp2.start(); cp2.wait()
        pl.run_scoped(body,
            buf=pltpu.VMEM((Q,bx,by,Z), jnp.float32),
            out=pltpu.VMEM((Q,bx,by,Z), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((2,)))
    call = pl.pallas_call(kern, grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120*1024*1024))
    step = jax.jit(lambda x: jax.lax.fori_loop(0, nsteps, lambda k,a: call(Mj, Mi, a), x))
    try:
        y = step(f); fetch_scalar(y)
        tt=time.time(); y = step(y); fetch_scalar(y); dt=(time.time()-tt)/nsteps
        print("[%6.1fs] %-24s %.1f ms/step" % (time.time()-t0, tag, dt*1000), flush=True)
        return y
    except Exception as e:
        print("[%6.1fs] %-24s FAIL %s" % (time.time()-t0, tag, str(e)[:110]), flush=True)

# (a) mxu via reshape 2D
def mxu2d(Mr, Mir, buf, out):
    x = buf[:].reshape(Q, -1)
    m = jax.lax.dot_general(Mr[:], x, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    y = jax.lax.dot_general(Mir[:], m, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    out[:] = y.reshape(Q,bx,by,Z)
run_case("mxu reshape2d", mxu2d)

# (b) mxu on 4D rhs directly
def mxu4d(Mr, Mir, buf, out):
    x = buf[:]
    m = jax.lax.dot_general(Mr[:], x, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    y = jax.lax.dot_general(Mir[:], m, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    out[:] = y
run_case("mxu 4d", mxu4d)

# (c) stacked build + unrolled row algebra between matmuls (realistic shape)
def mxu_mixed(Mr, Mir, buf, out):
    x = buf[:].reshape(Q, -1)
    m = jax.lax.dot_general(Mr[:], x, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    rows = [m[k] * (1.0 + 0.001*k) for k in range(Q)]   # stand-in algebra
    m2 = jnp.stack(rows)
    y = jax.lax.dot_general(Mir[:], m2, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    out[:] = y.reshape(Q,bx,by,Z)
run_case("mxu + row algebra", mxu_mixed)
