import os, sys, time, functools
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
    def kern(f_hbm, o_hbm):
        i, j = pl.program_id(0), pl.program_id(1)
        def body(buf, out, sems):
            cp = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(i*bx,bx), pl.ds(pl.multiple_of(j*by,8),by), :],
                buf, sems.at[0])
            cp.start(); cp.wait()
            kernel_body(buf, out)
            cp2 = pltpu.make_async_copy(out,
                o_hbm.at[:, pl.ds(i*bx,bx), pl.ds(pl.multiple_of(j*by,8),by), :],
                sems.at[1])
            cp2.start(); cp2.wait()
        pl.run_scoped(body,
            buf=pltpu.VMEM((Q,bx,by,Z), jnp.float32),
            out=pltpu.VMEM((Q,bx,by,Z), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((2,)))
    call = pl.pallas_call(kern, grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120*1024*1024))
    step = jax.jit(lambda x: jax.lax.fori_loop(0, nsteps, lambda k,a: call(a), x))
    try:
        y = step(f); fetch_scalar(y)
        tt=time.time(); y = step(y); fetch_scalar(y); dt=(time.time()-tt)/nsteps
        print("[%6.1fs] %-22s %.1f ms/step (%.0f MLUPS-equiv)" % (time.time()-t0, tag, dt*1000, cells/dt/1e6), flush=True)
    except Exception as e:
        print("[%6.1fs] %-22s FAIL %s" % (time.time()-t0, tag, str(e)[:100]), flush=True)

# (a) pure copy
run_case("copy", lambda buf, out: out.__setitem__(slice(None), buf[:]))

# (b) unrolled moment transform + inverse
def unrolled(buf, out):
    pops = [buf[idx] for idx in range(Q)]
    m = []
    for k in range(Q):
        acc=None
        for idx in range(Q):
            c=float(M[k,idx])
            if c==0.0: continue
            t = pops[idx] if c==1.0 else (-pops[idx] if c==-1.0 else c*pops[idx])
            acc = t if acc is None else acc+t
        m.append(acc)
    for idx in range(Q):
        acc=None
        for k in range(Q):
            c=float(M_INV[idx,k])
            if c==0.0: continue
            acc = c*m[k] if acc is None else acc + c*m[k]
        out[idx] = acc
run_case("unrolled M+Minv", unrolled)

# (c) MXU transform
Mj = jnp.asarray(M, jnp.float32)
Mi = jnp.asarray(M_INV, jnp.float32)
def mxu(buf, out):
    x = buf[:].reshape(Q, -1)
    m = jax.lax.dot_general(Mj, x, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    y = jax.lax.dot_general(Mi, m, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    out[:] = y.reshape(Q,bx,by,Z)
run_case("mxu M+Minv", mxu)

# (d) noise bits only
def bits_only(buf, out):
    pltpu.prng_seed(1234, pl.program_id(0)*pl.num_programs(1)+pl.program_id(1))
    bits = pltpu.prng_random_bits((34,bx,by,Z))
    i24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u = i24.astype(jnp.float32) * (1.0/(1<<24))
    out[:] = buf[:]
    out[0] = u[0]
run_case("prng bits+convert", bits_only)

# (e) full box-muller
def bm(buf, out):
    pltpu.prng_seed(1234, pl.program_id(0)*pl.num_programs(1)+pl.program_id(1))
    bits = pltpu.prng_random_bits((34,bx,by,Z))
    i24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u = i24.astype(jnp.float32) * (1.0/(1<<24))
    r = jnp.sqrt(-2.0*jnp.log(u[:17] + 0.5/(1<<24)))
    th = 6.283185307179586*u[17:]
    n1 = r*jnp.cos(th); n2 = r*jnp.sin(th)
    out[:] = buf[:]
    out[0] = n1[0]; out[1] = n2[0]
run_case("box-muller 34 normals", bm)

# (f) streamed stack (shifted slices from ext buffer)
from bflbm_tpu.lattice import C as Cl
def kern_stream(f_hbm, o_hbm):
    i, j = pl.program_id(0), pl.program_id(1)
    px,py=2,8
    def body(buf, out, sems):
        xs=((i*bx-px)%X, i*bx, (i*bx+bx)%X); yss=((j*by-py)%Y, j*by, (j*by+by)%Y)
        yss=tuple(pl.multiple_of(y,8) for y in yss)
        cps=[]
        dx=0
        for a,xsz in enumerate((px,bx,px)):
            dy=0
            for b,ysz in enumerate((py,by,py)):
                cp=pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(xs[a],xsz), pl.ds(yss[b],ysz), :],
                    buf.at[:, pl.ds(dx,xsz), pl.ds(dy,ysz), :], sems.at[len(cps)])
                cp.start(); cps.append(cp); dy+=ysz
            dx+=xsz
        for cp in cps: cp.wait()
        for idx in range(Q):
            cx,cy,cz=int(Cl[idx,0]),int(Cl[idx,1]),int(Cl[idx,2])
            sl = buf[idx, px-cx:px-cx+bx, py-cy:py-cy+by, :]
            if cz: sl = pltpu.roll(sl, cz % Z, 2)
            out[idx] = sl
        cp2 = pltpu.make_async_copy(out, o_hbm.at[:, pl.ds(i*bx,bx), pl.ds(pl.multiple_of(j*by,8),by), :], sems.at[0])
        cp2.start(); cp2.wait()
    pl.run_scoped(body,
        buf=pltpu.VMEM((Q,bx+2*px,by+2*py,Z), jnp.float32),
        out=pltpu.VMEM((Q,bx,by,Z), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((9,)))
f = jnp.ones((Q,)+shape, jnp.float32)
call = pl.pallas_call(kern_stream, grid=grid,
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120*1024*1024))
step = jax.jit(lambda x: jax.lax.fori_loop(0, 10, lambda k,a: call(a), x))
try:
    y=step(f); fetch_scalar(y)
    tt=time.time(); y=step(y); fetch_scalar(y); dt=(time.time()-tt)/10
    print("[%6.1fs] %-22s %.1f ms/step" % (time.time()-t0, "halo-load + stream", dt*1000), flush=True)
except Exception as e:
    print("[%6.1fs] stream FAIL %s" % (time.time()-t0, str(e)[:100]), flush=True)
