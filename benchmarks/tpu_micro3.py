import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bflbm_tpu.utils.timing import fetch_scalar

Q=19
shape=(256,256,256); X,Y,Z=shape
cells=float(np.prod(shape))
GB = Q*X*Y*Z*4/1e9
t0=time.time()

def bench(tag, call, nsteps=10):
    f = jnp.ones((Q,)+shape, jnp.float32)
    step = jax.jit(lambda x: jax.lax.fori_loop(0, nsteps, lambda k,a: call(a), x))
    try:
        y = step(f); fetch_scalar(y)
        tt=time.time(); y=step(y); fetch_scalar(y); dt=(time.time()-tt)/nsteps
        print("[%6.1fs] %-30s %.2f ms -> %.0f GB/s (r+w)" % (time.time()-t0, tag, dt*1000, 2*GB/dt), flush=True)
    except Exception as e:
        print("[%6.1fs] %-30s FAIL %s" % (time.time()-t0, tag, str(e)[:100]), flush=True)

# 0) XLA copy baseline (x+1)
bench("xla elementwise copy", jax.jit(lambda a: a + 1.0))

# 1) whole-array single DMA HBM->VMEM->HBM is too big; use grid over x only,
#    big contiguous slabs (19, bx, 256, 256)
def make_slab(bx, depth):
    gx = X//bx
    def kern(f_hbm, o_hbm):
        i = pl.program_id(0)
        def body(buf, out, sin, sout):
            def inc(tt, sl):
                return pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(tt*bx, bx), :, :], buf.at[sl], sin.at[sl])
            def outc(tt, sl):
                return pltpu.make_async_copy(
                    out.at[sl], o_hbm.at[:, pl.ds(tt*bx, bx), :, :], sout.at[sl])
            sl = jax.lax.rem(i, jnp.int32(depth))
            @pl.when(i == 0)
            def _():
                for d in range(depth-1):
                    @pl.when(d < gx)
                    def _():
                        inc(d, d).start()
            @pl.when(i + depth - 1 < gx)
            def _():
                inc(i+depth-1, jax.lax.rem(i+depth-1, jnp.int32(depth))).start()
            inc(i, sl).wait()
            @pl.when(i >= depth)
            def _():
                outc(i-depth, sl).wait()
            out[sl] = buf[sl] * 1.000001
            outc(i, sl).start()
            @pl.when(i == gx-1)
            def _():
                for d in range(depth):
                    @pl.when(i - d >= 0)
                    def _():
                        outc(i-d, jax.lax.rem(i-d, jnp.int32(depth))).wait()
        pl.run_scoped(body,
            buf=pltpu.VMEM((depth, Q, bx, Y, Z), jnp.float32),
            out=pltpu.VMEM((depth, Q, bx, Y, Z), jnp.float32),
            sin=pltpu.SemaphoreType.DMA((depth,)),
            sout=pltpu.SemaphoreType.DMA((depth,)))
    return pl.pallas_call(kern, grid=(gx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q,)+shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128*1024*1024))

for bx, depth in [(2,2),(2,3),(4,2)]:
    # vmem: depth*2*19*bx*256*256*4 = depth*bx*9.96MB
    if depth*bx*2*Q*Y*Z*4 <= 110*1024*1024:
        bench(f"slab bx={bx} depth={depth} (contig)", make_slab(bx, depth))

# 2) fragmented like the real kernel: (19,bx,by,Z) tiles, depth 2
def make_tiled(bx, by, depth):
    gx, gy = X//bx, Y//by
    n = gx*gy
    def kern(f_hbm, o_hbm):
        i, j = pl.program_id(0), pl.program_id(1)
        t = i*gy + j
        def body(buf, out, sin, sout):
            def inc(tt, sl):
                ii = tt // gy; jj = tt - ii*gy
                return pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(ii*bx, bx), pl.ds(pl.multiple_of(jj*by,8), by), :],
                    buf.at[sl], sin.at[sl])
            def outc(tt, sl):
                ii = tt // gy; jj = tt - ii*gy
                return pltpu.make_async_copy(
                    out.at[sl], o_hbm.at[:, pl.ds(ii*bx, bx), pl.ds(pl.multiple_of(jj*by,8), by), :], sout.at[sl])
            sl = jax.lax.rem(t, jnp.int32(depth))
            @pl.when(t == 0)
            def _():
                for d in range(depth-1):
                    inc(d, d).start()
            @pl.when(t + depth - 1 < n)
            def _():
                inc(t+depth-1, jax.lax.rem(t+depth-1, jnp.int32(depth))).start()
            inc(t, sl).wait()
            @pl.when(t >= depth)
            def _():
                outc(t-depth, sl).wait()
            out[sl] = buf[sl] * 1.000001
            outc(t, sl).start()
            @pl.when(t == n-1)
            def _():
                for d in range(depth):
                    outc(t-d, jax.lax.rem(t-d, jnp.int32(depth))).wait()
        pl.run_scoped(body,
            buf=pltpu.VMEM((depth, Q, bx, by, Z), jnp.float32),
            out=pltpu.VMEM((depth, Q, bx, by, Z), jnp.float32),
            sin=pltpu.SemaphoreType.DMA((depth,)),
            sout=pltpu.SemaphoreType.DMA((depth,)))
    return pl.pallas_call(kern, grid=(gx,gy),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q,)+shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128*1024*1024))

for bx, by, depth in [(8,32,2),(8,32,3),(8,64,2),(16,64,2),(8,128,2)]:
    if depth*2*Q*bx*by*Z*4 <= 110*1024*1024:
        bench(f"tile ({bx},{by}) depth={depth}", make_tiled(bx,by,depth))
