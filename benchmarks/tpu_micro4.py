import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bflbm_tpu.utils.timing import fetch_scalar

N = 19*256*256*256  # elements
GB = N*4/1e9
t0=time.time()

def bench(tag, call, nsteps=10, gb_moved=2*GB):
    f = jnp.ones((N//128, 128), jnp.float32)
    step = jax.jit(lambda x: jax.lax.fori_loop(0, nsteps, lambda k,a: call(a), x))
    try:
        y = step(f); fetch_scalar(y)
        tt=time.time(); y=step(y); fetch_scalar(y); dt=(time.time()-tt)/nsteps
        print("[%6.1fs] %-30s %.2f ms -> %.0f GB/s" % (time.time()-t0, tag, dt*1000, gb_moved/dt), flush=True)
    except Exception as e:
        print("[%6.1fs] %-30s FAIL %s" % (time.time()-t0, tag, str(e)[:100]), flush=True)

ROWS = N//128

def make_flat(chunk_rows, depth, read_only=False):
    g = ROWS//chunk_rows
    def kern(f_hbm, o_hbm):
        i = pl.program_id(0)
        def body(buf, sin, sout):
            def inc(tt, sl):
                return pltpu.make_async_copy(
                    f_hbm.at[pl.ds(tt*chunk_rows, chunk_rows), :], buf.at[sl], sin.at[sl])
            def outc(tt, sl):
                return pltpu.make_async_copy(
                    buf.at[sl], o_hbm.at[pl.ds(tt*chunk_rows, chunk_rows), :], sout.at[sl])
            sl = jax.lax.rem(i, jnp.int32(depth))
            @pl.when(i == 0)
            def _():
                for d in range(depth-1):
                    inc(d, d).start()
            @pl.when(i + depth - 1 < g)
            def _():
                inc(i+depth-1, jax.lax.rem(i+depth-1, jnp.int32(depth))).start()
            inc(i, sl).wait()
            if not read_only:
                @pl.when(i >= depth)
                def _():
                    outc(i-depth, sl).wait()
                outc(i, sl).start()
                @pl.when(i == g-1)
                def _():
                    for d in range(depth):
                        outc(i-d, jax.lax.rem(i-d, jnp.int32(depth))).wait()
        pl.run_scoped(body,
            buf=pltpu.VMEM((depth, chunk_rows, 128), jnp.float32),
            sin=pltpu.SemaphoreType.DMA((depth,)),
            sout=pltpu.SemaphoreType.DMA((depth,)))
    return pl.pallas_call(kern, grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ROWS,128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128*1024*1024))

# chunk 16MB: rows = 16MB/512B = 32768
for rows, depth in [(32768, 2), (32768, 4), (8192, 4), (65536, 2)]:
    if depth*rows*512 <= 110*1024*1024:
        bench(f"flat {rows*512//1024//1024}MB x depth {depth}", make_flat(rows, depth))
bench("flat 16MB read-only d4", make_flat(32768, 4, read_only=True), gb_moved=GB)
