import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bflbm_tpu.utils.timing import fetch_scalar

N = 19*256*256*256
GB = N*4/1e9
ROWS = N//128
t0=time.time()

def bench(tag, call, nsteps=10, gb_moved=2*GB):
    f = jnp.ones((ROWS, 128), jnp.float32)
    step = jax.jit(lambda x: jax.lax.fori_loop(0, nsteps, lambda k,a: call(a), x))
    try:
        y = step(f); fetch_scalar(y)
        tt=time.time(); y=step(y); fetch_scalar(y); dt=(time.time()-tt)/nsteps
        print("[%6.1fs] %-34s %.2f ms -> %.0f GB/s" % (time.time()-t0, tag, dt*1000, gb_moved/dt), flush=True)
    except Exception as e:
        print("[%6.1fs] %-34s FAIL %s" % (time.time()-t0, tag, str(e)[:100]), flush=True)

def make_flat_prio(chunk_rows, depth, nprio):
    g = ROWS//chunk_rows
    half = chunk_rows//nprio
    def kern(f_hbm, o_hbm):
        i = pl.program_id(0)
        def body(buf, sin, sout):
            def incs(tt, sl):
                return [pltpu.make_async_copy(
                    f_hbm.at[pl.ds(tt*chunk_rows + q*half, half), :],
                    buf.at[sl, pl.ds(q*half, half), :], sin.at[sl, q])
                    for q in range(nprio)]
            def outcs(tt, sl):
                return [pltpu.make_async_copy(
                    buf.at[sl, pl.ds(q*half, half), :],
                    o_hbm.at[pl.ds(tt*chunk_rows + q*half, half), :], sout.at[sl, q])
                    for q in range(nprio)]
            sl = jax.lax.rem(i, jnp.int32(depth))
            @pl.when(i == 0)
            def _():
                for d in range(depth-1):
                    for q, cp in enumerate(incs(d, d)):
                        cp.start(priority=q % 2)
            @pl.when(i + depth - 1 < g)
            def _():
                for q, cp in enumerate(incs(i+depth-1, jax.lax.rem(i+depth-1, jnp.int32(depth)))):
                    cp.start(priority=q % 2)
            for cp in incs(i, sl):
                cp.wait()
            @pl.when(i >= depth)
            def _():
                for cp in outcs(i-depth, sl):
                    cp.wait()
            for q, cp in enumerate(outcs(i, sl)):
                cp.start(priority=q % 2)
            @pl.when(i == g-1)
            def _():
                for d in range(depth):
                    @pl.when(i - d >= 0)
                    def _():
                        for cp in outcs(i-d, jax.lax.rem(i-d, jnp.int32(depth))):
                            cp.wait()
        pl.run_scoped(body,
            buf=pltpu.VMEM((depth, chunk_rows, 128), jnp.float32),
            sin=pltpu.SemaphoreType.DMA((depth, nprio)),
            sout=pltpu.SemaphoreType.DMA((depth, nprio)))
    return pl.pallas_call(kern, grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ROWS,128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128*1024*1024))

bench("flat 16MB d2 1-stream", make_flat_prio(32768, 2, 1))
bench("flat 16MB d2 2-prio", make_flat_prio(32768, 2, 2))
bench("flat 16MB d2 4-split-2prio", make_flat_prio(32768, 2, 4))
bench("flat 16MB d4 2-prio", make_flat_prio(32768, 4, 2))
