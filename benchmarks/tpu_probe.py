#!/usr/bin/env python
"""Parameterized TPU platform probe — consolidates the one-off
tpu_micro*/tpu_quick* scripts used to establish the platform ceilings
quoted in CLAUDE.md (Pallas DMA ~233 GB/s aggregate, XLA copy
~358 GB/s on the tunneled v5e).

Usage: python benchmarks/tpu_probe.py [copy dma transform kernel]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bflbm_tpu.lattice import M, M_INV, Q
from bflbm_tpu.utils.timing import fetch_scalar

SHAPE = (256, 256, 256)
X, Y, Z = SHAPE
CELLS = float(np.prod(SHAPE))
T0 = time.time()


def _report(tag, dt, nbytes):
    print("[%6.1fs] %-24s %7.2f ms   %6.1f GB/s" %
          (time.time() - T0, tag, dt * 1e3, nbytes / dt / 1e9), flush=True)


def _time(fn, x, reps=5):
    y = fn(x)
    fetch_scalar(y)
    tt = time.time()
    for _ in range(reps):
        y = fn(y)
        fetch_scalar(y)
    return (time.time() - tt) / reps


def probe_copy():
    """XLA elementwise roundtrip: the non-Pallas HBM bandwidth ceiling."""
    f = jnp.ones((Q,) + SHAPE, jnp.float32)
    fn = jax.jit(lambda x: x + 1.0, donate_argnums=0)
    dt = _time(fn, f)
    _report("xla copy (x+1)", dt, 2 * f.nbytes)


def _pallas_roundtrip(bx, by):
    def kern(f_hbm, o_hbm):
        i, j = pl.program_id(0), pl.program_id(1)

        def body(buf, sems):
            cp = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(i * bx, bx),
                         pl.ds(pl.multiple_of(j * by, 8), by), :],
                buf, sems.at[0])
            cp.start()
            cp.wait()
            cp2 = pltpu.make_async_copy(
                buf,
                o_hbm.at[:, pl.ds(i * bx, bx),
                         pl.ds(pl.multiple_of(j * by, 8), by), :],
                sems.at[1])
            cp2.start()
            cp2.wait()

        pl.run_scoped(body, buf=pltpu.VMEM((Q, bx, by, Z), jnp.float32),
                      sems=pltpu.SemaphoreType.DMA((2,)))

    return pl.pallas_call(
        kern, grid=(X // bx, Y // by),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q,) + SHAPE, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024))


def probe_dma():
    """Pallas DMA HBM->VMEM->HBM roundtrip at several descriptor shapes
    (the aggregate rate saturates ~233 GB/s regardless — the platform's
    single-queue Pallas DMA ceiling)."""
    f = jnp.ones((Q,) + SHAPE, jnp.float32)
    for bx, by in ((8, 32), (16, 64), (4, 128)):
        call = _pallas_roundtrip(bx, by)
        dt = _time(call, f)
        _report(f"pallas dma ({bx},{by})", dt, 2 * f.nbytes)


def probe_transform():
    """In-kernel 19x19 moment transform + inverse: unrolled VPU adds vs
    MXU dot_general (historically equal while DMA-bound)."""
    bx, by = 8, 32
    f = jnp.ones((Q,) + SHAPE, jnp.float32)

    def make(transform):
        mmat = jnp.asarray(M, jnp.float32)
        minv = jnp.asarray(M_INV, jnp.float32)

        def kern(mm, mi, f_hbm, o_hbm):
            i, j = pl.program_id(0), pl.program_id(1)

            def body(buf, out, sems):
                cp = pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(i * bx, bx),
                             pl.ds(pl.multiple_of(j * by, 8), by), :],
                    buf, sems.at[0])
                cp.start()
                cp.wait()
                pops = [buf[q] for q in range(Q)]
                if transform == "mxu":
                    xs = jnp.stack(pops)
                    m4 = jax.lax.dot_general(
                        mm[:], xs, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
                    r = jax.lax.dot_general(
                        mi[:], m4, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
                    for q in range(Q):
                        out[q] = r[q]
                else:
                    ms = []
                    for k in range(Q):
                        acc = None
                        for q in range(Q):
                            c = float(M[k, q])
                            if c == 0.0:
                                continue
                            t = pops[q] if c == 1.0 else (
                                -pops[q] if c == -1.0 else c * pops[q])
                            acc = t if acc is None else acc + t
                        ms.append(acc)
                    for q in range(Q):
                        acc = None
                        for k in range(Q):
                            c = float(M_INV[q, k])
                            if c == 0.0:
                                continue
                            t = c * ms[k]
                            acc = t if acc is None else acc + t
                        out[q] = acc
                cp2 = pltpu.make_async_copy(
                    out,
                    o_hbm.at[:, pl.ds(i * bx, bx),
                             pl.ds(pl.multiple_of(j * by, 8), by), :],
                    sems.at[1])
                cp2.start()
                cp2.wait()

            pl.run_scoped(body,
                          buf=pltpu.VMEM((Q, bx, by, Z), jnp.float32),
                          out=pltpu.VMEM((Q, bx, by, Z), jnp.float32),
                          sems=pltpu.SemaphoreType.DMA((2,)))

        return pl.pallas_call(
            kern, grid=(X // bx, Y // by),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((Q,) + SHAPE, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024))(mmat, minv, f)

    for transform in ("unrolled", "mxu"):
        dt = _time(lambda x, t=transform: make(t), f)
        print("[%6.1fs] transform %-10s %7.2f ms (%.0f MLUPS-equiv)" %
              (time.time() - T0, transform, dt * 1e3, CELLS / dt / 1e6),
              flush=True)


def probe_kernel():
    """One fused-kernel sweep (no scan): launch + steady-state cost."""
    from bflbm_tpu.config import LBMParams
    from bflbm_tpu.kernels import fused_step
    from bflbm_tpu.models import binary_fluid as model

    for kBT, block in ((0.0, 2), (1e-5, 1)):
        params = LBMParams(alpha0=0.0, kBT=kBT)
        st = model.init_mixture(SHAPE, params, dtype=jnp.float32)
        run = fused_step.make_nsteps(params, 10, block=block)
        st = run(st)
        fetch_scalar(st)
        tt = time.time()
        st = run(st)
        fetch_scalar(st)
        dt = (time.time() - tt) / 10
        print("[%6.1fs] kernel kBT=%g b%d   %7.2f ms/step (%.0f MLUPS)" %
              (time.time() - T0, kBT, block, dt * 1e3, CELLS / dt / 1e6),
              flush=True)


PROBES = {"copy": probe_copy, "dma": probe_dma,
          "transform": probe_transform, "kernel": probe_kernel}

if __name__ == "__main__":
    for name in (sys.argv[1:] or ["copy", "dma", "kernel"]):
        PROBES[name]()
