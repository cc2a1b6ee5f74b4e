#!/usr/bin/env python
"""Micro-benchmark: in-kernel noise generation variants on the TPU.

Decomposes the cost of the coordinate-keyed hash noise stream (the
temporal-blocking prerequisite, kernels/fused_step.py) and measures
cheaper mixers.  Each case generates 34 normals (or uniforms) per cell
on a phase-0-sized region (bx+4, by+4, Z) per (bx, by) tile of a 256^3
domain and writes their sum (prevents DCE; output traffic ~0.3 ms).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bflbm_tpu.kernels import fused_step as fs
from bflbm_tpu.utils.timing import fetch_scalar

SHAPE = (256, 256, 256)
X, Y, Z = SHAPE
BX, BY = 8, 32
PAD = 2  # phase-0 pad for block=2
REGION = (BX + 2 * PAD, BY + 2 * PAD, Z)
NPAIR = fs._NPAIR
CELLS = float(np.prod(SHAPE))
T0 = time.time()

import numpy as _np
_GOLD_I32 = int(_np.int32(_np.uint32(0x9E3779B9)))


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _cellwords(word):
    ix = jax.lax.broadcasted_iota(jnp.int32, REGION, 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, REGION, 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, REGION, 2)
    cell = (ix * Y + iy) * Z + iz
    return _u32(cell ^ word)


def gen_hash_cur(word, step):
    """Current implementation (fused_step.hash_normals)."""
    n1, n2 = fs.hash_normals(word, step, (jnp.int32(0), jnp.int32(0)),
                             REGION, SHAPE, jnp.float32)
    return sum(n1[1:], n1[0]) + sum(n2)


def gen_hash_uniform_only(word, step):
    us = fs.hash_uniforms(word, step, (jnp.int32(0), jnp.int32(0)),
                          REGION, SHAPE, 2 * NPAIR, jnp.float32)
    return sum(us[1:], us[0])


def _mix32(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _mix32_1mul(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    return x


def _bm(us):
    two_pi = 6.283185307179586
    acc = None
    for p in range(NPAIR):
        r = jnp.sqrt(-2.0 * jnp.log(us[2 * p]))
        th = two_pi * us[2 * p + 1]
        v = r * (jnp.cos(th) + jnp.sin(th))
        acc = v if acc is None else acc + v
    return acc


def gen_hash_u16(word, step):
    """One full mix per PAIR; split the word into two 16-bit uniforms."""
    h1 = _mix32(_cellwords(word))
    unit = (1, 1, 1)
    sbase = step * jnp.int32(64)
    us = []
    for p in range(NPAIR):
        cnt = jnp.full(unit, (sbase + p) * jnp.int32(_GOLD_I32), jnp.int32)
        h2 = _mix32(h1 + _u32(cnt))
        lo = _i32(h2 & jnp.uint32(0xFFFF))
        hi = _i32(h2 >> 16)
        us.append(lo.astype(jnp.float32) * (1.0 / 65536.0) + (0.5 / 65536.0))
        us.append(hi.astype(jnp.float32) * (1.0 / 65536.0) + (0.5 / 65536.0))
    return _bm(us)


def gen_hash_1mul24(word, step):
    """One single-mul mix per draw, 24-bit uniform."""
    h1 = _mix32(_cellwords(word))
    unit = (1, 1, 1)
    sbase = step * jnp.int32(64)
    us = []
    for a in range(2 * NPAIR):
        cnt = jnp.full(unit, (sbase + a) * jnp.int32(_GOLD_I32), jnp.int32)
        h2 = _mix32_1mul(h1 + _u32(cnt))
        us.append(_i32(h2 >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
                  + (0.5 / (1 << 24)))
    return _bm(us)


def gen_hash_1mul16(word, step):
    """One single-mul mix per PAIR + 16-bit split."""
    h1 = _mix32(_cellwords(word))
    unit = (1, 1, 1)
    sbase = step * jnp.int32(64)
    us = []
    for p in range(NPAIR):
        cnt = jnp.full(unit, (sbase + p) * jnp.int32(_GOLD_I32), jnp.int32)
        h2 = _mix32_1mul(h1 + _u32(cnt))
        lo = _i32(h2 & jnp.uint32(0xFFFF))
        hi = _i32(h2 >> 16)
        us.append(lo.astype(jnp.float32) * (1.0 / 65536.0) + (0.5 / 65536.0))
        us.append(hi.astype(jnp.float32) * (1.0 / 65536.0) + (0.5 / 65536.0))
    return _bm(us)


def _rotl(x, k):
    return (x << k) | (x >> (32 - k))


def gen_hash_nomul(word, step):
    """Mul-free add-xor-rotate mixer (4 rounds) per pair, 16-bit split."""
    h1 = _mix32(_cellwords(word))
    unit = (1, 1, 1)
    sbase = step * jnp.int32(64)
    us = []
    for p in range(NPAIR):
        cnt = jnp.full(unit, (sbase + p) * jnp.int32(_GOLD_I32), jnp.int32)
        x = h1 + _u32(cnt)
        for k in (13, 17, 5, 11):
            x = x + _rotl(x, k)
            x = x ^ (x >> 7)
        lo = _i32(x & jnp.uint32(0xFFFF))
        hi = _i32(x >> 16)
        us.append(lo.astype(jnp.float32) * (1.0 / 65536.0) + (0.5 / 65536.0))
        us.append(hi.astype(jnp.float32) * (1.0 / 65536.0) + (0.5 / 65536.0))
    return _bm(us)


def gen_hw(word, step):
    """Hardware PRNG + Box-Muller (the final-phase stream)."""
    pltpu.prng_seed(word, step)
    bits = pltpu.prng_random_bits((2 * NPAIR,) + REGION)
    i24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u = i24.astype(jnp.float32) * (1.0 / (1 << 24))
    two_pi = 6.283185307179586
    r = jnp.sqrt(-2.0 * jnp.log(u[:NPAIR] + (0.5 / (1 << 24))))
    th = two_pi * u[NPAIR:]
    s = r * (jnp.cos(th) + jnp.sin(th))
    return jnp.sum(s, axis=0)


def gen_hw_bits_only(word, step):
    pltpu.prng_seed(word, step)
    acc = None
    for a in range(2 * NPAIR):
        bits = pltpu.prng_random_bits(REGION)
        u = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8,
                          jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
        acc = u if acc is None else acc + u
    return acc


_CLT4_STD = float(np.sqrt(4 * (65536.0 - 1.0) / 12.0) / 256.0)


def _clt4(words, n_normals):
    """words: list of int32 arrays; each word -> one normal as the byte
    sum (CLT-4 over discrete uniforms 0..255): exact variance, excess
    kurtosis -0.3, support +-3.45 sigma.  One int->float convert/normal."""
    acc = None
    scale = 1.0 / (256.0 * _CLT4_STD)
    off = -510.0 / (256.0 * _CLT4_STD)
    for a in range(n_normals):
        w = _u32(words[a])
        s = (w & jnp.uint32(0xFF)) + ((w >> 8) & jnp.uint32(0xFF)) \
            + ((w >> 16) & jnp.uint32(0xFF)) + (w >> 24)
        z = _i32(s).astype(jnp.float32) * scale + off
        acc = z if acc is None else acc + z
    return acc


def gen_clt4_hw(word, step):
    """Hardware bits + CLT-4 byte-sum normal (no transcendentals)."""
    pltpu.prng_seed(word, step)
    n = 2 * NPAIR
    bits = pltpu.prng_random_bits((n,) + REGION)
    words = [pltpu.bitcast(bits[a], jnp.int32) for a in range(n)]
    return _clt4(words, n)


def gen_clt4_hash(word, step):
    """Coordinate-keyed hash bits + CLT-4 byte-sum normal."""
    h1 = _mix32(_cellwords(word))
    unit = (1, 1, 1)
    sbase = step * jnp.int32(64)
    words = []
    for a in range(2 * NPAIR):
        cnt = jnp.full(unit, (sbase + a) * jnp.int32(_GOLD_I32), jnp.int32)
        words.append(_i32(_mix32(h1 + _u32(cnt))))
    return _clt4(words, 2 * NPAIR)


def gen_clt4_hash_1mul(word, step):
    """Hash bits with a single-multiply second-stage mix + CLT-4."""
    h1 = _mix32(_cellwords(word))
    unit = (1, 1, 1)
    sbase = step * jnp.int32(64)
    words = []
    for a in range(2 * NPAIR):
        cnt = jnp.full(unit, (sbase + a) * jnp.int32(_GOLD_I32), jnp.int32)
        x = h1 + _u32(cnt)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        words.append(_i32(x))
    return _clt4(words, 2 * NPAIR)


def gen_clt4_hash_nomul(word, step):
    """Hash bits with an add-xor-rotate second stage (no multiplies)."""
    h1 = _mix32(_cellwords(word))
    unit = (1, 1, 1)
    sbase = step * jnp.int32(64)
    words = []
    for a in range(2 * NPAIR):
        cnt = jnp.full(unit, (sbase + a) * jnp.int32(_GOLD_I32), jnp.int32)
        x = h1 + _u32(cnt)
        for kk in (13, 17, 7):
            x = x + _rotl(x, kk)
            x = x ^ (x >> 9)
        words.append(_i32(x))
    return _clt4(words, 2 * NPAIR)


CASES = {
    "clt4_hash_1mul": gen_clt4_hash_1mul,
    "clt4_hash_nomul": gen_clt4_hash_nomul,
    "clt4_hw": gen_clt4_hw,
    "clt4_hash": gen_clt4_hash,
    "hw": gen_hw,
    "hw_bits_only": gen_hw_bits_only,
    "hash_cur": gen_hash_cur,
    "hash_uniform_only": gen_hash_uniform_only,
    "hash_u16": gen_hash_u16,
    "hash_1mul24": gen_hash_1mul24,
    "hash_1mul16": gen_hash_1mul16,
    "hash_nomul": gen_hash_nomul,
}


def run_case(tag, gen, nreps=5):
    def kern(seed_ref, o_hbm):
        i, j = pl.program_id(0), pl.program_id(1)

        def body(out, sem):
            v = gen(seed_ref[0] + i * 7919 + j * 104729, seed_ref[1])
            out[:] = v[PAD:PAD + BX, PAD:PAD + BY, :]
            cp = pltpu.make_async_copy(
                out,
                o_hbm.at[pl.ds(i * BX, BX),
                         pl.ds(pl.multiple_of(j * BY, 8), BY), :],
                sem)
            cp.start()
            cp.wait()

        pl.run_scoped(body, out=pltpu.VMEM((BX, BY, Z), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA)

    call = pl.pallas_call(
        kern, grid=(X // BX, Y // BY),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024))

    seed = jnp.array([12345, 7], jnp.int32)
    step = jax.jit(lambda s: jax.lax.fori_loop(
        0, nreps, lambda k, a: call(s + k), call(s)))
    try:
        y = step(seed)
        fetch_scalar(y)
        tt = time.time()
        y = step(seed)
        fetch_scalar(y)
        dt = (time.time() - tt) / (nreps + 1)
        print("[%6.1fs] %-20s %7.2f ms  (%.3f ns/cell, mean=%.4f)"
              % (time.time() - T0, tag, dt * 1e3, dt / CELLS * 1e9,
                 float(np.asarray(y).mean())), flush=True)
        return dt
    except Exception as e:
        print("[%6.1fs] %-20s FAIL %s" % (time.time() - T0, tag,
                                          str(e)[:300]), flush=True)
        return None


if __name__ == "__main__":
    only = sys.argv[1:] or list(CASES)
    for tag in only:
        run_case(tag, CASES[tag])
