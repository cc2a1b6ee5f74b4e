"""Fused Pallas collide-stream kernel — the hot path of the framework.

The reference's hot loop (``LBM_timestep``, LBM_binary.H:545-594) runs
~6 halo exchanges and 4 sweeps over the populations per step.  Here one
Pallas kernel performs, per (x, y) tile with the full z extent resident:

    pull-stream (shifted VMEM reads, z-wrap via pltpu.roll)
      -> densities on a 1-cell-extended tile
      -> 19-point isotropic gradients (Shan-Chen force)
      -> real-velocity reconstruction (friction + noise corrections)
      -> per-mode thermal noise (hash counter RNG / hardware PRNG)
      -> MRT collide in moment space (unrolled Duenweg/Schiller basis)

TEMPORAL BLOCKING: the kernel advances ``block`` (T) steps per sweep.
Phase s of T updates a region with pad 2*(T-1-s) cells around the
interior tile (each K = collide o stream consumes a 2-cell halo: 1 for
streaming + 1 for the gradient stencil), so the HBM traffic per step
drops to ~1/T of the single-step kernel — the decisive lever on this
platform, whose Pallas DMA ceiling (233 GB/s) sits below the XLA copy
rate (CLAUDE.md).  Overlap cells recomputed by adjacent tiles (and by
periodic wraps) MUST receive identical thermal noise or tile seams break
conservation, so all non-final phases key every normal draw by
(word, step, global cell index, draw index) through a counter-based hash
(:func:`hash_normals`) — bitwise reproducible for any tiling.

State convention: between kernel invocations HBM holds the
POST-COLLIDE populations.  For a standard (post-stream) ``SimState`` S
with step = T(stream) after C(collide), n steps factor as

    (T o C)^n = T o (C o T)^(n-1) o C

so :func:`make_nsteps` runs one jnp collide to enter post-collide space,
n-1 fused K = C o T updates (grouped into T-step sweeps), and one jnp
stream to exit.

Periodic halos: the tile loads a (BX+2*2T, BY+16, Z) block via 9
fixed-size DMA fragments per species (3 x-ranges x 3 y-ranges) whose
source offsets are taken modulo the domain — every fragment is
contiguous in-bounds, so no dynamic-size DMA is needed.  Mosaic
alignment rules force the y (sublane) fragments to 8-aligned sizes,
hence the physical y pad is 8 although only 2T halo cells are consumed;
z wraps with in-register rolls.

Noise: amplitudes exactly as ``ops.noise`` (LBM_binary.H:113-127);
the bit source is either the coordinate-keyed hash stream
(``noise_impl="hash"``, required for all non-final phases) or the TPU
hardware PRNG seeded per (seed, step, tile) (``"hw"``, final phase
only), and the normal generator is ``noise_dist="clt4"`` (byte-sum,
exact first/second moments, no transcendentals — see
:func:`_clt4_normal`), ``"clt2"`` (byte-pair halves, two normals per
word, see :func:`_clt2_pair`), ``"u8"`` (single-byte variance-matched
uniform deviates — Ladd's original FLBM noise, four per word,
cheapest, see :func:`_u8_quad`) or ``"bm"`` (Box-Muller, exact
Gaussian, ~3x slower noise phase).  All kernel streams are statistically
identical to the jnp path's threefry Gaussians for every validated
fluctuation observable but not bitwise equal (the jnp path remains the
decomposition-invariant reference; parity tests run at kBT=0 where the
paths agree to round-off, and the blocked/composed factorization is
tested bitwise with hash noise).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LBMParams
from ..lattice import B, C, CS2, M, M_INV, Q, W
from ..state import SimState

# Opposite-velocity pairs and moment-row parity (used by the "eo"
# transform): c[2p+2] == -c[2p+1] in the reference ordering, and every
# Duenweg/Schiller basis row is parity-definite under c -> -c, so
# moments split into an even sector (reads only pair sums s_p = f_i +
# f_ibar) and an odd sector (pair differences) — ~40% fewer VPU
# multiply-adds than the fully unrolled transform.
_PAIRS = tuple((2 * p + 1, 2 * p + 2) for p in range(9))
_ROW_EVEN = tuple(
    bool(all(M[k, i] == M[k, j] for i, j in _PAIRS)) for k in range(Q))
assert all(_ROW_EVEN[k] or all(M[k, i] == -M[k, j] for i, j in _PAIRS)
           for k in range(Q)), "moment basis must be parity-definite"
assert all(
    (_ROW_EVEN[k] and all(M_INV[i, k] == M_INV[j, k] for i, j in _PAIRS))
    or (not _ROW_EVEN[k]
        and all(M_INV[i, k] == -M_INV[j, k] for i, j in _PAIRS))
    for k in range(Q))

# --------------------------------------------------------------------------
# "eof" — the factored parity-paired transform.  Beyond the even/odd pair
# split, the Duenweg/Schiller rows share whole pair-GROUP sums: the three
# diagonal-plane sums s_d = sp_xy, sp_yz, sp_xz and the axis sum enter
# m0/m4/m5/m6/m16/m17/m18 as a unit, the odd groups (dp_a +- dp_b) serve
# both the momentum rows m1-m3 and the ghost rows m10-m15, and on the
# inverse side the six diagonal pairs differ only in the sign of ONE
# kinetic-moment term around three shared 7-term cores (H1/H2/H3 below).
# Hand-scheduling those shared partials cuts the VPU work to ~68 ops per
# species forward (vs ~116 for "eo") and ~114 back (vs ~223).  The
# schedule hardcodes the D3Q19 basis STRUCTURE; _verify_eof() checks the
# net matrices against M / M_INV at import (1e-13) and the module falls
# back to "eo" wholesale if the basis ever stops matching.
# Reference: the unrolled transforms LBM_d3q19.H:90-150 (same moments,
# no factoring — the reference computes each row independently).

def _eof_mom(pops):
    """Factored forward transform: 19 populations -> 19 moments."""
    sp = [pops[i] + pops[j] for i, j in _PAIRS]
    dp = [pops[i] - pops[j] for i, j in _PAIRS]
    f0 = pops[0]
    # shared even partials
    v12 = sp[1] + sp[2]
    s_ax = sp[0] + v12
    s_d1 = sp[3] + sp[4]
    s_d2 = sp[5] + sp[6]
    s_d3 = sp[7] + sp[8]
    s_di = (s_d1 + s_d2) + s_d3
    u = s_d1 + s_d3
    u2 = s_d1 - s_d3
    t1 = sp[0] + sp[0]
    q2 = s_d2 + s_d2
    w12 = sp[1] - sp[2]
    # shared odd partials
    a1 = dp[3] + dp[4]
    a2 = dp[3] - dp[4]
    b1 = dp[5] + dp[6]
    b2 = dp[5] - dp[6]
    c1 = dp[7] + dp[8]
    c2 = dp[7] - dp[8]
    ac = a1 + c1
    ab = a2 + b1
    bc = b2 + c2
    m = [None] * Q
    m[0] = f0 + (s_ax + s_di)
    m[1] = dp[0] + ac
    m[2] = dp[1] + ab
    m[3] = dp[2] + bc
    m[4] = s_di - f0
    m[5] = (t1 + u) - (v12 + q2)
    m[6] = w12 + u2
    m[7] = sp[3] - sp[4]
    m[8] = sp[5] - sp[6]
    m[9] = sp[7] - sp[8]
    m[10] = ac - (dp[0] + dp[0])
    m[11] = ab - (dp[1] + dp[1])
    m[12] = bc - (dp[2] + dp[2])
    m[13] = a1 - c1
    m[14] = b1 - a2
    m[15] = c2 - b2
    m[16] = f0 + (s_di - (s_ax + s_ax))
    m[17] = (u + v12) - (t1 + q2)
    m[18] = u2 - w12
    return m


def _eof_mom_c(pops):
    """Conserved rows of the factored forward transform: [m0, m1, m2, m3].

    Exact-relaxation fast path (tau = 1/2 -> lambda_bar = 1, the default
    of every reference recipe, LBM_binary.H:74-80): the MRT collision
    replaces ALL non-conserved moments by m_eq (+ forcing + noise), so
    the streamed state's stress/ghost moments are computed only to be
    discarded — the forward transform shrinks to the four conserved
    rows.  The expression trees are the _eof_mom ones verbatim, so the
    conserved moments stay bitwise equal to the full transform's.
    """
    sp = [pops[i] + pops[j] for i, j in _PAIRS]
    dp = [pops[i] - pops[j] for i, j in _PAIRS]
    f0 = pops[0]
    v12 = sp[1] + sp[2]
    s_ax = sp[0] + v12
    s_d1 = sp[3] + sp[4]
    s_d2 = sp[5] + sp[6]
    s_d3 = sp[7] + sp[8]
    s_di = (s_d1 + s_d2) + s_d3
    a1 = dp[3] + dp[4]
    a2 = dp[3] - dp[4]
    b1 = dp[5] + dp[6]
    b2 = dp[5] - dp[6]
    c1 = dp[7] + dp[8]
    c2 = dp[7] - dp[8]
    ac = a1 + c1
    ab = a2 + b1
    bc = b2 + c2
    return [f0 + (s_ax + s_di), dp[0] + ac, dp[1] + ab, dp[2] + bc]


def _eof_pops(mom):
    """Factored back transform: 19 moments -> 19 populations, rest
    population by exact-mass telescoping (same property as "eo")."""
    # even parts (pair sums / 2)
    a = (mom[0] - mom[16]) * (1.0 / 18.0)
    b5 = mom[5] - mom[17]
    c6 = mom[6] - mom[18]
    s5 = mom[5] + mom[17]
    s6 = mom[6] + mom[18]
    tb = b5 * (1.0 / 24.0)
    tc = c6 * 0.125
    e34 = a - tb
    d = mom[0] * (1.0 / 36.0) + mom[4] * (1.0 / 24.0) \
        + mom[16] * (1.0 / 72.0)
    p5 = s5 * (1.0 / 48.0)
    p6 = s6 * 0.0625
    h1 = d + (p5 + p6)
    h2 = d - s5 * (1.0 / 24.0)
    h3 = d + (p5 - p6)
    x7 = mom[7] * 0.25
    x8 = mom[8] * 0.25
    x9 = mom[9] * 0.25
    ev = [a + b5 * (1.0 / 12.0), e34 + tc, e34 - tc,
          h1 + x7, h1 - x7, h2 + x8, h2 - x8, h3 + x9, h3 - x9]
    # odd parts (pair differences / 2)
    p1 = mom[1] * (1.0 / 12.0)
    p2 = mom[2] * (1.0 / 12.0)
    p3 = mom[3] * (1.0 / 12.0)
    q10 = mom[10] * (1.0 / 24.0)
    q11 = mom[11] * (1.0 / 24.0)
    q12 = mom[12] * (1.0 / 24.0)
    r13 = mom[13] * 0.125
    r14 = mom[14] * 0.125
    r15 = mom[15] * 0.125
    od = [(mom[1] - mom[10]) * (1.0 / 6.0),
          (mom[2] - mom[11]) * (1.0 / 6.0),
          (mom[3] - mom[12]) * (1.0 / 6.0),
          (p1 + p2) + (q10 + q11) + (r13 - r14),
          (p1 - p2) + (q10 - q11) + (r13 + r14),
          (p2 + p3) + (q11 + q12) + (r14 - r15),
          (p2 - p3) + (q11 - q12) + (r14 + r15),
          (p1 + p3) + (q10 + q12) + (r15 - r13),
          (p1 - p3) + (q10 - q12) - (r13 + r15)]
    out = [None] * Q
    for p, (i, j) in enumerate(_PAIRS):
        out[i] = ev[p] + od[p]
        out[j] = ev[p] - od[p]
    s = None
    for i, j in _PAIRS:
        ps = out[i] + out[j]
        s = ps if s is None else s + ps
    out[0] = mom[0] - s
    return out


def _eof_pops_c10(mom):
    """:func:`_eof_pops` specialized to ghost moments 10..18 == 0.

    This is the deterministic exact-relaxation (tau = 1/2) case: the
    post-collide moment vector is m_eq (+ Guo forcing), whose ghost rows
    vanish identically (LBM_binary.H:381-399 zero them), so all q/r
    partials of the inverse drop out.  Rest population by the same
    exact-mass telescoping.
    """
    a = mom[0] * (1.0 / 18.0)
    tb = mom[5] * (1.0 / 24.0)
    tc = mom[6] * 0.125
    e34 = a - tb
    d = mom[0] * (1.0 / 36.0) + mom[4] * (1.0 / 24.0)
    p5 = mom[5] * (1.0 / 48.0)
    p6 = mom[6] * 0.0625
    h1 = d + (p5 + p6)
    h2 = d - mom[5] * (1.0 / 24.0)
    h3 = d + (p5 - p6)
    x7 = mom[7] * 0.25
    x8 = mom[8] * 0.25
    x9 = mom[9] * 0.25
    ev = [a + mom[5] * (1.0 / 12.0), e34 + tc, e34 - tc,
          h1 + x7, h1 - x7, h2 + x8, h2 - x8, h3 + x9, h3 - x9]
    p1 = mom[1] * (1.0 / 12.0)
    p2 = mom[2] * (1.0 / 12.0)
    p3 = mom[3] * (1.0 / 12.0)
    od = [mom[1] * (1.0 / 6.0), mom[2] * (1.0 / 6.0),
          mom[3] * (1.0 / 6.0),
          p1 + p2, p1 - p2, p2 + p3, p2 - p3, p1 + p3, p1 - p3]
    out = [None] * Q
    for p, (i, j) in enumerate(_PAIRS):
        out[i] = ev[p] + od[p]
        out[j] = ev[p] - od[p]
    s = None
    for i, j in _PAIRS:
        ps = out[i] + out[j]
        s = ps if s is None else s + ps
    out[0] = mom[0] - s
    return out


def _two_sum(a, b):
    """Knuth TwoSum: s = fl(a+b) and the EXACT rounding error e, so
    a + b == s + e in real arithmetic (no magnitude ordering needed)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def _comp_sum(vals):
    """Compensated (TwoSum-tree) sum: correctly rounded to ~1 ulp with
    NO coherent tree bias.  Used by transform="eofc" to pin the mass
    moment: the plain forward tree's rounding correlates across the
    near-identical cells of a production run and walks total mass by
    ~1e-9/step (measured, tpu_verify mass_conservation_100steps); the
    compensated row re-sums the 2*ceil(log2 19) rounding residues so
    the stored mass tracks the exact f32-population sum.  Costs ~130
    extra VPU flops/species — free on the DMA-bound block=1 path.
    Reference behavior: amrex::Real (double) accumulation never sees
    the f32 walk (LBM_d3q19.H:90-150)."""
    vals = list(vals)
    errs = []
    while len(vals) > 1:
        nxt = []
        for i in range(0, len(vals) - 1, 2):
            s, e = _two_sum(vals[i], vals[i + 1])
            nxt.append(s)
            errs.append(e)
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    e = errs[0]
    for t in errs[1:]:
        e = e + t
    return vals[0] + e


def _verify_eof():
    """Identity-matrix check of the factored schedules vs M / M_INV."""
    eye = [np.eye(Q)[k] for k in range(Q)]
    mf = np.stack(_eof_mom(eye))          # row k = moment k of basis pops
    if not np.allclose(mf, M, rtol=0.0, atol=1e-13):
        return False
    pf = np.stack(_eof_pops(eye))
    if not np.allclose(pf, M_INV, rtol=0.0, atol=1e-13):
        return False
    mc = np.stack(_eof_mom_c(eye))        # conserved rows only
    if not np.allclose(mc, M[:4], rtol=0.0, atol=1e-13):
        return False
    eye10 = [np.eye(10)[k] for k in range(10)]
    pc = np.stack(_eof_pops_c10(eye10))   # columns 0..9 of M_INV
    return bool(np.allclose(pc, M_INV[:, :10], rtol=0.0, atol=1e-13))


_EOF_OK = _verify_eof()
_DEFAULT_TRANSFORM = "eof" if _EOF_OK else "eo"

# Test hook (tests/test_relax_invariance.py): route tau = 1/2 configs
# through the GENERAL relaxation formulas (full-Q forward transform,
# m + lambda_bar*(m_eq - m) updates) instead of the exact-relaxation
# specialization.  Read at trace time — set it before building a kernel.
FORCE_GENERAL_RELAX = False

# number of normal draws per cell: 3 momentum + 15 ghost(f) + 15 ghost(g)
_N_NORMALS = 33
_NPAIR = (_N_NORMALS + 1) // 2   # Box-Muller pairs (17 -> 34 normals)
_PY = 8   # y pad: sublane tiling forces 8-aligned DMA fragments


def sd_depth(params: LBMParams) -> int:
    """Stencil depth per K = collide∘stream: streaming consumes one
    neighbor cell; the Shan-Chen force gradient (alpha0 != 0,
    LBM_binary.H:137-168) consumes a second; the alpha1 square-gradient
    term (grad_laplacian_2nd, LBM_binary.H:170-194) composes gradient o
    laplacian and consumes a third.  Every pad, halo and recompute
    region scales with sd*block, so the uncoupled case (all fluctuating
    headline configs) runs half the overlap of the coupled one — which
    is what moves its block optimum from 2 to 3
    (benchmarks/results/block_r4.json)."""
    if params.alpha1 != 0.0:
        return 3
    return 2 if params.alpha0 != 0.0 else 1
# draw-counter stride per step in the hash stream (>= 2*_NPAIR, power of
# two so `step << 6 | draw` is injective for step < 2^25)
_DRAW_STRIDE = 64


def supports_shape(shape: Tuple[int, int, int]) -> bool:
    """Mosaic requires DMA slices 128-aligned along the lane (z) axis and
    8-aligned along the sublane (y) axis, so the fused kernel needs
    Z % 128 == 0 and Y % 8 == 0; other shapes run through an axis
    permutation (:func:`axis_perm_for_shape`) when one fits, else fall
    back to the jnp path in :func:`make_nsteps`."""
    return shape[2] % 128 == 0 and shape[1] % 8 == 0


def axis_perm_for_shape(shape: Tuple[int, int, int]):
    """Spatial permutation p (new axis k = old axis p[k]) making the shape
    kernel-tileable, or None.  D3Q19 + MRT collide + FDT noise are exactly
    equivariant under coordinate permutations (the velocity set maps onto
    itself; relaxation rates are equal within each basis sector that mixes,
    and the per-sector noise kernel sum_a e_a(c_i) e_a(c_j) / b_a is
    basis-independent), so running the unmodified kernel on the transposed
    field with relabeled populations IS the permuted dynamics.  This is
    what lets the reference's flat-interface 8x256x64 case (Z=64 < 128)
    run on the fast path as 8x64x256."""
    if supports_shape(shape):
        return (0, 1, 2)
    best = None
    for p in ((0, 2, 1), (1, 0, 2), (2, 0, 1), (1, 2, 0), (2, 1, 0)):
        s = tuple(shape[a] for a in p)
        if supports_shape(s):
            # prefer the largest lane extent (better VPU shapes)
            if best is None or s[2] > tuple(shape[a] for a in best)[2]:
                best = p
    return best


def supports(shape: Tuple[int, int, int]) -> bool:
    """True if the fused kernel can run this shape, directly or via an
    axis permutation."""
    return axis_perm_for_shape(shape) is not None


def _pop_perm(p) -> np.ndarray:
    """Population relabeling for spatial permutation p: idx[j] = i with
    C[i][p] == C[j], so the permuted state is f[idx] transposed by p."""
    cp = C[:, list(p)]
    idx = np.empty(Q, np.int64)
    for j in range(Q):
        (m,) = np.where((cp == C[j]).all(axis=1))
        idx[j] = m[0]
    return idx


def _permute_pops(arr: jnp.ndarray, p, idx) -> jnp.ndarray:
    """(Q, X, Y, Z) array -> permuted lattice frame."""
    return jnp.transpose(arr[jnp.asarray(idx)],
                         (0, 1 + p[0], 1 + p[1], 1 + p[2]))


def _inverse_perm(p):
    inv = [0, 0, 0]
    for k, a in enumerate(p):
        inv[a] = k
    return tuple(inv)


def _choose_tile(shape: Tuple[int, int, int],
                 block: int = 1, noise_on: bool = True,
                 use_ref: bool = False, sd: int = 2) -> Tuple[int, int]:
    """Pick (BX, BY) dividing (X, Y); z is always whole.

    The y-sweep load path (see _step_kernel) wants BY a multiple of
    _PY == 8 so the sliding fresh load is a single aligned fragment; BX
    is then sized to amortize the 2*block-deep x halo within the VMEM
    budget.  use_ref: the COM-rolled (rho_eq, phi_eq) stack rides the
    DMA pipeline as a third operand — tighter budget: the (16,16)
    use_ref hybrid kernel at Z=256 measured 0.45% OVER the ~127 MB
    scoped-vmem limit on the 2026-08-18 platform compiler (it fit on
    earlier windows; the margin was razor-thin either way), so one bx
    step down buys ~2x headroom on a gated audit path."""
    X, Y, Z = shape
    # budget with the sd=2 envelope unless the caller passes the true
    # stencil depth (sd=3 for alpha1 runs needs the wider ext slots)
    px = max(2, sd) * block

    def best(n, target, mult=1):
        divs = [d for d in range(1, n + 1) if n % d == 0 and d % mult == 0]
        if not divs:
            divs = [n]
        return min(divs, key=lambda d: (abs(d - target), d))

    # hardware matrix (benchmarks/tpu_perf_r3.py, 256^3 v5e): bx=16
    # wins everywhere except the pure-deterministic blocked sweep —
    # fluct b2 hybrid (16,16) 868 vs (8,16) 749; b1 (16,16) 842 vs
    # (8,16) 804; coupled b1 781 vs 769; determ b2 (8,16) 1157 vs
    # (16,16) 1114.  The hybrid seam-only noise needs bx,by >= 12
    # (interior >= 8 after the 2*p_s seam band), which bx=16 affords.
    by = 2 * _PY if Y % (2 * _PY) == 0 and Y // (2 * _PY) >= 2 \
        else (_PY if Y % _PY == 0 and Y // _PY >= 2 else best(Y, 32))
    bx = best(X, 8 if (block >= 2 and not noise_on) else 16)
    # Budget: ext block 2*19*(BX+2*px)*(BY+16)*Z*4 bytes (x2 slots) <=
    # 40 MB (30 MB with the ref operand's extra channels + headroom)
    chan = 2 * Q + (2 if use_ref else 0)
    budget = (28 if use_ref else 40) * 2 ** 20
    while chan * (bx + 2 * px) * (by + 2 * _PY) * Z * 4 > budget \
            and bx > 1:
        bx = best(X, bx // 2)
        if bx <= 1:
            break
    return bx, by


def _mod_starts(i, bsize, pad, n):
    """Source starts (mod n) for the 3 fixed-size fragments of an
    extended range [i*bsize - pad, i*bsize + bsize + pad)."""
    x0 = i * bsize
    return ((x0 - pad) % n, x0, (x0 + bsize) % n)


def _roll_z(arr, shift):
    """Circular z shift; pltpu.roll requires a non-negative shift."""
    if shift == 0:
        return arr
    n = arr.shape[-1]
    return pltpu.roll(arr, shift % n, arr.ndim - 1)


# ---------------------------------------------------------------------------
# Coordinate-keyed counter RNG.
#
# normal draw = f(word, step, global cell index, draw index): the SAME
# value is produced wherever a cell is (re)computed — by the owning tile,
# by a neighbor tile's overlap region, or at a periodic wrap — which is
# what makes temporal blocking conservative across tile seams.  Two
# rounds of the `lowbias32` integer finalizer (full-avalanche bijective
# mixer) keyed as
#
#     h1 = mix(cell ^ word)                     (once per cell)
#     h2 = mix(h1 + (step*64 + draw) * GOLDEN)  (per draw)
#
# give ~10 VPU int-ops per draw; statistics validated in
# tests/test_fused_kernel.py (mean/var/cross-draw/lag correlations) and
# by the equilibrium S(k) hardware acceptance runs.  Built on
# lax.bitcast_convert_type so the identical code runs inside Mosaic and
# as plain jnp in unit tests.
# ---------------------------------------------------------------------------

_GOLDEN = 0x9E3779B9


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _mix32(x):
    """lowbias32 finalizer (Wellons): bijective, full-avalanche."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hash_uniforms(word, step, origin, region, domain, ndraws, dtype):
    """ndraws arrays of U(0,1) on `region`, keyed by global coordinates.

    word, step: int32 scalars (word: per-call random; step: counter).
    origin: (ox, oy) int32 scalars — global coords of region[0, 0, :]
      (may be negative down to -X/-Y; wrapped periodically).
    region: static (nx, ny, nz); domain: static (X, Y, Z), nz == Z.
    Returns list of `ndraws` float arrays, strictly inside (0, 1).
    """
    X, Y, Z = domain
    ox, oy = origin
    ix = jax.lax.broadcasted_iota(jnp.int32, region, 0) + (ox + X)
    iy = jax.lax.broadcasted_iota(jnp.int32, region, 1) + (oy + Y)
    iz = jax.lax.broadcasted_iota(jnp.int32, region, 2)
    gx = jax.lax.rem(ix, jnp.int32(X))
    gy = jax.lax.rem(iy, jnp.int32(Y))
    cell = (gx * Y + gy) * Z + iz
    # scalar mixing stays in int32 (two's-complement wrap == uint32 bits;
    # Mosaic only supports bitcasts on vectors, so scalars are folded in
    # BEFORE the vector bitcast / via a unit-vector bitcast)
    h1 = _mix32(_u32(cell ^ word))
    gold = jnp.int32(np.int32(np.uint32(_GOLDEN)))
    sbase = step * jnp.int32(_DRAW_STRIDE)
    unit = (1,) * len(region)
    out = []
    for a in range(ndraws):
        cnt = jnp.full(unit, (sbase + a) * gold, jnp.int32)
        h2 = _mix32(h1 + _u32(cnt))
        i24 = jax.lax.bitcast_convert_type(h2 >> 8, jnp.int32)
        out.append(i24.astype(dtype) * (1.0 / (1 << 24)) + (0.5 / (1 << 24)))
    return out


def hash_words(word, step, origin, region, domain, ndraws):
    """ndraws uint32 arrays on `region`, keyed by global coordinates —
    the raw bit stream behind :func:`hash_uniforms` / :func:`hash_normals`."""
    X, Y, Z = domain
    ox, oy = origin
    ix = jax.lax.broadcasted_iota(jnp.int32, region, 0) + (ox + X)
    iy = jax.lax.broadcasted_iota(jnp.int32, region, 1) + (oy + Y)
    iz = jax.lax.broadcasted_iota(jnp.int32, region, 2)
    gx = jax.lax.rem(ix, jnp.int32(X))
    gy = jax.lax.rem(iy, jnp.int32(Y))
    cell = (gx * Y + gy) * Z + iz
    h1 = _mix32(_u32(cell ^ word))
    gold = jnp.int32(np.int32(np.uint32(_GOLDEN)))
    sbase = step * jnp.int32(_DRAW_STRIDE)
    unit = (1,) * len(region)
    out = []
    for a in range(ndraws):
        cnt = jnp.full(unit, (sbase + a) * gold, jnp.int32)
        out.append(_mix32(h1 + _u32(cnt)))
    return out


# CLT-4 byte-sum normal: one uint32 word -> sum of its 4 bytes (four
# i.i.d. discrete uniforms on 0..255), standardized.  Exact mean and
# variance, symmetric, excess kurtosis -0.3, support +-3.45 sigma —
# statistically equivalent to a Gaussian for every fluctuation
# observable this framework validates (noise covariance, equilibrium
# S(k), capillary spectrum, MSD are all second-moment statistics;
# higher-cumulant corrections enter at O(kBT^2)).  Precedent: Ladd's
# original FLBM used variance-matched uniform noise (J. Fluid Mech.
# 271, 1994).  Costs one int->float convert + ~10 int ops per normal vs
# Box-Muller's log/sqrt/cos/sin — 2-3x cheaper measured on v5e
# (benchmarks/tpu_noise_micro.py), which is what makes the temporally-
# blocked fluctuating kernel compute-viable.
_CLT4_VAR = 4.0 * (65536.0 - 1.0) / 12.0    # var of the 0..1020 byte sum
_CLT4_SCALE = float(1.0 / np.sqrt(_CLT4_VAR))
_CLT4_OFF = float(-510.0 / np.sqrt(_CLT4_VAR))


def _clt4_normal(w, dtype):
    """uint32 word -> standardized byte-sum normal (see above).

    SWAR pairwise sum: bytes 0+1 and 2+3 land in the two 16-bit halves
    of one add (no overflow: 510 < 2^16), then the halves fold — 7 int
    ops vs 9 for the naive four-byte extraction, bitwise-identical."""
    t = (w & jnp.uint32(0x00FF00FF)) + ((w >> 8) & jnp.uint32(0x00FF00FF))
    s = (t & jnp.uint32(0xFFFF)) + (t >> 16)
    i = jax.lax.bitcast_convert_type(s, jnp.int32)
    return i.astype(dtype) * _CLT4_SCALE + _CLT4_OFF


# CLT-2 byte-pair normal: each 16-bit half of one uint32 word -> sum of
# its 2 bytes, standardized — TWO normals per word.  Exact mean and
# variance like CLT-4, heavier truncation: support +-2.44 sigma, excess
# kurtosis -0.6 (still far inside Ladd's uniform-noise precedent at
# -1.2, J. Fluid Mech. 271, 1994); every validated fluctuation
# observable is a second-moment statistic (see the CLT-4 note above).
# Cost: the same first SWAR add as CLT-4 then two half extractions —
# ~3 int ops per normal vs 7, on HALF the PRNG bits (the generator is
# the dominant noise cost at 256^3; benchmarks/tpu_noise_micro.py).
_CLT2_VAR = 2.0 * (65536.0 - 1.0) / 12.0    # var of a 0..510 byte-pair sum
_CLT2_SCALE = float(1.0 / np.sqrt(_CLT2_VAR))
_CLT2_OFF = float(-255.0 / np.sqrt(_CLT2_VAR))


def _clt2_pair(w, dtype):
    """uint32 word -> (n_lo, n_hi) standardized byte-pair normals (see
    above).  The halves of one xor-shift-mixed word are independent to
    the same degree consecutive words are (avalanche mixes all bits)."""
    t = (w & jnp.uint32(0x00FF00FF)) + ((w >> 8) & jnp.uint32(0x00FF00FF))
    lo = jax.lax.bitcast_convert_type(t & jnp.uint32(0xFFFF), jnp.int32)
    hi = jax.lax.bitcast_convert_type(t >> 16, jnp.int32)
    return (lo.astype(dtype) * _CLT2_SCALE + _CLT2_OFF,
            hi.astype(dtype) * _CLT2_SCALE + _CLT2_OFF)


# u8 single-byte uniform "normal": each byte of a word, standardized —
# FOUR variance-matched draws per word.  This is exactly Ladd's original
# FLBM noise (variance-matched UNIFORM deviates, J. Fluid Mech. 271,
# 1994): support +-1.73 sigma, excess kurtosis -1.2.  Exact mean and
# variance like clt4/clt2; every fluctuation observable this framework
# validates is a second-moment statistic (see the CLT-4 note), and the
# equilibrium S(k) acceptance is re-run per generator on hardware.
# Cost: ~3 int ops per draw on HALF of clt2's PRNG bits — the bit
# generator dominates the noise phase at 256^3.
_U8_VAR = (65536.0 - 1.0) / 12.0          # var of a uniform 0..255 byte
_U8_SCALE = float(1.0 / np.sqrt(_U8_VAR))
_U8_OFF = float(-127.5 / np.sqrt(_U8_VAR))


def _u8_quad(w, dtype):
    """uint32 word -> 4 standardized byte-uniform draws (see above)."""
    out = []
    for sh in (0, 8, 16, 24):
        b = jax.lax.bitcast_convert_type(
            (w >> sh) & jnp.uint32(0xFF), jnp.int32)
        out.append(b.astype(dtype) * _U8_SCALE + _U8_OFF)
    return out


def _bm_normals(us, dtype):
    """Box-Muller over 2*_NPAIR uniforms -> (n1, n2) pair lists."""
    two_pi = 6.283185307179586
    n1, n2 = [], []
    for p in range(_NPAIR):
        r = jnp.sqrt(-2.0 * jnp.log(us[2 * p]))
        th = two_pi * us[2 * p + 1]
        n1.append(r * jnp.cos(th))
        n2.append(r * jnp.sin(th))
    return n1, n2


def hash_normals(word, step, origin, region, domain, dtype,
                 dist: str = "clt4"):
    """(n1, n2) lists of _NPAIR standard normals each over the
    coordinate-keyed hash stream.  dist: "clt4" (byte-sum, default),
    "clt2" (byte-pair halves, 2 normals/word), "u8" (single-byte
    uniform deviates, 4/word — cheapest), or "bm" (Box-Muller, exact
    Gaussian, ~2x slower)."""
    if dist == "bm":
        us = hash_uniforms(word, step, origin, region, domain,
                           2 * _NPAIR, dtype)
        return _bm_normals(us, dtype)
    if dist == "clt2":
        ws = hash_words(word, step, origin, region, domain, _NPAIR)
        pairs = [_clt2_pair(w, dtype) for w in ws]
        return [p[0] for p in pairs], [p[1] for p in pairs]
    if dist == "u8":
        ws = hash_words(word, step, origin, region, domain,
                        (2 * _NPAIR + 3) // 4)
        n = [d for w in ws for d in _u8_quad(w, dtype)][:2 * _NPAIR]
        return n[0::2], n[1::2]
    ws = hash_words(word, step, origin, region, domain, 2 * _NPAIR)
    n = [_clt4_normal(w, dtype) for w in ws]
    return n[0::2], n[1::2]


# ---------------------------------------------------------------------------
# One K = collide o stream update on an (nx, ny, Z) region.
# ---------------------------------------------------------------------------

def _k_compute(params: LBMParams, read_f, read_g, nx, ny, normals,
               transform, mmat_ref, minv_ref, dtype, ref_rp=None):
    """Pure compute of one K on an (nx, ny, Z) region.

    read_f/read_g(idx, x0, w, y0, h): population idx of the INPUT
    (post-collide) state on the rectangle [x0, x0+w) x [y0, y0+h) x Z in
    region coordinates (x0/y0 may reach down to -2: one K consumes a
    2-cell halo).  normals: (n1, n2) per-pair lists on the region, or
    None when noise is off.  ref_rp: optional (rho_ref, phi_ref) region
    arrays — the USE_REF_STATE path (LBM_binary.H:92-106): noise
    amplitudes evaluated at the COM-rolled stored equilibrium state
    instead of the instantaneous densities.  Returns (f_pops, g_pops)
    lists of 19 (nx, ny, Z) arrays — the post-collide output on the
    region.

    Physics: streamed moments -> SC force (LBM_binary.H:254-255) ->
    real-velocity reconstruction (LBM_binary.H:266-272) -> barycentric
    equilibrium + Guo forcing moments -> MRT relax + noise kick
    (LBM_binary.H:504-511).
    """
    has_a1 = params.alpha1 != 0.0
    has_force = params.alpha0 != 0.0 or has_a1
    noise_on = normals is not None

    def fs(read, idx, t):
        """population idx of the streamed state on the window with
        t halo cells: value at cell x is input[idx, x - c]."""
        cx, cy, cz = int(C[idx, 0]), int(C[idx, 1]), int(C[idx, 2])
        sl = read(idx, -t - cx, nx + 2 * t, -t - cy, ny + 2 * t)
        return _roll_z(sl, cz)

    def center(arr1):
        """ext1 window -> region interior."""
        return arr1[1:1 + nx, 1:1 + ny, :]

    # streamed region populations (list of 19 arrays per species)
    fsl = [fs(read_f, idx, 0) for idx in range(Q)]
    gsl = [fs(read_g, idx, 0) for idx in range(Q)]

    if has_force:
        # densities on the t-extended region (t=1 for the gradient
        # stencil; t=2 when the alpha1 grad-laplacian needs psi on ext2)
        ext_t = 2 if has_a1 else 1

        def density_ext(read, t):
            acc = fs(read, 0, t)
            for idx in range(1, Q):
                acc = acc + fs(read, idx, t)
            return acc

        rho_t = density_ext(read_f, ext_t)
        phi_t = density_ext(read_g, ext_t)
        if has_a1:
            # ext2 -> ext1 views (elementwise sums: bitwise identical
            # to summing on ext1 directly)
            rho1 = rho_t[1:-1, 1:-1, :]
            phi1 = phi_t[1:-1, 1:-1, :]
        else:
            rho1 = rho_t
            phi1 = phi_t
        if params.use_sc_pseudo:
            n0 = params.sc_ref_density
            psi_rho_t = n0 * (1.0 - jnp.exp(-rho_t / n0))
            psi_phi_t = n0 * (1.0 - jnp.exp(-phi_t / n0))
        else:
            psi_rho_t, psi_phi_t = rho_t, phi_t
        if has_a1:
            psi_rho1 = psi_rho_t[1:-1, 1:-1, :]
            psi_phi1 = psi_phi_t[1:-1, 1:-1, :]
        else:
            psi_rho1, psi_phi1 = psi_rho_t, psi_phi_t
        rho = center(rho1)
        phi = center(phi1)
        psi_rho = center(psi_rho1)
        psi_phi = center(psi_phi1)

        # 19-point isotropic gradient of a field given on ext1
        def gradient(ps1):
            gx = gy = gz = None
            for idx in range(1, Q):
                cx, cy, cz = (int(C[idx, 0]), int(C[idx, 1]),
                              int(C[idx, 2]))
                w = float(W[idx] / CS2)
                nb = _roll_z(
                    ps1[1 + cx:1 + cx + nx, 1 + cy:1 + cy + ny, :],
                    -cz)
                if cx:
                    gx = (w * cx) * nb if gx is None \
                        else gx + (w * cx) * nb
                if cy:
                    gy = (w * cy) * nb if gy is None \
                        else gy + (w * cy) * nb
                if cz:
                    gz = (w * cz) * nb if gz is None \
                        else gz + (w * cz) * nb
            return gx, gy, gz

        if params.alpha0 != 0.0:
            grad_phi = gradient(psi_phi1)
            grad_rho = gradient(psi_rho1)

        if has_a1:
            # 19-point lattice laplacian ext2 -> ext1 (ops/stencil.py
            # laplacian: lap psi = (2/cs^2) sum_i w_i (psi(x+c_i) - psi))
            def lap_ext1(ps2):
                acc = None
                wsum = 0.0
                for idx in range(1, Q):
                    cx, cy, cz = (int(C[idx, 0]), int(C[idx, 1]),
                                  int(C[idx, 2]))
                    w = float(W[idx])
                    nb = _roll_z(
                        ps2[1 + cx:1 + cx + nx + 2,
                            1 + cy:1 + cy + ny + 2, :], -cz)
                    acc = w * nb if acc is None else acc + w * nb
                    wsum += w
                cpsi = ps2[1:1 + nx + 2, 1:1 + ny + 2, :]
                return (2.0 / CS2) * (acc - wsum * cpsi)

            # grad(laplacian(psi)) — the alpha1 square-gradient force
            # (grad_laplacian_2nd, LBM_binary.H:170-194); psi applies to
            # the innermost field only (ops/stencil.py grad_laplacian)
            gl_phi = gradient(lap_ext1(psi_phi_t))
            gl_rho = gradient(lap_ext1(psi_rho_t))
    else:
        rho = None  # computed from moments below
        phi = None

    # Exact relaxation (tau = 1/2 -> lambda_bar = 1, the default of every
    # reference recipe): the collision replaces ALL non-conserved moments
    # by m_eq + forcing + noise, so the streamed state's stress/ghost
    # moments are never consumed — the forward transform shrinks to the
    # four conserved rows and (deterministic case) the back transform
    # elides the identically-zero ghost rows.
    exact_relax = (not FORCE_GENERAL_RELAX
                   and params.tau_f == 0.5 and params.tau_g == 0.5)
    nrows = 4 if exact_relax else Q

    # moments: unrolled adds (VPU), parity-paired adds ("eo"), factored
    # parity-paired adds ("eof", default; "eofc" adds the compensated
    # mass row), or 19x19 matmul (MXU)
    if transform in ("eof", "eofc"):
        mom = _eof_mom_c if exact_relax else _eof_mom
    elif transform == "mxu":
        def mom(pops):
            x = jnp.stack(pops)
            m4 = jax.lax.dot_general(
                mmat_ref[:][:nrows], x, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return [m4[k] for k in range(nrows)]
    elif transform == "eo":
        def mom(pops):
            sp = [pops[i] + pops[j] for i, j in _PAIRS]
            dp = [pops[i] - pops[j] for i, j in _PAIRS]
            out = []
            for k in range(nrows):
                if _ROW_EVEN[k]:
                    c0 = float(M[k, 0])
                    acc = None if c0 == 0.0 else (
                        pops[0] if c0 == 1.0 else c0 * pops[0])
                    src = sp
                else:
                    acc = None
                    src = dp
                for p, (i, _) in enumerate(_PAIRS):
                    c = float(M[k, i])
                    if c == 0.0:
                        continue
                    t = src[p] if c == 1.0 else (
                        -src[p] if c == -1.0 else c * src[p])
                    acc = t if acc is None else acc + t
                out.append(acc)
            return out
    else:
        def mom(pops):
            out = []
            for k in range(nrows):
                acc = None
                for idx in range(Q):
                    c = float(M[k, idx])
                    if c == 0.0:
                        continue
                    t = pops[idx] if c == 1.0 else (
                        -pops[idx] if c == -1.0 else c * pops[idx])
                    acc = t if acc is None else acc + t
                out.append(acc)
            return out

    mf = mom(fsl)
    mg = mom(gsl)
    if transform == "eofc":
        # pin the mass row to the compensated (coherence-free) sum of
        # the streamed populations; the back transform's telescoping
        # then stores exactly this mass (see _comp_sum docstring)
        mf[0] = _comp_sum(fsl)
        mg[0] = _comp_sum(gsl)
    if rho is None:
        rho = mf[0]
        phi = mg[0]

    eps = params.div_eps

    def safe_inv(x):
        ok = jnp.abs(x) > eps
        return jnp.where(ok, 1.0 / jnp.where(ok, x, 1.0), 0.0)

    inv_rho = safe_inv(rho)
    inv_phi = safe_inv(phi)

    ufb = [mf[1] * inv_rho, mf[2] * inv_rho, mf[3] * inv_rho]
    ugb = [mg[1] * inv_phi, mg[2] * inv_phi, mg[3] * inv_phi]

    if has_force:
        a0 = params.alpha0
        if a0 != 0.0:
            af = [-CS2 * a0 * psi_rho * g * inv_rho for g in grad_phi]
            ag = [-CS2 * a0 * psi_phi * g * inv_phi for g in grad_rho]
        if has_a1:
            a1c = params.alpha1
            if a0 != 0.0:
                af = [v - CS2 * a1c * g for v, g in zip(af, gl_phi)]
                ag = [v - CS2 * a1c * g for v, g in zip(ag, gl_rho)]
            else:
                af = [-CS2 * a1c * g for g in gl_phi]
                ag = [-CS2 * a1c * g for g in gl_rho]

    # ----------------------- noise amplitudes x normals -----------
    lam_f = params.lam_f
    lam_g = params.lam_g
    if noise_on:
        n1, n2 = normals
        kBT = params.kBT
        pref_f = 2.0 * (lam_f - 0.5 * lam_f * lam_f) * kBT
        pref_g = 2.0 * (lam_g - 0.5 * lam_g * lam_g) * kBT
        # USE_REF_STATE: amplitudes from the stored (rolled) equilibrium
        # densities; otherwise from the live streamed mass moments
        # (== the jnp path's pre-collide hydro in K-space).
        a_rho, a_phi = ref_rp if ref_rp is not None else (rho, phi)
        amp_mom = jnp.sqrt(
            pref_f * jnp.abs(a_rho * a_phi * safe_inv(a_rho + a_phi)))
        sq_rho = jnp.sqrt(jnp.abs(a_rho))
        sq_phi = jnp.sqrt(jnp.abs(a_phi))

        def normal(a):
            return n1[a // 2] if a % 2 == 0 else n2[a // 2]

        region_shape = (nx, ny) + fsl[0].shape[2:]
        xi_f = [jnp.zeros(region_shape, dtype)]
        xi_g = [jnp.zeros(region_shape, dtype)]
        for a in range(1, 4):
            m_ = amp_mom * normal(a - 1)
            xi_f.append(m_)
            xi_g.append(-m_)
        for a in range(4, Q):
            cf = float(np.sqrt(pref_f / CS2 * B[a]))
            cg = float(np.sqrt(pref_g / CS2 * B[a]))
            xi_f.append(cf * sq_rho * normal(3 + (a - 4)))
            xi_g.append(cg * sq_phi * normal(18 + (a - 4)))
    else:
        xi_f = None
        xi_g = None

    # ------------------------- real velocities (LBM_binary.H:266-272)
    rhot = rho + phi
    inv_rhot = safe_inv(rhot)
    wf = phi * inv_rhot
    wg = rho * inv_rhot

    uf = []
    ug = []
    for d in range(3):
        dud = ufb[d] - ugb[d]
        if has_force:
            dud = dud + 0.5 * (af[d] - ag[d])
        uf_d = ufb[d] - 0.5 * lam_f * wf * dud
        ug_d = ugb[d] + 0.5 * lam_g * wg * dud
        if has_force:
            uf_d = uf_d + 0.5 * af[d]
            ug_d = ug_d + 0.5 * ag[d]
        if noise_on:
            uf_d = uf_d + 0.5 * xi_f[1 + d] * inv_rho
            ug_d = ug_d + 0.5 * xi_g[1 + d] * inv_phi
        uf.append(uf_d)
        ug.append(ug_d)

    vb = [(rho * uf[d] + phi * ug[d]) * inv_rhot for d in range(3)]

    # ------------------------------------- equilibrium + force moments
    def meq(n, u):
        u2 = u[0] * u[0] + u[1] * u[1] + u[2] * u[2]
        return [
            n,
            n * u[0], n * u[1], n * u[2],
            n * u2,
            n * (3.0 * u[0] * u[0] - u2),
            n * (u[1] * u[1] - u[2] * u[2]),
            n * u[0] * u[1], n * u[1] * u[2], n * u[0] * u[2],
        ]

    def phim(n, u, a, tau):
        s = 1.0 / (1.0 + 1.0 / (2.0 * tau))
        au = a[0] * u[0] + a[1] * u[1] + a[2] * u[2]
        return [
            None,
            s * n * a[0], s * n * a[1], s * n * a[2],
            s * 2.0 * n * au,
            s * n * (6.0 * a[0] * u[0] - 2.0 * au),
            s * 2.0 * n * (a[1] * u[1] - a[2] * u[2]),
            s * n * (a[0] * u[1] + a[1] * u[0]),
            s * n * (a[1] * u[2] + a[2] * u[1]),
            s * n * (a[0] * u[2] + a[2] * u[0]),
        ]

    mf_eq = meq(rho, vb)
    mg_eq = meq(phi, vb)
    if has_force:
        ph_f = phim(rho, uf, af, params.tau_f)
        ph_g = phim(phi, ug, ag, params.tau_g)

    inv_tf = 1.0 / (params.tau_f + 0.5)
    inv_tg = 1.0 / (params.tau_g + 0.5)
    if exact_relax:
        # lambda_bar = 1: post-collide = m_eq (+ Guo forcing + noise);
        # ghost rows are pure noise — None when noise is off, which the
        # back transforms below elide.  Mass row: m_eq[0] == the streamed
        # mass (rho IS mf[0] on the no-force path), no noise.
        def post(meq_l, ph_l, xi_l):
            out = [meq_l[0]]
            for k in range(1, 10):
                v = meq_l[k]
                if ph_l is not None:
                    v = v + ph_l[k]
                if xi_l is not None:
                    v = v + xi_l[k]
                out.append(v)
            for k in range(10, Q):
                out.append(xi_l[k] if xi_l is not None else None)
            return out

        mf = post(mf_eq, ph_f if has_force else None, xi_f)
        mg = post(mg_eq, ph_g if has_force else None, xi_g)
    else:
        for k in range(Q):
            rf = (inv_tf * (mf_eq[k] - mf[k]) if k < 10
                  else -inv_tf * mf[k])
            rg = (inv_tg * (mg_eq[k] - mg[k]) if k < 10
                  else -inv_tg * mg[k])
            if has_force and 1 <= k < 10:
                rf = rf + ph_f[k]
                rg = rg + ph_g[k]
            mf[k] = mf[k] + rf
            mg[k] = mg[k] + rg
            if noise_on:
                mf[k] = mf[k] + xi_f[k]
                mg[k] = mg[k] + xi_g[k]

    # ------------------------------------------------- back transform
    #
    # Exact-mass formulation (same rationale as ops/collide.py): the
    # back transform's f32 rounding is coherent across near-identical
    # cells and biases total mass by ~+1.5e-8/step, i.e. +1.5% over an
    # 800k-step production run (ACCEPTANCE.md C-model).  The rest
    # population is therefore computed by TELESCOPING,
    #     f_0 = m_0 - sum_{i>=1} f_i,
    # which pins the cell's stored mass to the post-collide mass moment
    # up to a single (sign-varying) rounding instead of the coherent
    # 19-term accumulation — and is cheaper than correcting after the
    # fact (skips the M_INV row-0 contraction).
    # None rows (deterministic exact-relaxation ghosts) are elided.
    if transform in ("eof", "eofc"):
        def pops_from(mom_list):
            if mom_list[10] is None:
                return _eof_pops_c10(mom_list)
            return _eof_pops(mom_list)
    elif transform == "mxu":
        def pops_from(mom_list):
            rows = [m_ for m_ in mom_list if m_ is not None]
            nr = len(rows)
            m4 = jnp.stack(rows)
            r = jax.lax.dot_general(
                minv_ref[:][:, :nr], m4, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            out = [None] + [r[idx] for idx in range(1, Q)]
            s = None
            for idx in range(1, Q):
                s = out[idx] if s is None else s + out[idx]
            out[0] = mom_list[0] - s
            return out
    elif transform == "eo":
        def pops_from(mom_list):
            out = [None] * Q
            for i, j in _PAIRS:
                ev = od = None
                for k in range(Q):
                    c = float(M_INV[i, k])
                    if c == 0.0 or mom_list[k] is None:
                        continue
                    t = c * mom_list[k]
                    if _ROW_EVEN[k]:
                        ev = t if ev is None else ev + t
                    else:
                        od = t if od is None else od + t
                out[i] = ev + od
                out[j] = ev - od
            s = None
            for i, j in _PAIRS:
                ps = out[i] + out[j]
                s = ps if s is None else s + ps
            out[0] = mom_list[0] - s
            return out
    else:
        def pops_from(mom_list):
            out = [None] * Q
            for idx in range(1, Q):
                acc = None
                for k in range(Q):
                    c = float(M_INV[idx, k])
                    if c == 0.0 or mom_list[k] is None:
                        continue
                    t = c * mom_list[k]
                    acc = t if acc is None else acc + t
                out[idx] = acc
            s = None
            for idx in range(1, Q):
                s = out[idx] if s is None else s + out[idx]
            out[0] = mom_list[0] - s
            return out

    return pops_from(mf), pops_from(mg)


def _step_kernel(params: LBMParams, shape, gdomain, bx, by, block,
                 noise_on, mode, transform, noise_impl, noise_dist,
                 ext_mode, use_ref, win, owin, has_alias, wrap_y,
                 ystrips, mmat_ref, minv_ref, seed_ref,
                 fc_hbm, gc_hbm, *hbm_rest):
    """Grid program: `block` K-steps on one (bx, by, Z) interior tile.

    Cross-grid-step double buffering: while tile t computes, tile t+1's
    halo fragments stream into the alternate ext buffers and tile t-2's
    result DMA drains from the alternate out buffers — input, compute,
    and output phases overlap (the unpipelined version ran at ~230 GB/s
    effective HBM bandwidth; this hides most of the DMA time).

    ext_mode: the input arrays are a local shard block already extended
    by (2*block, _PY) halo cells per side (halos exchanged via ppermute
    in :mod:`bflbm_tpu.parallel.kernel`), so every load is a single
    contiguous fragment with no periodic wrap; seed_ref carries the
    shard's global origin for the coordinate-keyed noise; `gdomain` is
    the global domain shape (== `shape` in single-device mode).

    use_ref: a third streamed input — the (2, X, Y, Z) COM-rolled
    (rho_eq, phi_eq) stack — rides the same tiling/DMA pipeline as
    f/g (channel depth 2 instead of 19, ~5% extra HBM traffic) and
    feeds the noise amplitudes (USE_REF_STATE, LBM_binary.H:92-106).

    win: static (wx0, wy0) window origin into the (larger) ext-mode
    input arrays — the kernel computes the `shape`-sized window whose
    ext block starts at input index (wx0 + i*bx, wy0 + j*by).  This is
    what lets the ICI-overlap seam-band calls read the exchanged block
    DIRECTLY instead of consuming XLA-materialized slices (each band
    slice used to cost an extra read+write of ~3x the band's cells —
    the dominant term in the r3 +21.4% split penalty).  wy0 must be
    8-aligned (Mosaic sublane fragments).

    owin/has_alias: static (ox0, oy0) window origin into LARGER output
    arrays — the kernel writes only its `shape`-sized window, leaving
    the rest untouched.  The interior split call declares the full
    local block as out_shape (pallas outputs are uninitialized — the
    unwritten cells cost nothing) and each seam-band call then writes
    its band IN PLACE via input_output_aliases (has_alias: the two
    aliased operand refs precede the outputs in hbm_rest and are
    ignored — they are the same buffers).  This removes the split
    path's output concatenates, which materialized a full local
    read+write per sweep (~130 B/cell — the dominant split cost after
    the slice fix; measured +36% deterministic).
    """
    alias_skip = 2 if has_alias else 0
    rest = list(hbm_rest)
    strips_in = ([rest.pop(0) for _ in range(4)] if ystrips else None)
    ref_hbm = rest.pop(0) if use_ref else None
    outs = rest[alias_skip:]
    fout_hbm, gout_hbm = outs[0], outs[1]
    strip_outs = outs[2:6] if ystrips else None
    X, Y, Z = shape
    gx, gy = X // bx, Y // by
    n_tiles = gx * gy
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * gy + j
    # stencil depth per K: streaming consumes 1 neighbor cell; the
    # Shan-Chen force gradient (alpha0 != 0) consumes a 2nd.  The
    # uncoupled case (every fluctuating headline config) therefore
    # needs only a block-deep halo — half the x re-reads and a
    # QUARTER of the phase-0 seam-band (hash-noise) area vs the old
    # hardwired 2*block.
    sd = sd_depth(params)
    if sd * block > _PY:
        raise ValueError(
            f"sd*block = {sd * block} exceeds the {_PY}-row y pad "
            f"(Mosaic sublane alignment): cap block at {_PY // sd} for "
            f"stencil depth {sd} (alpha1 != 0 runs sd=3)")
    px, py = sd * block, _PY
    exb, eyb = bx + 2 * px, by + 2 * py
    wx0, wy0 = win
    ox0_, oy0_ = owin
    assert (win == (0, 0) and owin == (0, 0)) or ext_mode, \
        "win/owin require ext_mode"
    assert wy0 % 8 == 0 and oy0_ % 8 == 0, \
        "window y origins must be sublane-aligned"
    # wrap_y: the kernel itself maintains the output's _PY-deep y pad
    # slabs with PERIODIC wrap data — y-edge tiles issue one extra
    # 8-row-aligned out DMA into the opposite pad (tile jj == 0 writes
    # its rows [0, _PY) to the HIGH pad; jj == gy-1 writes rows
    # [by-_PY, by) to the LOW pad).  For meshes with y UNSHARDED (every
    # 1-D production mesh: kernels/session permutes sharded z onto x)
    # this replaces the per-sweep y halo exchange entirely, whose 2-row
    # strided slice/DUS ops measured ~0.92 ms/step at 256^3 — the
    # dominant sharded-path residual (benchmarks/results/shard_r4e.json).
    # The extra write rides the overlapped out-DMA phase.
    assert not wrap_y or (ext_mode and oy0_ == _PY and not has_alias), \
        "wrap_y needs the y-padded serial-sweep layout"
    # ystrips (round 5, VERDICT r4 #2 — FillBoundary any-decomposition,
    # main_run_job.cpp:140-143): for Y-SHARDED meshes the _PY-deep ext
    # y edges stream from four SEPARATE strip operands (the ppermuted
    # neighbor edge rows) instead of the main buffer's pads, and the
    # row-edge tiles write their interior edge rows into compact strip
    # OUTPUT buffers for the next sweep's ppermute — the 2-row strided
    # slice/DUS ops of the old y exchange (~0.92 ms/step at 256^3,
    # shard_r4e.json) disappear; the extra strip out-DMAs ride the
    # overlapped out-DMA phase exactly like wrap_y's pad writes.  The
    # main buffer's own y pads are stale in this mode and never read.
    assert not ystrips or (ext_mode and oy0_ == _PY and wy0 == 0
                           and not has_alias and not wrap_y), \
        "ystrips needs the y-padded serial-sweep layout"

    xsizes = (px, bx, px)
    ysizes = (py, by, py)

    # sweep mode: BY a multiple of _PY makes the sliding fresh load an
    # aligned y-slab (two fragments at the row wrap when BY > _PY); the
    # 2*_PY overlap columns are carried between consecutive y-tiles as a
    # VMEM copy, removing the y-halo re-reads entirely.
    sweep = (by % py == 0 and gy >= 2 and mode != "tiles")

    def body(ext_f2, ext_g2, out_f2, out_g2, sems_in, sems_out,
             ext_r2=None):
        in_srcs = (fc_hbm, gc_hbm) + ((ref_hbm,) if use_ref else ())

        def in_dsts():
            return (ext_f2, ext_g2) + ((ext_r2,) if use_ref else ())

        def _ext_y_frags(jj, ycase):
            """Strips-mode y decomposition of a tile's eyb-deep ext
            range: (src kind 0=buffer, 1=strip_lo, 2=strip_hi, src_y,
            dst_y, rows).  The buffer's own y pads are never read (they
            are stale in strips mode) — the _PY edge slabs stream from
            the strip operands.  All sizes/offsets stay 8-aligned
            (by % _PY == 0)."""
            if ycase == "only":     # gy == 1: both edges from strips
                return ((1, 0, 0, _PY), (0, _PY, _PY, by),
                        (2, 0, _PY + by, _PY))
            if ycase == "lo":       # jj == 0
                return ((1, 0, 0, _PY), (0, _PY, _PY, by + _PY))
            if ycase == "hi":       # jj == gy - 1
                return ((0, jj * by, 0, by + _PY),
                        (2, 0, by + _PY, _PY))
            return ((0, jj * by, 0, eyb),)      # interior row

        def in_copies_full(tt, slot, ycase=None):
            """All halo fragments for tile tt (row starts / tiles mode):
            9 wrapped fragments in periodic mode, 1 contiguous block in
            ext (pre-extended shard) mode; with y strips the _PY-deep
            ext y edges come from the separate strip operands (ycase
            picks the static fragment decomposition for this tile's row
            position — see _ext_y_frags)."""
            ii = tt // gy
            jj = tt - ii * gy
            cps = []
            if ext_mode:
                xsl = pl.ds(wx0 + ii * bx, exb)
                for k, (src, dst) in enumerate(zip(in_srcs, in_dsts())):
                    if ystrips and k < 2:
                        lo_s, hi_s = (strips_in[2 * k],
                                      strips_in[2 * k + 1])
                        for kind, sy, dy, n_ in _ext_y_frags(jj, ycase):
                            arr = (src, lo_s, hi_s)[kind]
                            cps.append(pltpu.make_async_copy(
                                arr.at[:, xsl,
                                       pl.ds(pl.multiple_of(sy, 8), n_),
                                       :],
                                dst.at[slot, :, :, pl.ds(dy, n_), :],
                                sems_in.at[slot, len(cps)],
                            ))
                        continue
                    cps.append(pltpu.make_async_copy(
                        src.at[:, xsl,
                               pl.ds(pl.multiple_of(wy0 + jj * by, 8),
                                     eyb), :],
                        dst.at[slot],
                        sems_in.at[slot, len(cps)],
                    ))
                return cps
            xs = _mod_starts(ii, bx, px, X)
            ys = _mod_starts(jj, by, py, Y)
            ys = tuple(pl.multiple_of(y, 8) for y in ys)
            for src, dst in zip(in_srcs, in_dsts()):
                dx = 0
                for a in range(3):
                    dy = 0
                    for b in range(3):
                        cps.append(pltpu.make_async_copy(
                            src.at[:, pl.ds(xs[a], xsizes[a]),
                                   pl.ds(ys[b], ysizes[b]), :],
                            dst.at[slot, :, pl.ds(dx, xsizes[a]),
                                   pl.ds(dy, ysizes[b]), :],
                            sems_in.at[slot, len(cps)],
                        ))
                        dy += ysizes[b]
                    dx += xsizes[a]
            return cps

        def in_copies_fresh(tt, slot, frags, ycase=None):
            """Sliding-mode load: only the fresh trailing y-slab (width
            BY) for the 3 x fragments; the leading 2*_PY columns are
            VMEM-copied from the previous tile.

            fresh slab = ext columns [2*PY, 2*PY+BY) = absolute y range
            [y1 + PY, y1 + PY + BY), y1 = jj*BY.  For BY > PY the last
            tile of a row wraps: frags selects the unwrapped (1) or
            wrapped (2) fragment decomposition (both static shapes).
            With y strips the LAST tile of a row (ycase="hi") sources
            its trailing _PY rows from the strip_hi operand.
            """
            ii = tt // gy
            jj = tt - ii * gy
            cps = []
            if ext_mode:
                xsl = pl.ds(wx0 + ii * bx, exb)
                for k, (src, dst) in enumerate(zip(in_srcs, in_dsts())):
                    if ystrips and k < 2 and ycase == "hi":
                        hi_s = strips_in[2 * k + 1]
                        if by > _PY:
                            cps.append(pltpu.make_async_copy(
                                src.at[:, xsl,
                                       pl.ds(pl.multiple_of(
                                           jj * by + 2 * py, 8),
                                           by - _PY), :],
                                dst.at[slot, :, :,
                                       pl.ds(2 * py, by - _PY), :],
                                sems_in.at[slot, len(cps)],
                            ))
                        cps.append(pltpu.make_async_copy(
                            hi_s.at[:, xsl, :, :],
                            dst.at[slot, :, :,
                                   pl.ds(2 * py + by - _PY, _PY), :],
                            sems_in.at[slot, len(cps)],
                        ))
                        continue
                    cps.append(pltpu.make_async_copy(
                        src.at[:, xsl,
                               pl.ds(pl.multiple_of(
                                   wy0 + jj * by + 2 * py, 8), by), :],
                        dst.at[slot, :, :, pl.ds(2 * py, by), :],
                        sems_in.at[slot, len(cps)],
                    ))
                return cps
            xs = _mod_starts(ii, bx, px, X)
            ys0 = pl.multiple_of(
                jax.lax.rem((jj * by + py), jnp.int32(Y)), 8)
            if frags == 1:
                yparts = ((ys0, 2 * py, by),)
            else:
                # wrap at the row end: [Y-PY, Y) then [0, BY-PY)
                yparts = ((pl.multiple_of(Y - py, 8), 2 * py, py),
                          (0, 2 * py + py, by - py))
            for src, dst in zip(in_srcs, in_dsts()):
                dx = 0
                for a in range(3):
                    for (ys, dy, ny) in yparts:
                        cps.append(pltpu.make_async_copy(
                            src.at[:, pl.ds(xs[a], xsizes[a]),
                                   pl.ds(ys, ny), :],
                            dst.at[slot, :, pl.ds(dx, xsizes[a]),
                                   pl.ds(dy, ny), :],
                            sems_in.at[slot, len(cps)],
                        ))
                    dx += xsizes[a]
            return cps

        def carry_overlap(src_slot, dst_slot):
            """ext columns [BY, BY+2*PY) of the current tile = columns
            [0, 2*PY) of the next tile (VMEM copy)."""
            ext_f2[dst_slot, :, :, 0:2 * py, :] = \
                ext_f2[src_slot, :, :, by:by + 2 * py, :]
            ext_g2[dst_slot, :, :, 0:2 * py, :] = \
                ext_g2[src_slot, :, :, by:by + 2 * py, :]
            if use_ref:
                ext_r2[dst_slot, :, :, 0:2 * py, :] = \
                    ext_r2[src_slot, :, :, by:by + 2 * py, :]

        def full_cases(tt, slot, start):
            """in_copies_full with the per-row-position strip fragment
            cases branched on tt's row index (tiles-mode loads when y
            strips are active; start=False waits instead)."""
            def go(case):
                for cp in in_copies_full(tt, slot, case):
                    (cp.start if start else cp.wait)()
            if not ystrips:
                go(None)
                return
            if gy == 1:
                go("only")
                return
            jj = jax.lax.rem(tt, jnp.int32(gy))

            @pl.when(jj == 0)
            def _():
                go("lo")

            @pl.when(jnp.logical_and(jj != 0, jj != gy - 1))
            def _():
                go("mid")

            @pl.when(jj == gy - 1)
            def _():
                go("hi")

        def out_copies(tt, slot):
            ii = tt // gy
            jj = tt - ii * gy
            cps = []
            for si, dst in enumerate((fout_hbm, gout_hbm)):
                src = out_f2 if si == 0 else out_g2
                cps.append(pltpu.make_async_copy(
                    src.at[slot],
                    dst.at[:, pl.ds(ox0_ + ii * bx, bx),
                           pl.ds(pl.multiple_of(oy0_ + jj * by, 8),
                                 by), :],
                    sems_out.at[slot, si],
                ))
            return cps

        def pad_copies(tt, slot, hi_pad):
            """wrap_y extra out DMAs (see the wrap_y note above):
            hi_pad=True copies the tile's LOW _PY rows into the output's
            HIGH pad slab (rows [oy0_ + Y, oy0_ + Y + _PY)); hi_pad=False
            copies its HIGH _PY rows into the LOW pad (rows [0, _PY)).
            All offsets static-8-aligned; same x range as the main copy."""
            ii = tt // gy
            src_y = 0 if hi_pad else by - _PY
            dst_y = oy0_ + Y if hi_pad else 0
            cps = []
            for si, dst in enumerate((fout_hbm, gout_hbm)):
                src = out_f2 if si == 0 else out_g2
                cps.append(pltpu.make_async_copy(
                    src.at[slot, :, :, pl.ds(src_y, _PY), :],
                    dst.at[:, pl.ds(ox0_ + ii * bx, bx),
                           pl.ds(dst_y, _PY), :],
                    sems_out.at[slot, (2 if hi_pad else 4) + si],
                ))
            return cps

        def start_pad_copies(tt, slot):
            jj = jax.lax.rem(tt, jnp.int32(gy))

            @pl.when(jj == 0)
            def _():
                for cp in pad_copies(tt, slot, True):
                    cp.start()

            @pl.when(jj == gy - 1)
            def _():
                for cp in pad_copies(tt, slot, False):
                    cp.start()

        def wait_pad_copies(tt, slot):
            jj = jax.lax.rem(tt, jnp.int32(gy))

            @pl.when(jj == 0)
            def _():
                for cp in pad_copies(tt, slot, True):
                    cp.wait()

            @pl.when(jj == gy - 1)
            def _():
                for cp in pad_copies(tt, slot, False):
                    cp.wait()

        def strip_copies(tt, slot, hi_strip):
            """y-strip extra out DMAs (strips mode, see the ystrips note
            above): the row-edge tiles copy their interior edge rows
            into the compact strip OUTPUT buffers that the next sweep's
            ppermute ships to the y neighbors (jj == 0 -> strip_lo_out
            gets rows [0, _PY); jj == gy-1 -> strip_hi_out gets rows
            [by-_PY, by)).  Same x range as the main copy; the strip
            buffers' x pad columns stay unwritten — the sweep's strip
            x-exchange fills them with the diagonal corners."""
            ii = tt // gy
            src_y = by - _PY if hi_strip else 0
            dsts = ((strip_outs[1], strip_outs[3]) if hi_strip
                    else (strip_outs[0], strip_outs[2]))
            cps = []
            for si, dst in enumerate(dsts):
                src = out_f2 if si == 0 else out_g2
                cps.append(pltpu.make_async_copy(
                    src.at[slot, :, :, pl.ds(src_y, _PY), :],
                    dst.at[:, pl.ds(ox0_ + ii * bx, bx), :, :],
                    sems_out.at[slot, (2 if hi_strip else 4) + si],
                ))
            return cps

        def start_strip_copies(tt, slot):
            jj = jax.lax.rem(tt, jnp.int32(gy))

            @pl.when(jj == 0)
            def _():
                for cp in strip_copies(tt, slot, False):
                    cp.start()

            @pl.when(jj == gy - 1)
            def _():
                for cp in strip_copies(tt, slot, True):
                    cp.start()

        def wait_strip_copies(tt, slot):
            jj = jax.lax.rem(tt, jnp.int32(gy))

            @pl.when(jj == 0)
            def _():
                for cp in strip_copies(tt, slot, False):
                    cp.wait()

            @pl.when(jj == gy - 1)
            def _():
                for cp in strip_copies(tt, slot, True):
                    cp.wait()

        slot = jax.lax.rem(t, jnp.int32(2))
        nslot = jax.lax.rem(t + 1, jnp.int32(2))

        case0 = (("only" if gy == 1 else "lo") if ystrips else None)

        @pl.when(t == 0)
        def _():
            for cp in in_copies_full(0, 0, case0):
                cp.start()

        # issue next tile's row-start / tiles-mode loads as early as
        # possible (they don't depend on this tile's data)
        if not sweep:
            @pl.when(t + 1 < n_tiles)
            def _():
                full_cases(t + 1, nslot, True)
        else:
            jj1 = jax.lax.rem(t + 1, jnp.int32(gy))
            jj0 = jax.lax.rem(t, jnp.int32(gy))
            # last tile of a row needs a 2-frag fresh load (periodic only)
            wraps = by > py and not ext_mode
            # sweep mode implies gy >= 2, so a row-start load is the
            # "lo" strip case and never "only"
            case_row = "lo" if ystrips else None

            @pl.when(jnp.logical_and(t + 1 < n_tiles, jj1 == 0))
            def _():
                for cp in in_copies_full(t + 1, nslot, case_row):
                    cp.start()

        # ---------------- input-independent noise normals -------------
        # Phase-0 normals are generated BEFORE the DMA waits: the
        # hash/PRNG + Box-Muller work fills the core's otherwise-idle
        # DMA stall.
        dtype = fout_hbm.dtype
        # seed layout: [word_0 .. word_{block-1}, step0, (ox, oy)] — one
        # independently-drawn word per PHYSICAL step, so the hash noise
        # stream is bitwise identical across block sizes (the key
        # trajectory advances once per step in fused_stream_collide /
        # parallel.kernel regardless of blocking).
        step0 = seed_ref[block]
        # shard origin (global coords of local cell (0, 0)): nonzero only
        # under the shard_map path
        ox0 = seed_ref[block + 1] if ext_mode else jnp.int32(0)
        oy0 = seed_ref[block + 2] if ext_mode else jnp.int32(0)
        phase_normals = [None] * block

        def hw_normals(s, shape_hw):
            """Per-tile hardware-PRNG normals on `shape_hw`.  Seed
            space: (random word + global-tile hash, step) — a single
            32-bit word would birthday-collide over the 1e6-step
            production presets; Mosaic caps prng_seed at 2 words, so
            the global tile origin is folded into the random word by an
            odd-multiplier (injective) hash.  Global (not grid-local)
            coordinates keep shard streams distinct under shard_map;
            step0+s keeps the per-phase streams distinct."""
            gtile = (ox0 + i * bx) * jnp.int32(gdomain[1]) \
                + (oy0 + j * by)
            pltpu.prng_seed(seed_ref[s] + gtile * jnp.int32(-1640531527),
                            step0 + s)
            if noise_dist == "clt2":
                bits = pltpu.prng_random_bits((_NPAIR,) + shape_hw)
                pairs = [_clt2_pair(pltpu.bitcast(bits[p], jnp.uint32),
                                    dtype)
                         for p in range(_NPAIR)]
                return [p[0] for p in pairs], [p[1] for p in pairs]
            if noise_dist == "u8":
                nw = (2 * _NPAIR + 3) // 4
                bits = pltpu.prng_random_bits((nw,) + shape_hw)
                ns = [d for p in range(nw)
                      for d in _u8_quad(pltpu.bitcast(bits[p], jnp.uint32),
                                        dtype)][:2 * _NPAIR]
                return ns[0::2], ns[1::2]
            bits = pltpu.prng_random_bits((2 * _NPAIR,) + shape_hw)
            if noise_dist == "clt4":
                ns = [_clt4_normal(pltpu.bitcast(bits[a], jnp.uint32),
                                   dtype)
                      for a in range(2 * _NPAIR)]
                return ns[0::2], ns[1::2]
            two_pi = 6.283185307179586
            i24 = pltpu.bitcast(
                pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
            u = i24.astype(dtype) * (1.0 / (1 << 24))
            r_bm = jnp.sqrt(-2.0 * jnp.log(u[:_NPAIR] + (0.5 / (1 << 24))))
            theta = two_pi * u[_NPAIR:]
            n1 = r_bm * jnp.cos(theta)
            n2 = r_bm * jnp.sin(theta)
            return ([n1[p] for p in range(_NPAIR)],
                    [n2[p] for p in range(_NPAIR)])

        def gen_normals(s):
            """Normals for phase s on its compute region.

            Correctness rule: any cell that is (re)computed by more than
            one tile — cells within p_s of a tile boundary, and periodic
            wraps — must draw coordinate-keyed hash noise so every
            computation injects the identical value; cells computed by
            exactly one tile may use the ~1.6x cheaper per-tile hardware
            PRNG.  The final phase (p_s = 0) writes only the interior
            tile, so it is all-HW; non-final phases split seam-band
            (hash) from interior (HW) — "seam-only hash", the lever that
            makes temporal blocking pay in the fluctuating case."""
            p_s = sd * (block - 1 - s)
            region = (bx + 2 * p_s, by + 2 * p_s, Z)
            word = seed_ref[s]
            origin = (ox0 + i * bx - p_s, oy0 + j * by - p_s)
            if s == block - 1 and noise_impl != "hash":
                # final phase: interior-only, never recomputed elsewhere
                return hw_normals(s, region)
            wb = 2 * p_s                      # seam band width per edge
            inx, iny = bx - 2 * p_s, by - 2 * p_s
            if noise_impl == "hash" or noise_dist not in ("clt4", "clt2", "u8") \
                    or inx < 8 or iny < 8:
                # all-hash: decomposition-invariant reference stream
                # (also the fallback when the exclusive interior is too
                # small to be worth a separate PRNG pass)
                return hash_normals(word, step0 + s, origin, region,
                                    gdomain, dtype, noise_dist)
            in1, in2 = hw_normals(s, (inx, iny, Z))
            # seam rectangles (region coords): full-width top/bottom
            # x-bands, then left/right y-bands of the middle rows
            rects = (((0, 0), (wb, region[1])),
                     ((region[0] - wb, 0), (wb, region[1])),
                     ((wb, 0), (inx, wb)),
                     ((wb, region[1] - wb), (inx, wb)))
            rn = []
            for (rx, ry), (rw, rh) in rects:
                ro = (origin[0] + rx, origin[1] + ry)
                rn.append(hash_normals(word, step0 + s, ro, (rw, rh, Z),
                                       gdomain, dtype, noise_dist))
            (t1, t2), (b1, b2), (l1, l2), (r1, r2) = rn

            def paste(top, bot, left, right, inner):
                mid = jnp.concatenate([left, inner, right], axis=1)
                return jnp.concatenate([top, mid, bot], axis=0)

            n1 = [paste(t1[p], b1[p], l1[p], r1[p], in1[p])
                  for p in range(_NPAIR)]
            n2 = [paste(t2[p], b2[p], l2[p], r2[p], in2[p])
                  for p in range(_NPAIR)]
            return n1, n2

        if noise_on:
            phase_normals[0] = gen_normals(0)

        if not sweep:
            full_cases(t, slot, False)
        else:
            # wait this tile's own fragments
            @pl.when(jj0 == 0)
            def _():
                for cp in in_copies_full(t, slot, case_row):
                    cp.wait()

            if wraps:
                @pl.when(jnp.logical_and(jj0 != 0, jj0 != gy - 1))
                def _():
                    for cp in in_copies_fresh(t, slot, 1):
                        cp.wait()

                @pl.when(jj0 == gy - 1)
                def _():
                    for cp in in_copies_fresh(t, slot, 2):
                        cp.wait()
            elif ystrips:
                @pl.when(jnp.logical_and(jj0 != 0, jj0 != gy - 1))
                def _():
                    for cp in in_copies_fresh(t, slot, 1, "mid"):
                        cp.wait()

                @pl.when(jj0 == gy - 1)
                def _():
                    for cp in in_copies_fresh(t, slot, 1, "hi"):
                        cp.wait()
            else:
                @pl.when(jj0 != 0)
                def _():
                    for cp in in_copies_fresh(t, slot, 1):
                        cp.wait()

            # mid-row: carry the overlap then fetch only the fresh slab
            @pl.when(jnp.logical_and(t + 1 < n_tiles, jj1 != 0))
            def _():
                carry_overlap(slot, nslot)

            if wraps:
                @pl.when(jnp.logical_and(
                    t + 1 < n_tiles,
                    jnp.logical_and(jj1 != 0, jj1 != gy - 1)))
                def _():
                    for cp in in_copies_fresh(t + 1, nslot, 1):
                        cp.start()

                @pl.when(jnp.logical_and(t + 1 < n_tiles, jj1 == gy - 1))
                def _():
                    for cp in in_copies_fresh(t + 1, nslot, 2):
                        cp.start()
            elif ystrips:
                @pl.when(jnp.logical_and(
                    t + 1 < n_tiles,
                    jnp.logical_and(jj1 != 0, jj1 != gy - 1)))
                def _():
                    for cp in in_copies_fresh(t + 1, nslot, 1, "mid"):
                        cp.start()

                @pl.when(jnp.logical_and(t + 1 < n_tiles, jj1 == gy - 1))
                def _():
                    for cp in in_copies_fresh(t + 1, nslot, 1, "hi"):
                        cp.start()
            else:
                @pl.when(jnp.logical_and(t + 1 < n_tiles, jj1 != 0))
                def _():
                    for cp in in_copies_fresh(t + 1, nslot, 1):
                        cp.start()

        # before overwriting out[slot], drain the write issued at t-2
        @pl.when(t >= 2)
        def _():
            for cp in out_copies(t - 2, slot):
                cp.wait()
            if wrap_y:
                wait_pad_copies(t - 2, slot)
            if ystrips:
                wait_strip_copies(t - 2, slot)

        ext_f = ext_f2.at[slot]
        ext_g = ext_g2.at[slot]
        out_f = out_f2.at[slot]
        out_g = out_g2.at[slot]

        # ---------------------------------------- T temporal phases
        def ref_reader(ext, p_s):
            """Read phase-0 inputs from the ext block; region origin at
            ext coords (px - p_s, py - p_s)."""
            ox, oy = px - p_s, py - p_s

            def read(idx, x0, w, y0, h):
                return ext[idx, ox + x0:ox + x0 + w,
                           oy + y0:oy + y0 + h, :]
            return read

        def list_reader(lst):
            """Read phase s >= 1 inputs from the previous phase's output
            arrays, whose region pad exceeds this one's by exactly
            the stencil depth sd."""
            def read(idx, x0, w, y0, h):
                return lst[idx][sd + x0:sd + x0 + w,
                                sd + y0:sd + y0 + h, :]
            return read

        p0 = sd * (block - 1)
        cur_f = ref_reader(ext_f, p0)
        cur_g = ref_reader(ext_g, p0)
        f_l = g_l = None
        for s in range(block):
            p_s = sd * (block - 1 - s)
            nx, ny = bx + 2 * p_s, by + 2 * p_s
            if noise_on and phase_normals[s] is None:
                phase_normals[s] = gen_normals(s)
            ref_rp = None
            if use_ref and noise_on:
                # ref fields are static across phases: read this
                # phase's region straight from the ext buffer
                rrd = ref_reader(ext_r2.at[slot], p_s)
                ref_rp = (rrd(0, 0, nx, 0, ny), rrd(1, 0, nx, 0, ny))
            f_l, g_l = _k_compute(params, cur_f, cur_g, nx, ny,
                                  phase_normals[s], transform,
                                  mmat_ref, minv_ref, dtype,
                                  ref_rp=ref_rp)
            phase_normals[s] = None  # release
            if s < block - 1:
                cur_f = list_reader(f_l)
                cur_g = list_reader(g_l)

        for idx in range(Q):
            out_f[idx] = f_l[idx]
            out_g[idx] = g_l[idx]

        # ------------------------------------------------- write back
        for cp in out_copies(t, slot):
            cp.start()
        if wrap_y:
            start_pad_copies(t, slot)
        if ystrips:
            start_strip_copies(t, slot)

        # drain the last two tiles' writes before the kernel exits
        @pl.when(t == n_tiles - 1)
        def _():
            for cp in out_copies(t, slot):
                cp.wait()
            if wrap_y:
                wait_pad_copies(t, slot)
            if ystrips:
                wait_strip_copies(t, slot)
            if n_tiles > 1:
                @pl.when(t >= 1)
                def _():
                    for cp in out_copies(t - 1, jax.lax.rem(t + 1, jnp.int32(2))):
                        cp.wait()
                    if wrap_y:
                        wait_pad_copies(
                            t - 1, jax.lax.rem(t + 1, jnp.int32(2)))
                    if ystrips:
                        wait_strip_copies(
                            t - 1, jax.lax.rem(t + 1, jnp.int32(2)))

    scope = dict(
        ext_f2=pltpu.VMEM((2, Q, exb, eyb, Z), fout_hbm.dtype),
        ext_g2=pltpu.VMEM((2, Q, exb, eyb, Z), fout_hbm.dtype),
        out_f2=pltpu.VMEM((2, Q, bx, by, Z), fout_hbm.dtype),
        out_g2=pltpu.VMEM((2, Q, bx, by, Z), fout_hbm.dtype),
        sems_in=pltpu.SemaphoreType.DMA((2, 27 if use_ref else 18)),
        sems_out=pltpu.SemaphoreType.DMA(
            (2, 6 if (wrap_y or ystrips) else 2)),
    )
    if use_ref:
        scope["ext_r2"] = pltpu.VMEM((2, 2, exb, eyb, Z), fout_hbm.dtype)
    pl.run_scoped(body, **scope)


def _fused_step_call(params: LBMParams, shape, tile, noise_on,
                     seed, fc, gc, mode="auto", transform=_DEFAULT_TRANSFORM,
                     block=1, noise_impl="hw", noise_dist="clt4",
                     gdomain=None, ext_mode=False, interpret=False,
                     ref=None, win=(0, 0), odomain=None, owin=(0, 0),
                     out_alias=None, wrap_y=False, ystrips=None):
    """`block` K-steps over the (local) domain `shape`.

    seed = int32 [word_0..word_{block-1}, step] (periodic mode) or
    [words..., step, origin_x, origin_y] (ext/shard mode, see
    _step_kernel) — one random word per physical step.
    In ext_mode fc/gc are pre-extended local blocks of shape
    (Q, X + 4*block, Y + 2*_PY, Z); outputs are interior-shaped.
    ref: optional (2, X, Y, Z) COM-rolled (rho_eq, phi_eq) stack
    (pre-extended like fc/gc in ext_mode) — USE_REF_STATE noise
    amplitudes.
    win: static (wx0, wy0) window origin into LARGER ext_mode inputs
    (the out domain is the `shape`-sized window at that offset; the
    ICI-overlap seam bands use this to read the exchanged block
    without slice copies — see _step_kernel).
    odomain/owin/out_alias: the output side of the window mechanism —
    outputs have shape (Q,)+odomain (default `shape`) and the kernel
    writes only the `shape`-sized window at owin.  out_alias=(fprev,
    gprev) donates two odomain-shaped arrays as the output buffers
    (pallas input_output_aliases), so a chain interior -> seam bands
    assembles the full block IN PLACE with no output concatenates
    (see _step_kernel owin note).
    """
    X, Y, Z = shape
    bx, by = tile
    assert X % bx == 0 and Y % by == 0, (shape, tile)
    sd = sd_depth(params)
    assert ext_mode or sd * block <= X, (shape, block)
    if ext_mode:
        assert fc.shape[1] >= win[0] + X + 2 * sd * block \
            and fc.shape[2] >= win[1] + Y + 2 * _PY, (fc.shape, shape, win)
    use_ref = ref is not None and noise_on
    grid = (X // bx, Y // by)
    odomain = tuple(odomain) if odomain is not None else (X, Y, Z)
    assert odomain[0] >= owin[0] + X and odomain[1] >= owin[1] + Y, \
        (odomain, shape, owin)
    assert not wrap_y or (owin[1] == _PY and odomain[1] == Y + 2 * _PY), \
        (odomain, shape, owin)
    # ystrips: (f_lo, f_hi, g_lo, g_hi) neighbor-edge strip operands
    # (each (Q, odomain[0], _PY, Z)); the call then also RETURNS four
    # freshly-written strip outputs after (fo, go) — see _step_kernel.
    assert ystrips is None or (
        ext_mode and out_alias is None and not wrap_y and win[1] == 0
        and owin[1] == _PY and odomain[1] == Y + 2 * _PY), \
        (odomain, shape, win, owin)
    kern = functools.partial(_step_kernel, params, shape,
                             gdomain or shape, bx, by, block,
                             noise_on, mode, transform, noise_impl,
                             noise_dist, ext_mode, use_ref, tuple(win),
                             tuple(owin), out_alias is not None, wrap_y,
                             ystrips is not None)
    out_shape = [jax.ShapeDtypeStruct((Q,) + odomain, fc.dtype)] * 2
    if ystrips is not None:
        out_shape += [jax.ShapeDtypeStruct(
            (Q, odomain[0], _PY, odomain[2]), fc.dtype)] * 4
    mmat = jnp.asarray(M, fc.dtype)
    minv = jnp.asarray(M_INV, fc.dtype)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # M
        pl.BlockSpec(memory_space=pltpu.VMEM),   # M_INV
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
        pl.BlockSpec(memory_space=pl.ANY),       # fc (HBM)
        pl.BlockSpec(memory_space=pl.ANY),       # gc (HBM)
    ]
    operands = [mmat, minv, seed, fc, gc]
    if ystrips is not None:
        for s in ystrips:
            assert s.shape == (Q, odomain[0], _PY, odomain[2]), \
                (s.shape, odomain)
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            operands.append(s)
    if use_ref:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # ref (HBM)
        operands.append(jnp.asarray(ref, fc.dtype))
    aliases = {}
    if out_alias is not None:
        fprev, gprev = out_alias
        assert fprev.shape == (Q,) + odomain, (fprev.shape, odomain)
        aliases = {len(operands): 0, len(operands) + 1: 1}
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        operands += [fprev, gprev]
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shape),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if ystrips is not None:
        return res          # (fo, go, f_lo, f_hi, g_lo, g_hi)
    fo, go = res
    return fo, go


def fused_stream_collide(state: SimState, params: LBMParams,
                         tile=None, mode="auto",
                         transform=_DEFAULT_TRANSFORM, block=1,
                         noise_impl="hw",
                         noise_dist="clt4", ref=None) -> SimState:
    """`block` K = collide o stream updates in post-collide state space.

    ref: optional (2, X, Y, Z) COM-rolled (rho_eq, phi_eq) — the
    USE_REF_STATE amplitude source, held fixed for the `block` steps.
    """
    shape = tuple(state.f.shape[1:])
    tile = tile or _choose_tile(shape, block, params.noise_on,
                                use_ref=ref is not None,
                                sd=sd_depth(params))
    # advance the key once per physical step — and draw one word per
    # step from the per-step splits — so BOTH the key trajectory and the
    # hash noise stream are identical across engines and block sizes
    # (checkpoint/resume reproducibility; bitwise block-invariance is
    # tested for noise_impl="hash" in tests/test_fused_kernel.py)
    key = state.key
    words = []
    for _ in range(block):
        key, sub = jax.random.split(key)
        words.append(jax.random.randint(
            sub, (1,), minval=jnp.iinfo(jnp.int32).min,
            maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32))
    seed = jnp.concatenate(words + [state.step.astype(jnp.int32)[None]])
    fo, go = _fused_step_call(params, shape, tile, params.noise_on,
                              seed, state.f, state.g, mode, transform,
                              block, noise_impl, noise_dist, ref=ref)
    return SimState(f=fo, g=go, key=key, step=state.step + block)


def _auto_block(params: LBMParams, shape, n_k: int, tile, block,
                noise_impl: str, noise_dist: str, with_ref: bool) -> int:
    """Temporal-blocking depth for a run of n_k K-steps (None = auto).

    Temporal blocking halves HBM traffic but adds overlap compute.
    Measured on v5e 256^3 (benchmarks/tpu_perf_r3.py): the
    seam-only-hash "hybrid" noise (see _step_kernel.gen_normals) makes
    blocking pay in the fluctuating uncoupled case too — b2 (16,16)
    hybrid 868 MLUPS vs the best b1 852 — provided the tile affords a
    >= 8-wide hardware-PRNG interior (bx, by >= 12, i.e. 16-divisible
    extents) and the noise path is hw+clt4/clt2/u8.  All-hash b2 (794)
    and the coupled force path (b1 (16,16) = 781 wins) stay at block 1.

    Under the sd=1 stencil depth of the uncoupled case (round 4) the
    recompute pads halve, and the exact-relaxation transform cut
    (round 4c) cheapens the per-cell compute ~30-40%, re-shuffling the
    optima — see the inline table below (relax_r4.json/relax2_r4.json).
    Blocking additionally needs the hybrid interior at phase 0
    (bx - 2*sd*(block-1) >= 8) and the y pad bound sd*block <= _PY."""
    if block is not None:
        return block
    if n_k < 2:
        return 1
    sdp = sd_depth(params)
    cap = _PY // sdp   # Mosaic y-pad bound: sd*block <= _PY
    # Post-exact-relaxation optima (benchmarks/results/relax_r4.json +
    # relax2_r4.json, 256^3 v5e): with the transform cheapened the b3
    # seam recompute no longer pays for its traffic saving under the
    # cheap noise generators — fluct u8 b2 1782.3 > b3 1712.9, clt2 b2
    # 1720.2 > b3 1648.9; only clt4's heavier per-draw cost still
    # prefers b3 (1443.5 > 1365.9).  Deterministic runs keep gaining to
    # b4 (2392.5 > b3 2324.9 > b2 1803.1).  Coupled (sd=2) flipped from
    # b1 to b2: u8 1129.3 / clt2 1109.3 > b1 1003.3.
    if params.noise_on:
        best = 3 if (noise_dist == "clt4" and sdp == 1) else 2
        best = max(1, min(best, cap, n_k))
        # consult the tile the chooser would ACTUALLY return
        # (the VMEM budget can shrink bx below what the
        # shape's divisibility suggests, e.g. (256,256,512) -> bx=8,
        # whose interior falls below the 8-wide HW-PRNG
        # minimum and would silently degrade every non-final phase
        # to the measured-slower all-hash blocked path; with_ref:
        # the ref operand's tighter VMEM budget can do the same)
        for b in range(best, 1, -1):
            if tile is not None:
                bx, by = tile
            else:
                bx, by = _choose_tile(shape, b, True, use_ref=with_ref,
                                      sd=sdp)
            if (noise_impl == "hw"
                    and noise_dist in ("clt4", "clt2", "u8")
                    and bx - 2 * sdp * (b - 1) >= 8
                    and by - 2 * sdp * (b - 1) >= 8):
                return b
        return 1
    best = max(1, min(4 if sdp == 1 else 2, cap, n_k))
    return best if shape[0] >= sdp * best else 1


def mass_restore_step(st: SimState, m0f, m0g) -> SimState:
    """Global exact-mass restore (round 5, VERDICT r4 #5): pin the
    stored total masses back to the invariants captured at session
    entry by spreading the (pure-rounding) defect uniformly over the
    rest population.  The reference computes in double and never
    drifts (amrex::Real, GNUmakefile default); our f32 kernel's
    residual ~7e-10/step relative comes from back-transform telescoping
    rounding (ACCEPTANCE r3/r4).  The correction is a pure function of
    the state, applied at a fixed step cadence so chunk splits with
    identical sweep boundaries stay bitwise-identical."""
    ncf = float(np.prod(st.f.shape[1:]))
    f = st.f.at[0].add((m0f - jnp.sum(st.f)) / ncf)
    g = st.g.at[0].add((m0g - jnp.sum(st.g)) / ncf)
    return SimState(f=f, g=g, key=st.key, step=st.step)


def _maybe_restore(st_prev_step, st, mass_restore):
    """Apply mass_restore_step when the sweep [prev_step, st.step)
    crossed a multiple of the restore interval."""
    if mass_restore is None:
        return st
    interval, m0f, m0g = mass_restore
    crossed = (st.step // jnp.int32(interval)
               > st_prev_step // jnp.int32(interval))
    return jax.lax.cond(crossed,
                        lambda s: mass_restore_step(s, m0f, m0g),
                        lambda s: s, st)


def make_ksteps(params: LBMParams, shape, n: int, tile=None,
                mode: str = "auto", transform: str = None,
                block=None, noise_impl: str = "hw",
                noise_dist: str = "clt4", use_ref: bool = False,
                mass_restore=None):
    """n K = collide∘stream updates in POST-COLLIDE space, kernel frame.

    The building block of the persistent-state session path
    (:mod:`bflbm_tpu.kernels.session`): unlike :func:`make_nsteps` it
    performs NO entry/exit conversion — the caller owns a post-collide
    SimState (convention: a state labeled ``step == k`` streams to the
    standard post-stream state of step k) and advances it n K-steps per
    call, paying the ~130 ms jnp prelude/collide/stream boundary only
    when an observable actually needs a post-stream view.  This is what
    lets production-cadence chunking (~100 steps, the physics
    campaigns' S(k)/frame cadence) run at the 1000-step-chunk benchmark
    rate (VERDICT r3 §weak-1; the reference's uniform per-step hot
    loop, LBM_binary.H:545-594, never pays a space conversion at all).

    `shape` must be kernel-tileable (``supports_shape``) or single-tile
    forced via `tile`; axis permutation is the caller's job.  Returns an
    UNJITTED fn(s [, ref2]) -> s (n == 0 gives the identity) suitable
    for wrapping in the caller's jit.  ref2: optional (2, X, Y, Z)
    COM-rolled (rho_eq, phi_eq) stack held fixed for the n steps
    (USE_REF_STATE).  mass_restore: optional (interval, m0f, m0g) —
    see :func:`mass_restore_step`."""
    if transform is None:
        transform = _DEFAULT_TRANSFORM
    T = _auto_block(params, shape, n, tile, block, noise_impl,
                    noise_dist, use_ref)
    T = max(1, min(T, n)) if n else 1
    tl = tile or _choose_tile(shape, T, params.noise_on, use_ref=use_ref,
                              sd=sd_depth(params))
    n_blocked, n_rest = divmod(n, T) if n else (0, 0)

    def run_k(s: SimState, ref2=None) -> SimState:
        if n_blocked:
            def body(st, _):
                st1 = fused_stream_collide(st, params, tl, mode,
                                           transform, T, noise_impl,
                                           noise_dist, ref=ref2)
                return _maybe_restore(st.step, st1, mass_restore), None

            s, _ = jax.lax.scan(body, s, None, length=n_blocked)
        for _ in range(n_rest):
            s1 = fused_stream_collide(s, params, tl, mode, transform, 1,
                                      noise_impl, noise_dist, ref=ref2)
            s = _maybe_restore(s.step, s1, mass_restore)
        return s

    return run_k


def make_nsteps(params: LBMParams, n: int, tile=None, force: bool = False,
                mode: str = "auto", transform: str = _DEFAULT_TRANSFORM,
                perm=None, block=None, noise_impl: str = "hw",
                noise_dist: str = "clt4", use_ref: bool = False):
    """n standard steps via the fused kernel.

    use_ref: the returned fn takes a second argument ref2 — the
    (2, X, Y, Z) COM-rolled (rho_eq, phi_eq) stack — and evaluates the
    noise amplitudes at it (USE_REF_STATE, LBM_binary.H:92-106) for all
    n steps.  The caller re-rolls per chunk (run.py); the reference
    updates the COM every step, but the integer shift changes only when
    the COM crosses a cell boundary (~diffusively rare), so per-chunk
    rolling is exact whenever the rounded COM is constant over the
    chunk.

    Returns jitted fn: SimState (post-stream) -> SimState (post-stream).
    Shapes the kernel cannot tile directly run in a permuted lattice frame
    when one fits (:func:`axis_perm_for_shape`); otherwise fall back to
    the jnp scan unless ``force`` (used by interpret-mode tests).
    alpha1 != 0 runs on the kernel path at stencil depth 3 (block
    capped at ``_PY // 3 == 2``).  ``perm`` overrides the automatic permutation
    choice (tests); ``tile`` is interpreted in the (permuted) kernel
    frame.  ``block`` = K-steps per kernel sweep (temporal blocking;
    None = auto: 2 when the shape affords it).  ``noise_impl`` selects
    the FINAL phase's noise stream ("hw" hardware PRNG / "hash"
    coordinate-keyed); non-final phases always use "hash".
    ``noise_dist`` selects the normal generator: "clt4" byte-sum
    (default; exact first/second moments, see :func:`_clt4_normal`),
    "clt2" byte-pair halves (cheapest, see :func:`_clt2_pair`) or
    "bm" Box-Muller (exact Gaussian, ~2x slower noise phase).
    """
    from ..models import binary_fluid as model
    from ..ops import collide as collide_ops
    from ..ops import stream as stream_ops

    if n < 1:
        raise ValueError("n >= 1")
    if transform in ("eof", "eofc") and not _EOF_OK:
        # the factored schedule hardcodes the basis STRUCTURE; if the
        # import-time identity check against M/M_INV failed, an explicit
        # request must error rather than silently compute wrong moments
        # (the DEFAULT falls back to "eo" on its own)
        raise ValueError(
            "transform='%s' unavailable: the factored schedule no "
            "longer matches this lattice basis (use 'eo')" % transform)

    def run_jnp(state: SimState, ref2=None) -> SimState:
        if ref2 is None:
            return model.nsteps(state, params, n)

        def body(s, _):
            s, _h = model.step(s, params, (ref2[0], ref2[1], None))
            return s, None

        out, _ = jax.lax.scan(body, state, None, length=n)
        return out

    def fused_body(s: SimState, shape, ref2=None) -> SimState:
        # enter post-collide space: one jnp prelude+collide
        ref_st = None if ref2 is None else (ref2[0], ref2[1], None)
        h, xi_f, xi_g, key = model.prelude(s, params, ref_st)
        f1, g1 = collide_ops.collide(s.f, s.g, h, xi_f, xi_g, params)
        s = SimState(f=f1, g=g1, key=key, step=s.step + 1)

        kfn = make_ksteps(params, shape, n - 1, tile=tile, mode=mode,
                          transform=transform, block=block,
                          noise_impl=noise_impl, noise_dist=noise_dist,
                          use_ref=ref2 is not None)
        s = kfn(s, ref2)
        # exit: stream the last post-collide state
        return SimState(f=stream_ops.stream(s.f), g=stream_ops.stream(s.g),
                        key=s.key, step=s.step)

    def run(state: SimState, ref2=None) -> SimState:
        shape = tuple(state.f.shape[1:])
        p = perm
        if p is None:
            if force or supports_shape(shape):
                return fused_body(state, shape, ref2)
            p = axis_perm_for_shape(shape)
            if p is None:
                return run_jnp(state, ref2)
        if p == (0, 1, 2):
            return fused_body(state, shape, ref2)
        # run in the permuted lattice frame (see axis_perm_for_shape)
        idx = _pop_perm(p)
        pinv = _inverse_perm(p)
        idx_inv = _pop_perm(pinv)
        sp = SimState(f=_permute_pops(state.f, p, idx),
                      g=_permute_pops(state.g, p, idx),
                      key=state.key, step=state.step)
        ref_p = None if ref2 is None else jnp.transpose(
            ref2, (0,) + tuple(a + 1 for a in p))
        out = fused_body(sp, tuple(shape[a] for a in p), ref_p)
        return SimState(f=_permute_pops(out.f, pinv, idx_inv),
                        g=_permute_pops(out.g, pinv, idx_inv),
                        key=out.key, step=out.step)

    if use_ref:
        return jax.jit(run, donate_argnums=0)

    def run_noref(state: SimState) -> SimState:
        return run(state)

    return jax.jit(run_noref, donate_argnums=0)
