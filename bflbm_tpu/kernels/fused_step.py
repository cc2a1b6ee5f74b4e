"""Fused Pallas collide-stream kernel — the hot path of the framework.

The reference's hot loop (``LBM_timestep``, LBM_binary.H:545-594) runs
~6 halo exchanges and 4 sweeps over the populations per step.  Here one
Pallas kernel performs, per (x, y) tile with the full z extent resident:

    pull-stream (shifted VMEM reads, z-wrap via pltpu.roll)
      -> densities on a 1-cell-extended tile
      -> 19-point isotropic gradients (Shan-Chen force)
      -> real-velocity reconstruction (friction + noise corrections)
      -> per-mode thermal noise from the in-kernel hardware PRNG
      -> MRT collide in moment space (unrolled Duenweg/Schiller basis)

so each step reads f, g once (plus a halo overlap) and writes them once —
the HBM-bandwidth speed-of-light for this model.

State convention: between kernel invocations HBM holds the
POST-COLLIDE populations.  For a standard (post-stream) ``SimState`` S
with step = T(stream) after C(collide), n steps factor as

    (T o C)^n = T o (C o T)^(n-1) o C

so :func:`make_nsteps` runs one jnp collide to enter post-collide space,
n-1 fused kernels (each = C o T), and one jnp stream to exit.

Periodic halos: the tile loads a (BX+4, BY+16, Z) block via 9 fixed-size
DMA fragments per species (3 x-ranges x 3 y-ranges) whose source offsets
are taken modulo the domain — every fragment is contiguous in-bounds, so
no dynamic-size DMA is needed.  Mosaic alignment rules force the y
(sublane) fragments to 8-aligned sizes, hence the physical y pad is 8
although only 2 halo cells are consumed; z wraps with in-register rolls.

Noise: amplitudes exactly as ``ops.noise`` (LBM_binary.H:113-127);
normals are Box-Muller over the TPU hardware PRNG seeded per
(seed, step, tile).  Statistically identical to the jnp path's threefry
stream but not bitwise equal (the jnp path remains the decomposition-
invariant reference; parity tests run at kBT=0 where the paths agree to
round-off).
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

# number of normal draws per cell: 3 momentum + 15 ghost(f) + 15 ghost(g)
_N_NORMALS = 33
_PX = 2   # x halo pad (logical halo = 2)
_PY = 8   # y pad: sublane tiling forces 8-aligned DMA fragments


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


def _choose_tile(shape: Tuple[int, int, int]) -> Tuple[int, int]:
    """Pick (BX, BY) dividing (X, Y); z is always whole.

    The y-sweep load path (see _step_kernel) wants BY == _PY == 8 so the
    sliding fresh load is a single aligned fragment; BX is then sized to
    amortize the x halo within the VMEM budget."""
    X, Y, Z = shape

    def best(n, target, mult=1):
        divs = [d for d in range(1, n + 1) if n % d == 0 and d % mult == 0]
        if not divs:
            divs = [n]
        return min(divs, key=lambda d: (abs(d - target), d))

    # hardware matrix (benchmarks/tpu_tile_sweep2.py): (8,16) sweep is
    # the best measured config at 256^3 on v5e
    by = 2 * _PY if Y % (2 * _PY) == 0 and Y // (2 * _PY) >= 2 \
        else (_PY if Y % _PY == 0 and Y // _PY >= 2 else best(Y, 32))
    bx = best(X, 8)
    # Budget: ext block 2*19*(BX+4)*(BY+16)*Z*4 bytes (x2 slots) <= 40 MB
    while 2 * Q * (bx + 2 * _PX) * (by + 2 * _PY) * Z * 4 > 40 * 2 ** 20 \
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


def _step_kernel(params: LBMParams, shape, bx, by, noise_on, mode,
                 transform,
                 mmat_ref, minv_ref, seed_ref,
                 fc_hbm, gc_hbm, fout_hbm, gout_hbm):
    """Grid program: one (bx, by, Z) interior tile.

    Cross-grid-step double buffering: while tile t computes, tile t+1's
    halo fragments stream into the alternate ext buffers and tile t-2's
    result DMA drains from the alternate out buffers — input, compute,
    and output phases overlap (the unpipelined version ran at ~230 GB/s
    effective HBM bandwidth; this hides most of the DMA time).
    """
    X, Y, Z = shape
    gx, gy = X // bx, Y // by
    n_tiles = gx * gy
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * gy + j
    px, py = _PX, _PY
    exb, eyb = bx + 2 * px, by + 2 * py
    has_force = params.alpha0 != 0.0

    xsizes = (px, bx, px)
    ysizes = (py, by, py)

    # sweep mode: BY a multiple of _PY makes the sliding fresh load an
    # aligned y-slab (two fragments at the row wrap when BY > _PY); the
    # 2*_PY overlap columns are carried between consecutive y-tiles as a
    # VMEM copy, removing the y-halo re-reads entirely.
    sweep = (by % py == 0 and gy >= 2 and mode != "tiles")

    def body(ext_f2, ext_g2, out_f2, out_g2, sems_in, sems_out):
        def in_copies_full(tt, slot):
            """All 9 halo fragments for tile tt (row starts / tiles
            mode)."""
            ii = tt // gy
            jj = tt - ii * gy
            xs = _mod_starts(ii, bx, px, X)
            ys = _mod_starts(jj, by, py, Y)
            ys = tuple(pl.multiple_of(y, 8) for y in ys)
            cps = []
            for si, src in enumerate((fc_hbm, gc_hbm)):
                dst = ext_f2 if si == 0 else ext_g2
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

        def in_copies_fresh(tt, slot, frags):
            """Sliding-mode load: only the fresh trailing y-slab (width
            BY) for the 3 x fragments; the leading 2*_PY columns are
            VMEM-copied from the previous tile.

            fresh slab = ext columns [2*PY, 2*PY+BY) = absolute y range
            [y1 + PY, y1 + PY + BY), y1 = jj*BY.  For BY > PY the last
            tile of a row wraps: frags selects the unwrapped (1) or
            wrapped (2) fragment decomposition (both static shapes).
            """
            ii = tt // gy
            jj = tt - ii * gy
            xs = _mod_starts(ii, bx, px, X)
            ys0 = pl.multiple_of(
                jax.lax.rem((jj * by + py), jnp.int32(Y)), 8)
            if frags == 1:
                yparts = ((ys0, 2 * py, by),)
            else:
                # wrap at the row end: [Y-PY, Y) then [0, BY-PY)
                yparts = ((pl.multiple_of(Y - py, 8), 2 * py, py),
                          (0, 2 * py + py, by - py))
            cps = []
            for si, src in enumerate((fc_hbm, gc_hbm)):
                dst = ext_f2 if si == 0 else ext_g2
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

        def out_copies(tt, slot):
            ii = tt // gy
            jj = tt - ii * gy
            cps = []
            for si, dst in enumerate((fout_hbm, gout_hbm)):
                src = out_f2 if si == 0 else out_g2
                cps.append(pltpu.make_async_copy(
                    src.at[slot],
                    dst.at[:, pl.ds(ii * bx, bx),
                           pl.ds(pl.multiple_of(jj * by, 8), by), :],
                    sems_out.at[slot, si],
                ))
            return cps

        slot = jax.lax.rem(t, jnp.int32(2))
        nslot = jax.lax.rem(t + 1, jnp.int32(2))

        @pl.when(t == 0)
        def _():
            for cp in in_copies_full(0, 0):
                cp.start()

        # issue next tile's row-start / tiles-mode loads as early as
        # possible (they don't depend on this tile's data)
        if not sweep:
            @pl.when(t + 1 < n_tiles)
            def _():
                for cp in in_copies_full(t + 1, nslot):
                    cp.start()
        else:
            jj1 = jax.lax.rem(t + 1, jnp.int32(gy))
            jj0 = jax.lax.rem(t, jnp.int32(gy))
            wraps = by > py  # last tile of a row needs a 2-frag fresh load

            @pl.when(jnp.logical_and(t + 1 < n_tiles, jj1 == 0))
            def _():
                for cp in in_copies_full(t + 1, nslot):
                    cp.start()

        # ---------------- input-independent noise normals -------------
        # Generated BEFORE the DMA waits: the PRNG + Box-Muller work
        # (~30% of the step) fills the core's otherwise-idle DMA stall.
        dtype = fout_hbm.dtype
        tile_shape = (bx, by, Z)
        if noise_on:
            # Seed space: (random word + tile hash, step counter) — a
            # single 32-bit word would birthday-collide over the 1e6-step
            # production presets (identical global noise fields ~100x/run);
            # Mosaic caps prng_seed at 2 words, so the tile index is folded
            # into the random word by an odd-multiplier (injective) hash.
            tile_h = (i * pl.num_programs(1) + j) * jnp.int32(-1640531527)
            pltpu.prng_seed(seed_ref[0] + tile_h, seed_ref[1])
            two_pi = 6.283185307179586
            npair = (_N_NORMALS + 1) // 2  # 17
            bits = pltpu.prng_random_bits((2 * npair,) + tile_shape)
            i24 = pltpu.bitcast(
                pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
            u = i24.astype(dtype) * (1.0 / (1 << 24))
            r_bm = jnp.sqrt(-2.0 * jnp.log(u[:npair] + (0.5 / (1 << 24))))
            theta = two_pi * u[npair:]
            n1 = r_bm * jnp.cos(theta)
            n2 = r_bm * jnp.sin(theta)

        if not sweep:
            for cp in in_copies_full(t, slot):
                cp.wait()
        else:
            # wait this tile's own fragments
            @pl.when(jj0 == 0)
            def _():
                for cp in in_copies_full(t, slot):
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

        ext_f = ext_f2.at[slot]
        ext_g = ext_g2.at[slot]
        out_f = out_f2.at[slot]
        out_g = out_g2.at[slot]

        dtype = fout_hbm.dtype

        # -------------------------------------- streamed slices helpers
        def fs(ext, idx, t):
            """population idx of the streamed state on the window with
            t halo cells: value at cell x is ext[idx, x - c]."""
            cx, cy, cz = int(C[idx, 0]), int(C[idx, 1]), int(C[idx, 2])
            x0 = px - t - cx
            y0 = py - t - cy
            sl = ext[idx, x0:x0 + bx + 2 * t, y0:y0 + by + 2 * t, :]
            return _roll_z(sl, cz)

        def center(arr1):
            """ext1 window -> interior."""
            return arr1[1:1 + bx, 1:1 + by, :]

        # streamed interior populations (list of 19 arrays per species)
        fsl = [fs(ext_f, idx, 0) for idx in range(Q)]
        gsl = [fs(ext_g, idx, 0) for idx in range(Q)]

        if has_force:
            # densities on the 1-extended tile (for the gradient stencil)
            def density_ext1(ext):
                acc = fs(ext, 0, 1)
                for idx in range(1, Q):
                    acc = acc + fs(ext, idx, 1)
                return acc

            rho1 = density_ext1(ext_f)
            phi1 = density_ext1(ext_g)
            if params.use_sc_pseudo:
                n0 = params.sc_ref_density
                psi_rho1 = n0 * (1.0 - jnp.exp(-rho1 / n0))
                psi_phi1 = n0 * (1.0 - jnp.exp(-phi1 / n0))
            else:
                psi_rho1, psi_phi1 = rho1, phi1
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
                        ps1[1 + cx:1 + cx + bx, 1 + cy:1 + cy + by, :],
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

            grad_phi = gradient(psi_phi1)
            grad_rho = gradient(psi_rho1)
        else:
            rho = None  # computed from moments below
            phi = None

        # moments: unrolled adds (VPU) or 19x19 matmul (MXU)
        if transform == "mxu":
            def mom(pops):
                x = jnp.stack(pops)
                m4 = jax.lax.dot_general(
                    mmat_ref[:], x, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                return [m4[k] for k in range(Q)]
        else:
            def mom(pops):
                out = []
                for k in range(Q):
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
            af = [-CS2 * a0 * psi_rho * g * inv_rho for g in grad_phi]
            ag = [-CS2 * a0 * psi_phi * g * inv_phi for g in grad_rho]

        # ----------------------- noise amplitudes x normals -----------
        # (normals n1, n2 were generated before the DMA waits above)
        lam_f = params.lam_f
        lam_g = params.lam_g
        if noise_on:
            kBT = params.kBT
            pref_f = 2.0 * (lam_f - 0.5 * lam_f * lam_f) * kBT
            pref_g = 2.0 * (lam_g - 0.5 * lam_g * lam_g) * kBT
            rhot_ = rho + phi
            amp_mom = jnp.sqrt(
                pref_f * jnp.abs(rho * phi * safe_inv(rhot_)))
            sq_rho = jnp.sqrt(jnp.abs(rho))
            sq_phi = jnp.sqrt(jnp.abs(phi))

            def normal(a):
                return n1[a // 2] if a % 2 == 0 else n2[a // 2]

            xi_f = [jnp.zeros(tile_shape, dtype)]
            xi_g = [jnp.zeros(tile_shape, dtype)]
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
        if transform == "mxu":
            def pops_from(mom_list, out_ref):
                m4 = jnp.stack(mom_list)
                out_ref[:] = jax.lax.dot_general(
                    minv_ref[:], m4, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        else:
            def pops_from(mom_list, out_ref):
                for idx in range(Q):
                    acc = None
                    for k in range(Q):
                        c = float(M_INV[idx, k])
                        if c == 0.0:
                            continue
                        t = c * mom_list[k]
                        acc = t if acc is None else acc + t
                    out_ref[idx] = acc

        pops_from(mf, out_f)
        pops_from(mg, out_g)

        # ------------------------------------------------- write back
        for cp in out_copies(t, slot):
            cp.start()

        # drain the last two tiles' writes before the kernel exits
        @pl.when(t == n_tiles - 1)
        def _():
            for cp in out_copies(t, slot):
                cp.wait()
            if n_tiles > 1:
                @pl.when(t >= 1)
                def _():
                    for cp in out_copies(t - 1, jax.lax.rem(t + 1, jnp.int32(2))):
                        cp.wait()

    pl.run_scoped(
        body,
        ext_f2=pltpu.VMEM((2, Q, exb, eyb, Z), fout_hbm.dtype),
        ext_g2=pltpu.VMEM((2, Q, exb, eyb, Z), fout_hbm.dtype),
        out_f2=pltpu.VMEM((2, Q, bx, by, Z), fout_hbm.dtype),
        out_g2=pltpu.VMEM((2, Q, bx, by, Z), fout_hbm.dtype),
        sems_in=pltpu.SemaphoreType.DMA((2, 18)),
        sems_out=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _fused_step_call(params: LBMParams, shape, tile, noise_on,
                     seed, fc, gc, mode="auto", transform="unrolled"):
    X, Y, Z = shape
    bx, by = tile
    assert X % bx == 0 and Y % by == 0, (shape, tile)
    grid = (X // bx, Y // by)
    kern = functools.partial(_step_kernel, params, shape, bx, by, noise_on,
                             mode, transform)
    out_shape = [jax.ShapeDtypeStruct(fc.shape, fc.dtype)] * 2
    mmat = jnp.asarray(M, fc.dtype)
    minv = jnp.asarray(M_INV, fc.dtype)
    fo, go = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # M
            pl.BlockSpec(memory_space=pltpu.VMEM),   # M_INV
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pl.ANY),       # fc (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # gc (HBM)
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(mmat, minv, seed, fc, gc)
    return fo, go


def fused_stream_collide(state: SimState, params: LBMParams,
                         tile=None, mode="auto",
                         transform="unrolled") -> SimState:
    """One K = collide o stream update in post-collide state space."""
    shape = tuple(state.f.shape[1:])
    tile = tile or _choose_tile(shape)
    key, sub = jax.random.split(state.key)
    word = jax.random.randint(sub, (1,), minval=jnp.iinfo(jnp.int32).min,
                              maxval=jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    seed = jnp.concatenate([word, state.step.astype(jnp.int32)[None]])
    fo, go = _fused_step_call(params, shape, tile, params.noise_on,
                              seed, state.f, state.g, mode, transform)
    return SimState(f=fo, g=go, key=key, step=state.step + 1)


def make_nsteps(params: LBMParams, n: int, tile=None, force: bool = False,
                mode: str = "auto", transform: str = "unrolled",
                perm=None):
    """n standard steps via the fused kernel.

    Returns jitted fn: SimState (post-stream) -> SimState (post-stream).
    Shapes the kernel cannot tile directly run in a permuted lattice frame
    when one fits (:func:`axis_perm_for_shape`); otherwise, and for
    alpha1 != 0, fall back to the jnp scan unless ``force`` (used by
    interpret-mode tests).  ``perm`` overrides the automatic permutation
    choice (tests); ``tile`` is interpreted in the (permuted) kernel frame.
    """
    from ..models import binary_fluid as model
    from ..ops import collide as collide_ops
    from ..ops import stream as stream_ops

    if n < 1:
        raise ValueError("n >= 1")

    def run_jnp(state: SimState) -> SimState:
        return model.nsteps(state, params, n)

    def fused_body(s: SimState) -> SimState:
        # enter post-collide space: one jnp prelude+collide
        h, xi_f, xi_g, key = model.prelude(s, params)
        f1, g1 = collide_ops.collide(s.f, s.g, h, xi_f, xi_g, params)
        s = SimState(f=f1, g=g1, key=key, step=s.step + 1)

        def body(s, _):
            return fused_stream_collide(s, params, tile, mode,
                                         transform), None

        s, _ = jax.lax.scan(body, s, None, length=n - 1)
        # exit: stream the last post-collide state
        return SimState(f=stream_ops.stream(s.f), g=stream_ops.stream(s.g),
                        key=s.key, step=s.step)

    def run(state: SimState) -> SimState:
        shape = tuple(state.f.shape[1:])
        if not force and params.alpha1 != 0.0:
            return run_jnp(state)
        p = perm
        if p is None:
            if force or supports_shape(shape):
                return fused_body(state)
            p = axis_perm_for_shape(shape)
            if p is None:
                return run_jnp(state)
        if p == (0, 1, 2):
            return fused_body(state)
        # run in the permuted lattice frame (see axis_perm_for_shape)
        idx = _pop_perm(p)
        pinv = _inverse_perm(p)
        idx_inv = _pop_perm(pinv)
        sp = SimState(f=_permute_pops(state.f, p, idx),
                      g=_permute_pops(state.g, p, idx),
                      key=state.key, step=state.step)
        out = fused_body(sp)
        return SimState(f=_permute_pops(out.f, pinv, idx_inv),
                        g=_permute_pops(out.g, pinv, idx_inv),
                        key=out.key, step=out.step)

    return jax.jit(run, donate_argnums=0)
