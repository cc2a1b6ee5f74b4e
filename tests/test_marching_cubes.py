"""Hand-rolled marching cubes (observables/marching_cubes.py): mesh
validity, geometric convergence, and parity of the reference-convention
zeta_lm projection with the ray extractor — the surface pipeline of
Droplet_Fluctuation.ipynb cells 32-39."""

import numpy as np
import pytest

from bflbm_tpu.observables import droplet as drop_obs
from bflbm_tpu.observables import marching_cubes as mc


def _sphere_field(n, R, width=1.0, center=None):
    x = np.arange(n, dtype=float)
    c = np.full(3, (n - 1) / 2.0) if center is None else np.asarray(center)
    X, Y, Z = np.meshgrid(x - c[0], x - c[1], x - c[2], indexing="ij")
    r = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    return 1.0 / (1.0 + np.exp((r - R) / width)), c


def test_table_structure():
    tbl = mc._tri_table()
    assert len(tbl) == 256
    assert tbl[0] == [] and tbl[255] == []
    # single inside corner -> one triangle; complements mirror counts
    assert len(tbl[1]) == 1 and len(tbl[254]) == 1
    assert all(len(t) <= 5 for t in tbl)


def test_sphere_watertight_euler_area():
    field, c = _sphere_field(40, 12.4)
    verts, faces = mc.marching_cubes(field, 0.5)
    assert mc.boundary_edge_count(faces) == 0
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]])
    e.sort(axis=1)
    E = len(np.unique(e, axis=0))
    assert len(verts) - E + len(faces) == 2  # sphere topology
    area = mc.surface_area(verts, faces)
    assert abs(area / (4 * np.pi * 12.4 ** 2) - 1) < 5e-3
    # vertex radii on the level set
    r = np.linalg.norm(verts - c, axis=1)
    assert abs(r.mean() - 12.4) < 0.05


def test_orientation_outward():
    """Faces oriented with normals out of the high-density region."""
    field, c = _sphere_field(32, 9.0)
    verts, faces = mc.marching_cubes(field, 0.5)
    sv = verts - c
    v0, v1, v2 = (sv[faces[:, i]] for i in range(3))
    n = np.cross(v1 - v0, v2 - v0)
    dot = np.einsum("ij,ij->i", n, (v0 + v1 + v2) / 3.0)
    assert (dot > 0).mean() > 0.999


def test_solid_angle_and_zeta00():
    field, c = _sphere_field(40, 12.4)
    amps, diag = mc.mc_surface_amplitudes(field, c, 0.5)
    assert abs(diag["sum_w"] / (4 * np.pi) - 1) < 2e-3
    assert diag["boundary_edges"] == 0
    R0 = amps[(0, 0)].real / np.sqrt(4 * np.pi)
    assert abs(R0 - 12.4) < 0.02
    for (l, m), a in amps.items():
        if l:
            assert abs(a) < 8e-3 * amps[(0, 0)].real


def test_ellipsoid_zeta20_matches_ray_extractor():
    """The two extraction methods agree on a deterministic deformed
    droplet — the cross-check that closes the phase-F method
    attribution."""
    n, R, eps = 48, 14.0, 0.04
    x = np.arange(n) - (n - 1) / 2.0
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    a, cc = R * (1 + eps), R * (1 - 0.5 * eps)
    r_el = np.sqrt((X / a) ** 2 + (Y / a) ** 2 + (Z / cc) ** 2)
    field = 1.0 / (1.0 + np.exp((r_el - 1.0) * R))
    com = np.full(3, (n - 1) / 2.0)     # array-index coords (mc)
    amps, diag = mc.mc_surface_amplitudes(field, com, 0.5)
    # the ray extractor takes box-center coords (droplet.center_of_mass)
    rmap = drop_obs.surface_radius_map(field, np.zeros(3), 0.5)
    ray = drop_obs.spherical_harmonic_amplitudes(rmap, lmax=2)
    z_mc, z_ray = amps[(2, 0)].real, ray[(2, 0)].real
    assert abs(z_mc) > 0.5  # real signal
    assert abs(z_mc - z_ray) < 0.02 * abs(z_ray)


def test_off_center_and_two_droplets():
    """COM shift handled; disconnected components meshed (table's
    per-component hulls)."""
    field, c = _sphere_field(40, 8.0, center=(17.2, 21.6, 19.1))
    amps, diag = mc.mc_surface_amplitudes(field, (17.2, 21.6, 19.1), 0.5)
    assert abs(amps[(0, 0)].real / np.sqrt(4 * np.pi) - 8.0) < 0.02
    f1, _ = _sphere_field(48, 6.0, center=(12, 12, 12))
    f2, _ = _sphere_field(48, 6.0, center=(34, 34, 34))
    two = np.maximum(f1, f2)
    verts, faces = mc.marching_cubes(two, 0.5)
    assert mc.boundary_edge_count(faces) == 0
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]])
    e.sort(axis=1)
    E = len(np.unique(e, axis=0))
    assert len(verts) - E + len(faces) == 4  # two spheres


def test_random_blob_watertight():
    """Smooth random field: the generated table leaves no holes beyond
    ambiguous-face mismatches (quantified, must be tiny)."""
    rng = np.random.default_rng(3)
    coarse = rng.normal(size=(6, 6, 6))
    # trilinear upsample to 30^3 for smoothness
    from itertools import product
    fine = np.zeros((30, 30, 30))
    xs = np.linspace(0, 5 - 1e-9, 30)
    i0 = np.floor(xs).astype(int)
    fr = xs - i0
    for dx, dy, dz in product((0, 1), repeat=3):
        w = (np.where(dx, fr, 1 - fr)[:, None, None]
             * np.where(dy, fr, 1 - fr)[None, :, None]
             * np.where(dz, fr, 1 - fr)[None, None, :])
        fine += w * coarse[np.ix_(i0 + dx, i0 + dy, i0 + dz)]
    verts, faces = mc.marching_cubes(fine, 0.0)
    assert len(faces) > 500
    # holes arise ONLY from ambiguous-face resolution mismatches (the
    # inherent single-table MC limitation, proven by
    # test_table_face_consistency); this nasty saddle-rich field stays
    # under a few % of edges
    b = mc.boundary_edge_count(faces)
    assert b < 0.03 * 3 * len(faces)


def test_table_face_consistency():
    """Exhaustive adjacency proof of the generated table: for every
    pair of cases that can share a cube face, the triangle-patch
    boundary segments on that face must match exactly UNLESS the shared
    face has the ambiguous two-diagonal-corners pattern (where any
    single-entry-per-case table, including the classic Lorensen-Cline
    one, can disagree)."""
    tbl = mc._tri_table()
    ends, cx = mc._EDGE_ENDS, mc._CORNER_XYZ

    def face_segments(case, z_val):
        segs = set()
        for tri in tbl[case]:
            for k in range(3):
                e0, e1 = tri[k], tri[(k + 1) % 3]
                if all(cx[c][2] == z_val
                       for e in (e0, e1) for c in ends[e]):
                    mids = []
                    for e in (e0, e1):
                        m = (cx[ends[e][0]] + cx[ends[e][1]]) / 2.0
                        mids.append((m[0], m[1]))
                    segs ^= {frozenset(mids)}
        return segs

    top_corners = [c for c in range(8) if cx[c][2] == 1]
    bot_corners = [c for c in range(8) if cx[c][2] == 0]
    for case_a in range(256):
        t = [(case_a >> c) & 1 for c in top_corners]
        ambiguous = sum(t) == 2 and ((t[0] and t[3]) or (t[1] and t[2]))
        if ambiguous:
            continue
        sa = face_segments(case_a, 1)
        for low4 in range(16):
            case_b = 0
            for i, c in enumerate(bot_corners):
                case_b |= t[i] << c
            for i, c in enumerate(top_corners):
                case_b |= ((low4 >> i) & 1) << c
            assert face_segments(case_b, 0) == sa, (case_a, case_b)
