"""Hand-rolled marching cubes + the reference's vertex-weighted
spherical-harmonic surface projection.

The reference's droplet shape-fluctuation pipeline
(``Droplet_Fluctuation.ipynb`` cells 32-39) extracts the rho isosurface
with ``skimage.measure.marching_cubes`` at level = (min+max)/2, shifts
the vertices by the center of mass, assigns every vertex a solid-angle
weight (each triangle's area-projected solid angle split barycentrically
over its three corners), and projects the vertex radii onto Y_lm with a
weighted-ratio estimator.  skimage is not available in this environment,
and the round-2 replacement (radial rays on a Gauss-Legendre grid,
:func:`bflbm_tpu.observables.droplet.surface_radius_map`) measured
<zeta_20^2> a factor ~1.5 below the reference's saved value — attributed
to the extraction method but not closed.  This module closes it: a
from-scratch marching cubes whose triangle table is GENERATED at import
time instead of transcribed, so its correctness is structural:

* for every one of the 256 corner-sign cases, the inside corners are
  split into edge-connected components; for each component the convex
  hull of (component corners + crossing-edge midpoints) is computed and
  the hull facets made of crossing points only form the surface patch
  (oriented inside->outside via the hull's outward normals).  This
  reproduces the classic Lorensen-Cline topology with the
  "separate positive corners" resolution of ambiguous faces; like every
  single-entry-per-case table (including the original), adjacent cubes
  that resolve a face ambiguity differently can leave a pinhole — rare
  for smooth interfaces and quantified by :func:`boundary_edge_count`.
* vertices live on grid-edge crossings with linear interpolation,
  shared between all incident triangles via global edge indexing —
  the same vertex model as skimage.

Validated in tests/test_marching_cubes.py: watertightness + Euler
characteristic 2 on sphere/ellipsoid fields, area convergence to
4 pi R^2, and zeta_lm parity with the ray extractor on smooth shapes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# corner c at ((c>>0)&1, (c>>1)&1, (c>>2)&1); 12 edges (lower corner,
# axis) with the lower corner having bit `axis` clear
_CORNER_XYZ = np.array([[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1]
                        for c in range(8)], dtype=np.int64)
_EDGES = [(c, a) for c in range(8) for a in range(3)
          if not (c >> a) & 1]                      # 12 (corner, axis)
_EDGE_ENDS = [(c, c | (1 << a)) for c, a in _EDGES]


def _components(inside):
    """Edge-connected components of a set of cube corners."""
    left, comps = set(inside), []
    while left:
        stack, comp = [left.pop()], set()
        while stack:
            c = stack.pop()
            comp.add(c)
            for a in range(3):
                nb = c ^ (1 << a)
                if nb in left:
                    left.discard(nb)
                    stack.append(nb)
        comps.append(sorted(comp))
    return comps


def _gen_tri_table():
    """256-entry triangle table, each entry a list of (e0, e1, e2)
    local-edge-index triples oriented with the normal pointing from
    inside (field > level) to outside."""
    from scipy.spatial import ConvexHull

    mids = {i: (_CORNER_XYZ[c0] + _CORNER_XYZ[c1]) / 2.0
            for i, (c0, c1) in enumerate(_EDGE_ENDS)}
    table = []
    for case in range(256):
        inside = [c for c in range(8) if (case >> c) & 1]
        tris = []
        for comp in _components(inside):
            cset = set(comp)
            cross = [i for i, (c0, c1) in enumerate(_EDGE_ENDS)
                     if (c0 in cset) != (c1 in cset)]
            if not cross:
                continue  # comp fills the whole cube
            pts = np.concatenate(
                [_CORNER_XYZ[comp].astype(float),
                 np.array([mids[i] for i in cross])])
            hull = ConvexHull(pts)
            nc = len(comp)
            for s, eq in zip(hull.simplices, hull.equations):
                if not all(v >= nc for v in s):
                    continue  # facet touches an inside corner
                tri = [cross[v - nc] for v in s]
                # orient with qhull's outward (inside->outside) normal
                p = pts[s]
                n = np.cross(p[1] - p[0], p[2] - p[0])
                if np.dot(n, eq[:3]) < 0:
                    tri = [tri[0], tri[2], tri[1]]
                tris.append(tuple(tri))
        table.append(tris)
    return table


_TRI_TABLE = None


def _tri_table():
    global _TRI_TABLE
    if _TRI_TABLE is None:
        _TRI_TABLE = _gen_tri_table()
    return _TRI_TABLE


def marching_cubes(field: np.ndarray, level: float
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """(verts, faces) of the `field == level` isosurface.

    Vertices in array-index coordinates on grid-edge crossings (linear
    interpolation), shared between incident triangles; faces oriented
    with normals pointing toward lower field values (out of the
    droplet).  Non-periodic, like the reference's skimage call — the
    surface must not touch the array boundary.
    """
    f = np.asarray(field, dtype=np.float64)
    inside = f > level
    nx, ny, nz = f.shape

    # cube case index from the 8 corner bits
    case = np.zeros((nx - 1, ny - 1, nz - 1), dtype=np.uint16)
    for c in range(8):
        dx, dy, dz = _CORNER_XYZ[c]
        case |= (inside[dx:nx - 1 + dx, dy:ny - 1 + dy,
                        dz:nz - 1 + dz].astype(np.uint16) << c)

    # one vertex per crossing grid edge, indexed (axis, base point)
    vid = []
    verts = []
    nvert = 0
    for a in range(3):
        sl_lo = tuple(slice(0, -1) if ax == a else slice(None)
                      for ax in range(3))
        sl_hi = tuple(slice(1, None) if ax == a else slice(None)
                      for ax in range(3))
        crossing = inside[sl_lo] != inside[sl_hi]
        ids = np.full(crossing.shape, -1, dtype=np.int64)
        n_a = int(crossing.sum())
        ids[crossing] = nvert + np.arange(n_a)
        nvert += n_a
        f0, f1 = f[sl_lo][crossing], f[sl_hi][crossing]
        t = np.clip((level - f0) / (f1 - f0), 0.0, 1.0)
        base = np.argwhere(crossing).astype(np.float64)
        base[:, a] += t
        vid.append(ids)
        verts.append(base)
    verts = (np.concatenate(verts) if nvert
             else np.zeros((0, 3)))

    # emit triangles grouped by case value
    table = _tri_table()
    faces = []
    cases_present = np.unique(case)
    for cv in cases_present:
        tris = table[cv]
        if not tris:
            continue
        cubes = np.argwhere(case == cv)          # (ncube, 3)
        for tri in tris:
            cols = []
            for e in tri:
                c0, a = _EDGES[e]
                off = _CORNER_XYZ[c0]
                cols.append(vid[a][cubes[:, 0] + off[0],
                                   cubes[:, 1] + off[1],
                                   cubes[:, 2] + off[2]])
            faces.append(np.stack(cols, axis=1))
    faces = (np.concatenate(faces) if faces
             else np.zeros((0, 3), dtype=np.int64))

    # drop unreferenced crossing vertices (array-boundary edges that
    # belong to no complete cube)
    used = np.zeros(nvert, dtype=bool)
    used[faces.ravel()] = True
    remap = np.cumsum(used) - 1
    return verts[used], remap[faces]


def boundary_edge_count(faces: np.ndarray) -> int:
    """Number of triangle edges not shared by exactly two faces — 0 for
    a watertight surface; counts the pinholes left by ambiguous-face
    resolution mismatches (see module docstring)."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]])
    e.sort(axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return int(np.sum(counts != 2))


def surface_area(verts: np.ndarray, faces: np.ndarray) -> float:
    """Total triangle area (the reference's S_fluctuating,
    Droplet_Fluctuation.ipynb cell 41)."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    return float(0.5 * np.linalg.norm(
        np.cross(v1 - v0, v2 - v0), axis=1).sum())


def vertex_solid_angle_weights(verts: np.ndarray, faces: np.ndarray
                               ) -> np.ndarray:
    """Per-vertex solid-angle weights of the reference's projection
    (cell 32): each face contributes its radially-projected solid angle
    area * |cos(n, r)| / r^2 at the centroid, split equally over its
    three vertices.  `verts` must already be COM-centered.  Sums to
    ~4 pi for a star-shaped surface around the origin."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    cross = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(cross, axis=1)
    centroid = (v0 + v1 + v2) / 3.0
    r0 = np.linalg.norm(centroid, axis=1) + 1e-15
    cos_nr = np.abs(np.einsum("ij,ij->i", cross, centroid)) \
        / (2.0 * area * r0 + 1e-30)
    omega = area * cos_nr / r0 ** 2
    w = np.zeros(len(verts))
    np.add.at(w, faces.ravel(), np.repeat(omega / 3.0, 3))
    return w


def harmonic_amplitudes(verts: np.ndarray, w: np.ndarray, lmax: int = 2
                        ) -> Dict[Tuple[int, int], complex]:
    """zeta_lm of the vertex radii by the reference's weighted-ratio
    estimator (cell 32):

        zeta_lm = sum(r * conj(Y_lm) * w) / sum(|Y_lm|^2 * w)

    over COM-centered vertices with solid-angle weights `w`.  Same
    convention as
    :func:`bflbm_tpu.observables.droplet.spherical_harmonic_amplitudes`
    (radius in length units; zeta_00 = R * sqrt(4 pi))."""
    from scipy.special import sph_harm_y

    r = np.linalg.norm(verts, axis=1)
    theta = np.arccos(np.clip(verts[:, 2] / (r + 1e-15), -1.0, 1.0))
    phi = np.arctan2(verts[:, 1], verts[:, 0])
    out = {}
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            ylm = sph_harm_y(l, m, theta, phi)
            num = np.sum(r * np.conj(ylm) * w)
            den = np.sum(np.abs(ylm) ** 2 * w)
            out[(l, m)] = complex(num / (den + 1e-30))
    return out


def mc_surface_amplitudes(rho: np.ndarray, com: np.ndarray,
                          level: float = None, lmax: int = 2):
    """End-to-end reference pipeline on one density frame: marching
    cubes at level (default (min+max)/2, cell 32) -> COM shift ->
    solid-angle weights -> zeta_lm.  Returns (amps, diag) where diag
    has n_verts / n_faces / area / boundary_edges / sum_w."""
    rho = np.asarray(rho)
    if level is None:
        level = 0.5 * (float(rho.min()) + float(rho.max()))
    verts, faces = marching_cubes(rho, level)
    sv = verts - np.asarray(com)
    w = vertex_solid_angle_weights(sv, faces)
    amps = harmonic_amplitudes(sv, w, lmax)
    diag = {"n_verts": len(verts), "n_faces": len(faces),
            "area": surface_area(verts, faces),
            "boundary_edges": boundary_edge_count(faces),
            "sum_w": float(w.sum())}
    return amps, diag
