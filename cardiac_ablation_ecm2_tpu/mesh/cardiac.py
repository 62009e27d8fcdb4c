"""Cardiac-like unstructured benchmark meshes (BASELINE.json config 5).

The target workload is the Pennes bioheat + RF ablation solve on a *real*
unstructured hex/tet cardiac mesh — not a Cartesian lattice.  This module
generates reproducible cardiac-like geometries entirely in numpy:

* :func:`make_cardiac_tet_mesh` — a tissue block with a hemispherical
  electrode notch, meshed by 3D Delaunay over jittered+warped lattice
  points: genuinely unstructured connectivity (irregular vertex valence,
  no lexicographic structure, every element a distinct Jacobian).
* :func:`make_cardiac_hex_mesh` — the same block/notch warp applied to a
  hex lattice (boundary-preserving interior jitter + smooth non-affine
  warp): lattice topology but fully general geometry, so no qdata
  uniformity shortcut applies.

Boundary attributes: 1 = outer tissue surface (body), 2 = electrode
surface (the notch), 3 = ground pad (z=0 face).  Units are mm.

The meshes are written with ``io.write_mfem_mesh`` and fed bit-identically
to the reference MFEM CPU driver (``tools/mfem_bioheat_bench.cpp``) for the
apples-to-apples wall-clock comparison recorded in BASELINE.md.
"""

from __future__ import annotations

import numpy as np

from .mesh import Geometry, Mesh, make_cartesian_3d

#: local faces of tet (v0,v1,v2,v3) with outward normals (positive volume)
_TET_FACES = ((1, 2, 3), (0, 3, 2), (0, 1, 3), (0, 2, 1))


def _warp(pts: np.ndarray, L: np.ndarray) -> np.ndarray:
    """Smooth boundary-preserving non-affine warp: every interior point
    moves, boundary planes map to themselves (sin vanishes at 0 and L)."""
    u = pts / L                                          # in [0,1]^3
    s = np.sin(np.pi * u)
    w = np.empty_like(pts)
    w[:, 0] = pts[:, 0] + 0.06 * L[0] * s[:, 0] * np.sin(2.3 * u[:, 1] + 1.7 * u[:, 2])
    w[:, 1] = pts[:, 1] + 0.06 * L[1] * s[:, 1] * np.sin(1.9 * u[:, 2] + 2.1 * u[:, 0])
    w[:, 2] = pts[:, 2] + 0.05 * L[2] * s[:, 2] * np.sin(2.7 * u[:, 0] + 1.3 * u[:, 1])
    return w


def _jitter(pts: np.ndarray, h: np.ndarray, L: np.ndarray, amp: float,
            rng) -> np.ndarray:
    """Random per-point jitter, zeroed per-coordinate on boundary planes so
    faces stay planar (boundary attribution by plane test stays exact)."""
    d = rng.uniform(-amp, amp, size=pts.shape) * h
    for c in range(3):
        on_bdr = (np.abs(pts[:, c]) < 1e-12) | (np.abs(pts[:, c] - L[c]) < 1e-12)
        d[on_bdr, c] = 0.0
    return pts + d


def _electrode_center(L: np.ndarray) -> np.ndarray:
    return np.array([L[0] / 2, L[1] / 2, L[2]])


def _part1by2(x: np.ndarray) -> np.ndarray:
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton_argsort(cent: np.ndarray, L: np.ndarray) -> np.ndarray:
    """Element order along a Morton (Z-order) curve of the centroids.

    Coherent element numbering is what keeps the block-gather restriction's
    per-row source-block count K small (fem/restriction.py K_MAX): 128
    consecutive elements then touch a compact dof neighborhood.  Delaunay
    output order is essentially random and measured K≈190 (unusable)."""
    q = np.clip((cent / L * 1024.0).astype(np.int64), 0, 1023)
    code = (
        (_part1by2(q[:, 2]) << 2)
        | (_part1by2(q[:, 1]) << 1)
        | _part1by2(q[:, 0])
    )
    return np.argsort(code, kind="stable")


def make_cardiac_tet_mesh(
    n: int = 24,
    lengths=(40.0, 40.0, 20.0),
    electrode_radius: float = 4.0,
    jitter: float = 0.28,
    seed: int = 0,
) -> Mesh:
    """Unstructured tet mesh of the tissue block with an electrode notch.

    ``n`` = base lattice resolution along x/y (z scales with aspect);
    element count ≈ 6·n·n·nz.  n=24 → ~80k tets (tests); n≈52 → ~1M tets
    (the BASELINE config-5 scale).
    """
    from scipy.spatial import Delaunay

    L = np.asarray(lengths, dtype=np.float64)
    rng = np.random.default_rng(seed)
    nz = max(2, int(round(n * L[2] / L[0])))
    ns = np.array([n, max(2, int(round(n * L[1] / L[0]))), nz])
    h = L / ns
    axes = [np.linspace(0.0, L[c], ns[c] + 1) for c in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
    pts = _jitter(pts, h, L, jitter, rng)
    pts = _warp(pts, L)

    tri = Delaunay(pts)
    tets = tri.simplices.astype(np.int64)
    v = pts[tets]
    vol6 = np.einsum(
        "ij,ij->i",
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]),
        v[:, 3] - v[:, 0],
    )
    # orient positive, drop Delaunay slivers (coplanar lattice degeneracies)
    neg = vol6 < 0
    tets[neg] = tets[neg][:, [0, 2, 1, 3]]
    hmin = float(h.min())
    keep = np.abs(vol6) > 1e-6 * hmin**3
    tets = tets[keep]

    # carve the hemispherical electrode notch at the top-center
    ctr = _electrode_center(L)
    cent = pts[tets].mean(axis=1)
    outside = np.linalg.norm(cent - ctr, axis=1) > electrode_radius
    tets, cent = tets[outside], cent[outside]
    tets = tets[_morton_argsort(cent, L)]

    return _finish_tet_mesh(pts, tets, L, electrode_radius)


def _finish_tet_mesh(pts, tets, L, electrode_radius) -> Mesh:
    ctr = _electrode_center(L)
    faces = np.concatenate([tets[:, list(f)] for f in _TET_FACES], axis=0)
    key = np.sort(faces, axis=1)
    _uniq, inv, cnt = np.unique(
        key, axis=0, return_inverse=True, return_counts=True
    )
    btris = faces[cnt[inv] == 1]

    # drop vertices orphaned by the notch carve
    used = np.zeros(len(pts), dtype=bool)
    used[tets.ravel()] = True
    remap = -np.ones(len(pts), dtype=np.int64)
    remap[used] = np.arange(int(used.sum()))
    pts = pts[used]
    tets = remap[tets]
    btris = remap[btris]

    fc = pts[btris].mean(axis=1)
    battr = np.ones(len(btris), dtype=np.int64)
    battr[np.linalg.norm(fc - ctr, axis=1) <= 1.35 * electrode_radius] = 2
    battr[fc[:, 2] < 1e-9] = 3
    return Mesh(
        geom=Geometry.TETRAHEDRON,
        vertices=pts,
        elements=tets,
        attributes=np.ones(len(tets), dtype=np.int64),
        boundary=btris,
        bdr_attributes=battr,
    )


def make_cardiac_hex_mesh(
    n: int = 24,
    lengths=(40.0, 40.0, 20.0),
    electrode_radius: float = 4.0,
    jitter: float = 0.22,
    seed: int = 0,
) -> Mesh:
    """Hex mesh of the block with general (warped + jittered) geometry and
    the electrode notch carved out.  Lattice topology, but every element
    has a distinct Jacobian (no uniform-qdata collapse applies) and the
    carve makes the boundary genuinely irregular.  n=100 → ~1M hexes."""
    rng = np.random.default_rng(seed)
    L = np.asarray(lengths, dtype=np.float64)
    ns = np.array(
        [n, max(2, int(round(n * L[1] / L[0]))),
         max(2, int(round(n * L[2] / L[0])))]
    )
    m = make_cartesian_3d(*map(int, ns), *map(float, L))
    pts = _jitter(m.vertices.copy(), L / ns, L, jitter, rng)
    pts = _warp(pts, L)

    ctr = _electrode_center(L)
    cent = pts[m.elements].mean(axis=1)
    keep = np.linalg.norm(cent - ctr, axis=1) > electrode_radius
    hexes, cent = m.elements[keep], cent[keep]
    hexes = hexes[_morton_argsort(cent, L)]

    # boundary quads of the carved mesh: faces appearing exactly once
    _HEX_FACES = (
        (3, 2, 1, 0), (0, 1, 5, 4), (1, 2, 6, 5),
        (2, 3, 7, 6), (3, 0, 4, 7), (4, 5, 6, 7),
    )
    faces = np.concatenate([hexes[:, list(f)] for f in _HEX_FACES], axis=0)
    key = np.sort(faces, axis=1)
    _u, inv, cnt = np.unique(key, axis=0, return_inverse=True,
                             return_counts=True)
    bquads = faces[cnt[inv] == 1]

    used = np.zeros(len(pts), dtype=bool)
    used[hexes.ravel()] = True
    remap = -np.ones(len(pts), dtype=np.int64)
    remap[used] = np.arange(int(used.sum()))
    pts = pts[used]
    hexes = remap[hexes]
    bquads = remap[bquads]

    fc = pts[bquads].mean(axis=1)
    battr = np.ones(len(bquads), dtype=np.int64)
    battr[np.linalg.norm(fc - ctr, axis=1) <= 1.6 * electrode_radius] = 2
    battr[fc[:, 2] < 1e-9] = 3
    return Mesh(
        geom=Geometry.CUBE,
        vertices=pts,
        elements=hexes,
        attributes=np.ones(len(hexes), dtype=np.int64),
        boundary=bquads,
        bdr_attributes=battr,
    )


def make_cardiac_hex_lattice(
    n: int = 24,
    lengths=(40.0, 40.0, 20.0),
    electrode_radius: float = 4.0,
    jitter: float = 0.22,
    seed: int = 0,
):
    """Masked-lattice form of :func:`make_cardiac_hex_mesh`: the FULL
    warped/jittered hex lattice plus a keep-mask marking the elements the
    carved mesh retains.

    Same vertices/warp/carve as the carved mesh (same seed ⇒ identical
    geometry), but neither Morton reorder nor vertex remap: element order
    stays x-fastest lexicographic so a ``CartesianFESpace`` over the full
    lattice (gather-free structured restriction) can run the carved problem
    by zeroing the removed elements' qdata (``BioheatOperator.elem_mask``)
    and pinning the carved-surface + inactive dofs
    (``fem.masked_lattice.masked_lattice_essential``).  Returns
    ``(mesh_full, keep, ns)`` with ``ns`` the per-axis element counts.
    """
    rng = np.random.default_rng(seed)
    L = np.asarray(lengths, dtype=np.float64)
    ns = np.array(
        [n, max(2, int(round(n * L[1] / L[0]))),
         max(2, int(round(n * L[2] / L[0])))]
    )
    m = make_cartesian_3d(*map(int, ns), *map(float, L))
    pts = _jitter(m.vertices.copy(), L / ns, L, jitter, rng)
    pts = _warp(pts, L)

    ctr = _electrode_center(L)
    cent = pts[m.elements].mean(axis=1)
    keep = np.linalg.norm(cent - ctr, axis=1) > electrode_radius
    mesh_full = Mesh(
        geom=Geometry.CUBE,
        vertices=pts,
        elements=m.elements,
        attributes=m.attributes,
        boundary=m.boundary,
        bdr_attributes=m.bdr_attributes,
    )
    return mesh_full, keep, tuple(int(v) for v in ns)


def rf_source_q(center, sigma: float = 3.0, power: float = 5e6):
    """Gaussian SAR-like volumetric source [W/m³-ish] centered at the
    electrode tip — the bench's stand-in for the coupled RF Joule term."""
    c = np.asarray(center)

    def q(x):
        r2 = ((x - c) ** 2).sum(axis=-1)
        return power * np.exp(-r2 / (2.0 * sigma**2))

    return q
