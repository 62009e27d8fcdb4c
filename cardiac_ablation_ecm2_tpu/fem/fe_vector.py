"""Vector finite elements: lowest-order Nédélec H(curl) and Raviart-Thomas
H(div) spaces on tensor-product meshes.

Reference analog: ``ND_FECollection`` / ``RT_FECollection``
(``fem/fe_coll.hpp:499,406``) with basis definitions in ``fem/fe/fe_nd.cpp``
/ ``fe_rt.cpp`` and orientation handling via ``DofTransformation`` — here
orientation is a per-(element, local dof) **sign array** folded into the
restriction (tets need true transformations only at order ≥ 2; lowest order
everywhere reduces to signs).

Dof conventions:
* ND0: one dof per mesh edge = ∫_e E·t, global tangent from min→max vertex id.
* RT0: one dof per mesh face = ∫_f u·n, global normal = the face's canonical
  frame normal (first-axis × second-axis of the sorted-vertex canonical
  cycle, the same frame used for H1 face dofs).

Pullbacks (applied in ops/vecfe.py): H(curl) covariant E = J^{-T} Ê;
H(div) contravariant (Piola) u = J û / det J.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

from ..mesh.mesh import Mesh, unique_edges, unique_faces
from .geometry import DIMENSION, EDGES, FACES, Geometry, REF_VERTS
from .intrules import tensor_rule


# ----------------------------------------------------------------------------
# reference basis tables (lowest order, tensor geometries)
# ----------------------------------------------------------------------------


def _simplex_barycentric(geom: Geometry, pts: np.ndarray):
    """λ values and (constant) gradients for tri/tet reference elements."""
    dim = DIMENSION[geom]
    lam = np.concatenate(
        [1.0 - pts.sum(axis=1, keepdims=True), pts], axis=1
    )                                               # (nq, dim+1)
    grad = np.concatenate(
        [-np.ones((1, dim)), np.eye(dim)], axis=0
    )                                               # (dim+1, dim)
    return lam, grad


@functools.lru_cache(maxsize=None)
def nd0_basis(geom: Geometry, nq1d: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ND0 reference basis: returns (points (nq,dim), B (nq,ne_loc,dim),
    CURL (nq, ne_loc, ncurl)) with local edge functions oriented along the
    local EDGES direction (la → lb); ncurl = 1 (2D) or 3 (3D)."""
    dim = DIMENSION[geom]
    if geom in (Geometry.TRIANGLE, Geometry.TETRAHEDRON):
        # Whitney edge functions W_ab = λ_a ∇λ_b − λ_b ∇λ_a
        # (ND_TriangleElement / ND_TetrahedronElement order 1,
        # fem/fe/fe_nd.cpp; dof = edge-vector-weighted tangential moment)
        from .intrules import simplex_rule

        pts, _ = simplex_rule(dim, 2 * nq1d - 1)
        lam, grad = _simplex_barycentric(geom, pts)
        edges = EDGES[geom]
        nd = len(edges)
        ncurl = 1 if dim == 2 else 3
        B = np.zeros((len(pts), nd, dim))
        C = np.zeros((len(pts), nd, ncurl))
        for k, (a, b) in enumerate(edges):
            B[:, k] = lam[:, a, None] * grad[b] - lam[:, b, None] * grad[a]
            if dim == 2:
                C[:, k, 0] = 2.0 * (grad[a][0] * grad[b][1]
                                    - grad[a][1] * grad[b][0])
            else:
                C[:, k] = 2.0 * np.cross(grad[a], grad[b])
        return pts, B, C
    if geom == Geometry.PRISM:
        # lowest-order wedge Nédélec (ND_WedgeElement order 1,
        # fem/fe/fe_nd.hpp:343 = ND_tri ⊗ H1_seg ⊕ H1_tri ⊗ ND_seg):
        # horizontal edges carry 2D Whitney × {1−z, z}; vertical edges
        # carry λ_base · ẑ.  Edge dofs ∫_e E·t are bi-orthonormal by the
        # same arguments as on the tri/hex (cross-moments vanish).
        from .basis import prism_rule

        pts, _ = prism_rule(nq1d)
        lam2 = np.stack(
            [1.0 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], axis=1)
        grad2 = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        z = pts[:, 2]
        edges = EDGES[geom]
        B = np.zeros((len(pts), len(edges), 3))
        C = np.zeros((len(pts), len(edges), 3))
        for k, (a, b) in enumerate(edges):
            if (a < 3) == (b < 3):                     # horizontal edge
                a2, b2 = a % 3, b % 3
                W = (lam2[:, a2, None] * grad2[b2]
                     - lam2[:, b2, None] * grad2[a2])  # (nq, 2)
                h = z if a >= 3 else 1.0 - z
                dh = 1.0 if a >= 3 else -1.0
                B[:, k, :2] = W * h[:, None]
                # ∇×(W_x h, W_y h, 0) = (−W_y h′, W_x h′, curl₂(W)·h)
                C[:, k, 0] = -W[:, 1] * dh
                C[:, k, 1] = W[:, 0] * dh
                C[:, k, 2] = 2.0 * (grad2[a2][0] * grad2[b2][1]
                                    - grad2[a2][1] * grad2[b2][0]) * h
            else:                                       # vertical edge
                lo = a % 3
                sgn = 1.0 if b > a else -1.0            # oriented a→b
                B[:, k, 2] = sgn * lam2[:, lo]
                # ∇×(0,0,λ) = (∂_y λ, −∂_x λ, 0)
                C[:, k, 0] = sgn * grad2[lo][1]
                C[:, k, 1] = -sgn * grad2[lo][0]
        return pts, B, C
    if geom == Geometry.PYRAMID:
        # lowest-order pyramid Nédélec via the Gradinaru–Hiptmair degenerate
        # -hex construction (the composite/rational Whitney pyramid; MFEM's
        # arbitrary-order analog is ND_FuentesPyramidElement,
        # fem/fe/fe_nd.hpp:427): covariant pullback of the hex ND0 basis
        # through the collapse map Φ(u,v,w) = (u(1−w), v(1−w), w), keeping
        # the 8 functions of the non-degenerate edges (4 base + 4 slant).
        # Covariance preserves edge tangential moments, so the dofs stay
        # bi-orthonormal; conformity of the composite element is the GH
        # theorem.  Quadrature points keep z < 1, away from the apex pole.
        from .basis import pyramid_rule

        pts, _ = pyramid_rule(nq1d)
        om = 1.0 - pts[:, 2]
        u, v = pts[:, 0] / om, pts[:, 1] / om
        hexpts = np.stack([u, v, pts[:, 2]], axis=1)
        Bh, Ch = _tensor_nd0_tables(Geometry.CUBE, hexpts)
        keep = [0, 1, 2, 3, 8, 9, 10, 11]     # base + vertical hex edges
        Bh, Ch = Bh[:, keep], Ch[:, keep]
        B = np.zeros_like(Bh)
        C = np.zeros_like(Ch)
        o = om[:, None]
        # E = DΦ^{-T} Ê with DΦ^{-T} = [[1/ω,0,0],[0,1/ω,0],[u/ω,v/ω,1]]
        B[..., 0] = Bh[..., 0] / o
        B[..., 1] = Bh[..., 1] / o
        B[..., 2] = (u[:, None] * Bh[..., 0] + v[:, None] * Bh[..., 1]) / o \
            + Bh[..., 2]
        # curl E = DΦ (∇̂×Ê)/det,  det = ω²
        C[..., 0] = (om[:, None] * Ch[..., 0] - u[:, None] * Ch[..., 2]) / o**2
        C[..., 1] = (om[:, None] * Ch[..., 1] - v[:, None] * Ch[..., 2]) / o**2
        C[..., 2] = Ch[..., 2] / o**2
        return pts, B, C
    pts, _ = tensor_rule(dim, nq1d)
    B, C = _tensor_nd0_tables(geom, pts)
    return pts, B, C


def _tensor_nd0_tables(geom: Geometry, pts: np.ndarray):
    """Tensor-geometry ND0 basis/curl tables at arbitrary points."""
    dim = DIMENSION[geom]
    edges = EDGES[geom]
    rv = REF_VERTS[geom]
    nd = len(edges)
    B = np.zeros((len(pts), nd, dim))
    ncurl = 1 if dim == 2 else 3
    C = np.zeros((len(pts), nd, ncurl))
    for k, (a, b) in enumerate(edges):
        va, vb = rv[a], rv[b]
        d = int(np.argmax(np.abs(vb - va)))          # edge direction axis
        sgn = 1.0 if vb[d] > va[d] else -1.0
        # φ = sgn · ê_d · Π_{m≠d} λ_m,  λ_m = (1-x_m) if edge at x_m=0 else x_m
        other = [m for m in range(dim) if m != d]
        lam = np.ones(len(pts))
        dlam = {m: np.ones(len(pts)) for m in other}
        for m in other:
            c = va[m]                                 # 0 or 1: edge position
            lam_m = pts[:, m] if c > 0.5 else 1.0 - pts[:, m]
            dl_m = 1.0 if c > 0.5 else -1.0
            lam = lam * lam_m
            for mm in other:
                if mm != m:
                    dlam[mm] = dlam[mm] * lam_m
            dlam[m] = dlam[m] * dl_m
        B[:, k, d] = sgn * lam
        # curl: in 3D (∇×φ)_i = ε_{i j d} ∂_j (sgn·lam); 2D scalar curl =
        # ∂_x φ_y − ∂_y φ_x
        if dim == 2:
            j = other[0]
            # φ has only component d; scalar curl = ±∂_j φ_d
            s = 1.0 if (j, d) == (0, 1) else -1.0
            C[:, k, 0] = s * sgn * dlam[j]
        else:
            for j in other:
                i = 3 - j - d                          # the remaining axis
                eps = _levi(i, j, d)
                C[:, k, i] += eps * sgn * dlam[j]
    return B, C


def _levi(i, j, k):
    if (i, j, k) in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        return 1.0
    if (i, j, k) in ((0, 2, 1), (2, 1, 0), (1, 0, 2)):
        return -1.0
    return 0.0


@functools.lru_cache(maxsize=None)
def rt0_basis(geom: Geometry, nq1d: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RT0 reference basis: (points, B (nq,nf_loc,dim), DIV (nq,nf_loc)),
    oriented along each local face's OUTWARD normal (unit total flux)."""
    dim = DIMENSION[geom]
    if geom in (Geometry.TRIANGLE, Geometry.TETRAHEDRON):
        # φ_f = (x − v_opp) / (dim · V_ref): unit outward flux through f,
        # zero through the faces containing v_opp (RT_TriangleElement /
        # RT_TetrahedronElement order 0, fem/fe/fe_rt.cpp)
        from .intrules import simplex_rule

        pts, _ = simplex_rule(dim, 2 * nq1d - 1)
        rv = REF_VERTS[geom]
        faces = FACES[geom]
        vref = 0.5 if dim == 2 else 1.0 / 6.0
        c = 1.0 / (dim * vref)
        nf = len(faces)
        B = np.zeros((len(pts), nf, dim))
        D = np.zeros((len(pts), nf))
        allv = set(range(dim + 1))
        for k, fverts in enumerate(faces):
            opp = (allv - set(fverts)).pop()
            B[:, k] = c * (pts - rv[opp])
            D[:, k] = c * dim
        return pts, B, D
    if geom == Geometry.PYRAMID:
        # lowest-order pyramid Raviart-Thomas (MFEM's arbitrary-order analog
        # is RT_FuentesPyramidElement, fem/fe/fe_rt.hpp:346).  Unlike ND0,
        # the degenerate-hex Piola pullback does NOT contain constants, so
        # the element is built directly: span {ê_x, ê_y, ê_z, r,
        # s = (1 − x/(1−z), 0, 0)}.  Every member has a CONSTANT normal
        # trace on every (planar) face — s·(1,0,1) ≡ 0 on the slant x+z=1
        # since x/(1−z) = 1 there, and s·(−1,0,0) = −1 on x=0 — so the
        # assembled space is H(div)-conforming against tet/hex/wedge RT0
        # neighbors, with P0³ ⊕ span{r} ⊂ V (div ∋ constants).  Symmetric
        # generator choices (e.g. ((1−z)x, (1−z)y, −(1−z)²)) all contain a
        # zero-flux bubble (r − ê_z − that), so unisolvence forces the
        # x-rational pick; the x↔y asymmetry affects only the interior
        # span, never the P0 face traces.  Basis = flux-dual combination
        # (5×5 Vandermonde of face fluxes).
        from .basis import pyramid_rule

        pts, _ = pyramid_rule(nq1d)
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        one, zero = np.ones_like(z), np.zeros_like(z)
        gens = np.stack([
            np.stack([one, zero, zero], -1),
            np.stack([zero, one, zero], -1),
            np.stack([zero, zero, one], -1),
            np.stack([x, y, z], -1),
            np.stack([1.0 - x / (1 - z), zero, zero], -1),
        ], axis=1)                                    # (nq, 5, 3)
        gdiv = np.stack([zero, zero, zero, 3 * one, -1.0 / (1 - z)], axis=1)
        # face fluxes of the generators: constant trace × area, evaluated
        # at the face centroid with the outward normal
        rv = REF_VERTS[geom]
        faces = FACES[geom]
        V5 = np.zeros((5, 5))                         # V5[i,j] = flux_i(G_j)
        cent_el = rv.mean(axis=0)

        def gen_at(p):
            px, py, pz = p
            return np.array([
                [1, 0, 0], [0, 1, 0], [0, 0, 1], [px, py, pz],
                [1.0 - px / (1 - pz), 0, 0]])

        for i, fverts in enumerate(faces):
            fv = rv[list(fverts)]
            c = fv.mean(axis=0)
            if len(fverts) == 4:
                nvec = np.cross(fv[1] - fv[0], fv[3] - fv[0])
                area = abs(np.linalg.norm(nvec))      # unit-square base
            else:
                nvec = np.cross(fv[1] - fv[0], fv[2] - fv[0])
                area = 0.5 * np.linalg.norm(nvec)
            n = nvec / np.linalg.norm(nvec)
            if np.dot(n, c - cent_el) < 0:
                n = -n
            V5[i] = gen_at(c) @ n * area
        C5 = np.linalg.inv(V5)                        # basis = Σ_j C5[j,i] G_j
        B = np.einsum("qjd,ji->qid", gens, C5)
        D = np.einsum("qj,ji->qi", gdiv, C5)
        return pts, B, D
    if geom == Geometry.PRISM:
        # lowest-order wedge Raviart-Thomas (RT_WedgeElement order 1,
        # fem/fe/fe_rt.hpp:280): tri faces carry 2(z−1)ẑ / 2z ẑ (unit
        # outward flux through the z=0/z=1 triangles, zero through the
        # quads); quad faces carry the extruded 2D RT0-triangle edge
        # function (x⃗₂D − v_opp, 0) — unit flux through its own quad,
        # zero through every other face.
        from .basis import prism_rule

        pts, _ = prism_rule(nq1d)
        faces = FACES[geom]
        rv = REF_VERTS[geom]
        B = np.zeros((len(pts), len(faces), 3))
        D = np.zeros((len(pts), len(faces)))
        for k, fverts in enumerate(faces):
            if len(fverts) == 3:
                at_top = rv[list(fverts)][:, 2].mean() > 0.5
                B[:, k, 2] = 2.0 * (pts[:, 2] if at_top else pts[:, 2] - 1.0)
                D[:, k] = 2.0
            else:
                base = {v % 3 for v in fverts}          # the 2 base vertices
                opp = ({0, 1, 2} - base).pop()
                B[:, k, :2] = pts[:, :2] - rv[opp][:2]
                D[:, k] = 2.0
        return pts, B, D
    pts, _ = tensor_rule(dim, nq1d)
    B, D = _tensor_rt0_tables(geom, pts)
    return pts, B, D


def _tensor_rt0_tables(geom: Geometry, pts: np.ndarray):
    """Tensor-geometry RT0 basis/divergence tables at arbitrary points."""
    dim = DIMENSION[geom]
    faces = FACES[geom]
    rv = REF_VERTS[geom]
    nf = len(faces)
    B = np.zeros((len(pts), nf, dim))
    D = np.zeros((len(pts), nf))
    for k, fverts in enumerate(faces):
        ctr = rv[list(fverts)].mean(axis=0)
        d = int(np.argmax(np.abs(ctr - 0.5)))        # face-normal axis
        at_one = ctr[d] > 0.5
        # φ = x_d ê_d (face x_d=1, outward +ê_d) or (x_d − 1) ê_d (x_d=0,
        # outward −ê_d ⇒ flux +1)
        if at_one:
            B[:, k, d] = pts[:, d]
            D[:, k] = 1.0
        else:
            B[:, k, d] = pts[:, d] - 1.0
            D[:, k] = 1.0
    return B, D


# ----------------------------------------------------------------------------
# spaces
# ----------------------------------------------------------------------------


@dataclasses.dataclass(eq=False)
class NDSpace:
    """Lowest-order Nédélec space: dofs on mesh edges."""

    mesh: Mesh
    order: int = 1

    def __post_init__(self):
        assert self.order == 1, "ND: lowest order only (this round)"
        edges, elem_edge = unique_edges(self.mesh)
        self.ndof = len(edges)
        self.gather_map = elem_edge.astype(np.int32)       # (ne, n_loc_edges)
        # sign: local edge (la→lb) vs global (min→max)
        loc = np.array(EDGES[self.mesh.geom])
        ev = self.mesh.elements[:, loc]                    # (ne, nle, 2)
        self.signs = np.where(ev[:, :, 0] < ev[:, :, 1], 1.0, -1.0)

    @property
    def nd_elem(self):
        return self.gather_map.shape[1]

    def essential_dofs(self, bdr_marker=None) -> np.ndarray:
        """Edge dofs on the marked boundary (tangential-trace dofs; the
        ex3-class n×E = 0 constraint).  ``bdr_marker=None`` → all boundary
        attributes (GetEssentialTrueDofs analog, fem/fespace.hpp:1357)."""
        return _boundary_edge_dofs(self.mesh, bdr_marker)


def _boundary_edge_dofs(mesh, bdr_marker=None) -> np.ndarray:
    from ..mesh.mesh import unique_edges

    edges, _ = unique_edges(mesh)
    bdr = mesh.boundary
    if bdr_marker is not None:
        sel = np.isin(mesh.bdr_attributes, np.asarray(list(bdr_marker)))
        bdr = bdr[sel]
    nfv = bdr.shape[1]
    if mesh.dim == 2:
        bedges = np.sort(bdr, axis=1)
    else:
        pairs = [
            np.sort(bdr[:, [i, (i + 1) % nfv]], axis=1) for i in range(nfv)
        ]
        bedges = np.concatenate(pairs, axis=0)
    key = edges[:, 0] * (mesh.nv + 1) + edges[:, 1]
    bkey = np.unique(bedges[:, 0] * (mesh.nv + 1) + bedges[:, 1])
    return np.nonzero(np.isin(key, bkey))[0].astype(np.int32)


def _boundary_face_dofs(mesh, bdr_marker=None) -> np.ndarray:
    from ..mesh.mesh import unique_edges, unique_faces

    if mesh.dim == 2:
        faces, _ = unique_edges(mesh)
    else:
        faces, _ = unique_faces(mesh)
    bdr = mesh.boundary
    if bdr_marker is not None:
        sel = np.isin(mesh.bdr_attributes, np.asarray(list(bdr_marker)))
        bdr = bdr[sel]
    bsort = np.sort(bdr, axis=1)
    base = np.int64(mesh.nv + 1)
    def enc(rows):
        k = np.zeros(len(rows), dtype=np.int64)
        for c in range(rows.shape[1]):
            k = k * base + rows[:, c]
        return k
    fs = np.sort(faces, axis=1)
    return np.nonzero(np.isin(enc(fs), np.unique(enc(bsort))))[0] \
        .astype(np.int32)


@dataclasses.dataclass(eq=False)
class RTSpace:
    """Lowest-order Raviart-Thomas space: dofs on mesh faces."""

    mesh: Mesh
    order: int = 1

    def __post_init__(self):
        assert self.order == 1, "RT: lowest order only (this round)"
        mesh = self.mesh
        if mesh.dim == 2:
            faces, elem_face = unique_edges(mesh)
            self.ndof = len(faces)
            self.gather_map = elem_face.astype(np.int32)
            # canonical 2D face (edge) normal: rotate the min→max tangent by
            # -90°; local outward normal from the element side
            loc = np.array(FACES[mesh.geom])               # edges as faces
            ev = mesh.elements[:, loc]                     # (ne, nlf, 2)
            V = mesh.vertices
            t_canon = np.where(
                (ev[:, :, 0] < ev[:, :, 1])[..., None],
                V[ev[:, :, 1]] - V[ev[:, :, 0]],
                V[ev[:, :, 0]] - V[ev[:, :, 1]],
            )
            n_canon = np.stack([t_canon[..., 1], -t_canon[..., 0]], axis=-1)
            cent = V[mesh.elements].mean(axis=1)           # (ne, 2)
            mid = 0.5 * (V[ev[:, :, 0]] + V[ev[:, :, 1]])
            outward = mid - cent[:, None, :]
            self.signs = np.where(
                np.sum(n_canon * outward, axis=-1) > 0, 1.0, -1.0
            )
        else:
            faces, elem_face = unique_faces(mesh)
            self.ndof = len(faces)
            self.gather_map = elem_face.astype(np.int32)
            # canonical normal: from the canonical cyclic frame of each face;
            # sign = alignment of the element's outward normal with it
            loc_faces = FACES[mesh.geom]
            V = mesh.vertices
            ne = mesh.ne
            signs = np.zeros((ne, len(loc_faces)))
            cent = V[mesh.elements].mean(axis=1)
            for lf, fverts in enumerate(loc_faces):
                gf = mesh.elements[:, list(fverts)]        # (ne, nfv) cyclic
                nfv = gf.shape[1]
                if nfv == 3:
                    # canonical tri-face normal from the sorted vertex triple
                    s = np.sort(gf, axis=1)
                    n_canon = np.cross(V[s[:, 1]] - V[s[:, 0]],
                                       V[s[:, 2]] - V[s[:, 0]])
                else:
                    r = np.argmin(gf, axis=1)
                    nxt = gf[np.arange(ne), (r + 1) % nfv]
                    prv = gf[np.arange(ne), (r - 1) % nfv]
                    d = np.where(nxt < prv, 1, -1)
                    g0 = gf[np.arange(ne), r]
                    g1 = gf[np.arange(ne), (r + d) % nfv]
                    g3 = gf[np.arange(ne), (r - d) % nfv]
                    n_canon = np.cross(V[g1] - V[g0], V[g3] - V[g0])
                mid = V[gf].mean(axis=1)
                outward = mid - cent
                signs[:, lf] = np.where(
                    np.sum(n_canon * outward, axis=-1) > 0, 1.0, -1.0
                )
            self.signs = signs

    @property
    def nd_elem(self):
        return self.gather_map.shape[1]

    def essential_dofs(self, bdr_marker=None) -> np.ndarray:
        """Face dofs on the marked boundary (normal-trace dofs; the
        ex4-class u·n constraint)."""
        return _boundary_face_dofs(self.mesh, bdr_marker)
