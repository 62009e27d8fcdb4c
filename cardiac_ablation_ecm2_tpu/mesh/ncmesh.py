"""Nonconforming (hanging-node) quad/hex AMR with 2:1 balance.

Reference analog: ``NCMesh`` (``mesh/ncmesh.hpp:189``) — re-scoped per
SURVEY.md §7 hard-parts item 4 from the reference's 11k-LoC pointer octree to
**array-encoded 2:1 refinement**: isotropic quad/hex refinement with hanging
vertices, constraints recovered *geometrically* (a hanging vertex sits
bit-exactly at the midpoint of a neighbor's unrefined edge / center of an
unrefined face, because both sides compute it identically: edge midpoints as
(va+vb)/2 and face/cell centers as sorted-global-id-order averages), and 2:1
balance enforced by marking propagation.

The companion ``fem/ncfespace.py`` builds the conforming-constraint
prolongation (the analog of ``FiniteElementSpace::cP``, fespace.hpp:299):
1D edge interpolation for hanging edges, 2D tensor face interpolation for
hanging faces (hexes).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from ..fem.geometry import Geometry
from .mesh import Mesh


@dataclasses.dataclass(eq=False)
class NCQuadMesh:
    """A quad mesh plus its hanging-vertex constraints.

    ``constraints``: (ns, 3) int array of rows (hanging_vertex, master_a,
    master_b) — the hanging vertex is the midpoint of master edge (a, b).
    """

    mesh: Mesh
    constraints: np.ndarray

    @property
    def n_hanging(self) -> int:
        return len(self.constraints)


def _edge_set(elements) -> set:
    s = set()
    for t in elements:
        for i in range(4):
            a, b = int(t[i]), int(t[(i + 1) % 4])
            s.add((a, b) if a < b else (b, a))
    return s


def _find_constraints(mesh: Mesh) -> np.ndarray:
    """Geometric hanging-vertex detection: vertex v is hanging on edge (a,b)
    iff (a,b) is an element edge of some element, (a,v) and (v,b) are element
    edges of others, and pos(v) == (pos(a)+pos(b))/2 bit-exactly."""
    edges = _edge_set(mesh.elements)
    pos = {}
    for i, p in enumerate(mesh.vertices):
        pos.setdefault(tuple(p), i)
    rows = []
    for (a, b) in edges:
        mid = 0.5 * (mesh.vertices[a] + mesh.vertices[b])
        v = pos.get(tuple(mid))
        if v is None or v == a or v == b:
            continue
        e1 = (a, v) if a < v else (v, a)
        e2 = (v, b) if v < b else (b, v)
        if e1 in edges and e2 in edges:
            rows.append((v, a, b))
    return np.array(rows, dtype=np.int64).reshape(-1, 3)


def refine_quads(nc: NCQuadMesh, marks: np.ndarray,
                 balance: bool = True) -> Tuple["NCQuadMesh", np.ndarray]:
    """Refine marked quads 4-ways; re-derive constraints; enforce 2:1
    balance by propagation.  Returns (new NCQuadMesh, parent_of)."""
    marks = np.asarray(marks, dtype=bool)
    return refine_quads_aniso(nc, np.where(marks, ISO, 0), balance=balance)


# refinement types (NCMesh ref_type bitmask analog, mesh/ncmesh.hpp:33:
# X = split normal to the local x axis, Y = normal to y, ISO = both)
X, Y, ISO = 1, 2, 3


def refine_quads_aniso(nc: NCQuadMesh, types: np.ndarray,
                       balance: bool = True
                       ) -> Tuple["NCQuadMesh", np.ndarray]:
    """Anisotropically refine quads (reference ``NCMesh::Refine`` with
    ref_type, mesh/ncmesh.hpp:33,176): ``types[e]`` ∈ {0, X, Y, ISO}.

    X splits the element across its local first axis (2 children sharing
    the midpoints of local edges 0/2), Y across the second (edges 1/3),
    ISO 4-ways.  Constraints are re-derived geometrically — anisotropic
    hanging vertices are midpoints like isotropic ones, so the downstream
    NCFESpace prolongation is unchanged.  2:1 balance propagates *typed*
    forced refinements: the owner of an over-constrained master edge is
    split in exactly the direction that subdivides that edge."""
    mesh = nc.mesh
    assert mesh.geom == Geometry.SQUARE
    types = np.asarray(types, dtype=np.int64).copy()

    for _ in range(64):
        new = _refine_once(mesh, types)
        cons = _find_constraints(new.mesh_out)
        if not balance:
            break
        # 2:1 violation, detected geometrically: an *element* edge (a,b)
        # whose midpoint vertex exists (⇒ the neighbor refined once) AND a
        # quarter-point vertex exists (⇒ the neighbor refined twice).  The
        # owner must be split across that edge.  (Constraint-chain
        # detection is insufficient: after a level-2 jump the intermediate
        # half-edges are no longer element edges, so the deeper hanging
        # vertices produce no constraint rows at all.)
        bad_edges = _overrefined_edges(new.mesh_out)
        if not bad_edges:
            break
        # owners of bad master edges refine in the edge's direction
        extra = np.zeros(mesh.ne, dtype=np.int64)
        for e in range(mesh.ne):
            t = mesh.elements[e]
            for i in range(4):
                a, b = int(t[i]), int(t[(i + 1) % 4])
                key = (min(a, b), max(a, b))
                if key in bad_edges:
                    extra[e] |= X if i in (0, 2) else Y
        grown = (types | extra) != types
        if not grown.any():
            break
        types |= extra
    return NCQuadMesh(mesh=new.mesh_out, constraints=cons), new.parent_of


def _overrefined_edges(mesh: Mesh) -> set:
    """Element edges (as *original-vertex-id* keys) with a level-≥2 jump:
    midpoint and at least one quarter-point vertex exist.  Keys are mapped
    back to pre-refinement vertex ids by position where possible — vertex
    ids of surviving vertices are stable across ``_refine_once``."""
    pos = {tuple(p): i for i, p in enumerate(mesh.vertices)}
    bad = set()
    for t in mesh.elements:
        for i in range(4):
            a, b = int(t[i]), int(t[(i + 1) % 4])
            pa, pb = mesh.vertices[a], mesh.vertices[b]
            pm = 0.5 * (pa + pb)
            vm = pos.get(tuple(pm))
            if vm is None:
                continue
            if (tuple(0.5 * (pa + pm)) in pos
                    or tuple(0.5 * (pm + pb)) in pos):
                bad.add((min(a, b), max(a, b)))
    return bad


@dataclasses.dataclass
class _RefineResult:
    mesh_out: Mesh
    parent_of: np.ndarray


def _refine_once(mesh: Mesh, types: np.ndarray) -> _RefineResult:
    """Split each element per its type (0 none / X / Y / ISO)."""
    verts: List[np.ndarray] = [v for v in mesh.vertices]
    vpos: Dict[Tuple[float, float], int] = {
        tuple(p): i for i, p in enumerate(mesh.vertices)
    }

    def point_id(p):
        key = tuple(p)
        if key not in vpos:
            vpos[key] = len(verts)
            verts.append(p)
        return vpos[key]

    elems, attrs, parent = [], [], []
    for e in range(mesh.ne):
        t = mesh.elements[e]
        ty = int(types[e])
        if ty == 0:
            elems.append(list(t))
            attrs.append(mesh.attributes[e])
            parent.append(e)
            continue
        p = mesh.vertices[t]
        if ty == 1:                       # X: split local edges 0 and 2
            m01 = point_id(0.5 * (p[0] + p[1]))
            m23 = point_id(0.5 * (p[2] + p[3]))
            children = [
                [t[0], m01, m23, t[3]],
                [m01, t[1], t[2], m23],
            ]
        elif ty == 2:                     # Y: split local edges 1 and 3
            m12 = point_id(0.5 * (p[1] + p[2]))
            m30 = point_id(0.5 * (p[3] + p[0]))
            children = [
                [t[0], t[1], m12, m30],
                [m30, m12, t[2], t[3]],
            ]
        else:                             # ISO
            m01 = point_id(0.5 * (p[0] + p[1]))
            m12 = point_id(0.5 * (p[1] + p[2]))
            m23 = point_id(0.5 * (p[2] + p[3]))
            m30 = point_id(0.5 * (p[3] + p[0]))
            c = point_id(0.25 * (p[0] + p[1] + p[2] + p[3]))
            children = [
                [t[0], m01, c, m30],
                [m01, t[1], m12, c],
                [c, m12, t[2], m23],
                [m30, c, m23, t[3]],
            ]
        for ch in children:
            elems.append([int(x) for x in ch])
            attrs.append(mesh.attributes[e])
            parent.append(e)

    # boundary: split segments whose midpoint vertex now exists
    bdr, battr = [], []
    for seg, a in zip(mesh.boundary, mesh.bdr_attributes):
        mid = 0.5 * (mesh.vertices[seg[0]] + mesh.vertices[seg[1]])
        v = vpos.get(tuple(mid))
        if v is not None:
            bdr += [(int(seg[0]), v), (v, int(seg[1]))]
            battr += [a, a]
        else:
            bdr.append((int(seg[0]), int(seg[1])))
            battr.append(a)

    out = Mesh(
        geom=Geometry.SQUARE,
        vertices=np.array(verts),
        elements=np.array(elems, dtype=np.int64),
        attributes=np.array(attrs, dtype=np.int64),
        boundary=np.array(bdr, dtype=np.int64),
        bdr_attributes=np.array(battr, dtype=np.int64),
    )
    return _RefineResult(mesh_out=out, parent_of=np.array(parent))


# ---------------------------------------------------------------------------
# 3D: nonconforming hex AMR
# ---------------------------------------------------------------------------

from ..fem.geometry import EDGES, FACES, REF_VERTS  # noqa: E402


@dataclasses.dataclass(eq=False)
class NCHexMesh:
    """A hex mesh plus hanging-vertex constraints.

    ``constraints``: (ns, 3) rows (hanging_vertex, edge_a, edge_b) — edge
    hangers (shared with the 2D case).
    ``face_constraints``: (nf, 5) rows (center_vertex, A, B, C, D) — the
    center hangs on master face with *cyclic* corners (A, B, C, D) as seen
    from the unrefined element; the 4 edge midpoints and 4 child faces are
    implied (recoverable geometrically).
    """

    mesh: Mesh
    constraints: np.ndarray
    face_constraints: np.ndarray

    @property
    def n_hanging(self) -> int:
        return len(self.constraints) + len(self.face_constraints)


def _hex_edge_set(mesh: Mesh) -> set:
    s = set()
    for t in mesh.elements:
        for (la, lb) in EDGES[Geometry.CUBE]:
            a, b = int(t[la]), int(t[lb])
            s.add((a, b) if a < b else (b, a))
    return s


def _sorted_avg(verts0: np.ndarray, ids) -> np.ndarray:
    """Average of vertex positions summed in sorted-global-id order —
    deterministic across the elements sharing the entity (bit-exact)."""
    ids = sorted(int(i) for i in ids)
    s = verts0[ids[0]].copy()
    for i in ids[1:]:
        s = s + verts0[i]
    return s / len(ids)


def _face_map(mesh: Mesh) -> Dict[tuple, list]:
    """sorted 4-tuple -> list of (cyclic corner tuple, element id)."""
    fm: Dict[tuple, list] = {}
    for e in range(mesh.ne):
        t = mesh.elements[e]
        for fverts in FACES[Geometry.CUBE]:
            cyc = tuple(int(t[i]) for i in fverts)
            fm.setdefault(tuple(sorted(cyc)), []).append((cyc, e))
    return fm


def _edge_constraints_from(edges: set, mesh: Mesh) -> np.ndarray:
    pos = {}
    for i, p in enumerate(mesh.vertices):
        pos.setdefault(tuple(p), i)
    rows = []
    for (a, b) in edges:
        mid = 0.5 * (mesh.vertices[a] + mesh.vertices[b])
        v = pos.get(tuple(mid))
        if v is None or v == a or v == b:
            continue
        e1 = (a, v) if a < v else (v, a)
        e2 = (v, b) if v < b else (b, v)
        if e1 in edges and e2 in edges:
            rows.append((v, a, b))
    return np.array(rows, dtype=np.int64).reshape(-1, 3)


def _find_constraints_3d(mesh: Mesh):
    """Geometric hanging-entity detection for hexes.

    Edge hangers: as in 2D.  Face hangers: face F (cyclic A,B,C,D) of exactly
    one element whose center exists as a vertex, whose 4 edge midpoints exist,
    and whose 4 child faces all exist as element faces.  Returns
    (edge_cons, face_cons, bad_faces) where bad_faces lists (sorted_key,
    owner_elem) for >2:1 faces (center exists but children incomplete) —
    used by balance propagation.
    """
    verts0 = mesh.vertices
    edges = _hex_edge_set(mesh)
    edge_cons = _edge_constraints_from(edges, mesh)

    pos = {}
    for i, p in enumerate(verts0):
        pos.setdefault(tuple(p), i)
    fm = _face_map(mesh)
    face_cons, bad = [], []
    for key, owners in fm.items():
        if len(owners) != 1:
            continue
        c = pos.get(tuple(_sorted_avg(verts0, key)))
        if c is None:
            continue
        (A, B, C, D), eid = owners[0]
        mids = [
            pos.get(tuple(0.5 * (verts0[x] + verts0[y])))
            for (x, y) in ((A, B), (B, C), (C, D), (D, A))
        ]
        if any(m is None for m in mids):
            bad.append((key, eid))
            continue
        mAB, mBC, mCD, mDA = mids
        children = [
            (A, mAB, c, mDA), (mAB, B, mBC, c),
            (c, mBC, C, mCD), (mDA, c, mCD, D),
        ]
        if all(tuple(sorted(ch)) in fm for ch in children):
            face_cons.append((c, A, B, C, D))
        else:
            bad.append((key, eid))
    return (
        edge_cons,
        np.array(face_cons, dtype=np.int64).reshape(-1, 5),
        bad,
    )


def _refine_once_3d(mesh: Mesh, marks: np.ndarray) -> _RefineResult:
    verts: List[np.ndarray] = [v for v in mesh.vertices]
    verts0 = mesh.vertices
    vpos: Dict[tuple, int] = {tuple(p): i for i, p in enumerate(verts0)}

    def point_id(p):
        key = tuple(p)
        if key not in vpos:
            vpos[key] = len(verts)
            verts.append(p)
        return vpos[key]

    latt_v = np.rint(REF_VERTS[Geometry.CUBE] * 2).astype(np.int64)
    corner_of = {tuple(latt_v[lv]): lv for lv in range(8)}

    elems, attrs, parent = [], [], []
    for e in range(mesh.ne):
        t = mesh.elements[e]
        if not marks[e]:
            elems.append([int(x) for x in t])
            attrs.append(mesh.attributes[e])
            parent.append(e)
            continue
        lat: Dict[tuple, int] = {}
        for lc, lv in corner_of.items():
            lat[lc] = int(t[lv])
        for (la, lb) in EDGES[Geometry.CUBE]:
            m = tuple((latt_v[la] + latt_v[lb]) // 2)
            lat[m] = point_id(0.5 * (verts0[t[la]] + verts0[t[lb]]))
        for fverts in FACES[Geometry.CUBE]:
            fc = tuple(latt_v[list(fverts)].sum(axis=0) // 4)
            lat[fc] = point_id(_sorted_avg(verts0, [t[i] for i in fverts]))
        lat[(1, 1, 1)] = point_id(_sorted_avg(verts0, t))
        for k in (0, 1):
            for j in (0, 1):
                for i in (0, 1):
                    ch = [
                        lat[(i, j, k)], lat[(i + 1, j, k)],
                        lat[(i + 1, j + 1, k)], lat[(i, j + 1, k)],
                        lat[(i, j, k + 1)], lat[(i + 1, j, k + 1)],
                        lat[(i + 1, j + 1, k + 1)], lat[(i, j + 1, k + 1)],
                    ]
                    elems.append(ch)
                    attrs.append(mesh.attributes[e])
                    parent.append(e)

    # boundary quads: split when the face center vertex now exists
    bdr, battr = [], []
    for quad, a in zip(mesh.boundary, mesh.bdr_attributes):
        A, B, C, D = (int(x) for x in quad)
        c = vpos.get(tuple(_sorted_avg(verts0, quad)))
        if c is not None:
            mAB = vpos[tuple(0.5 * (verts0[A] + verts0[B]))]
            mBC = vpos[tuple(0.5 * (verts0[B] + verts0[C]))]
            mCD = vpos[tuple(0.5 * (verts0[C] + verts0[D]))]
            mDA = vpos[tuple(0.5 * (verts0[D] + verts0[A]))]
            bdr += [
                (A, mAB, c, mDA), (mAB, B, mBC, c),
                (c, mBC, C, mCD), (mDA, c, mCD, D),
            ]
            battr += [a] * 4
        else:
            bdr.append((A, B, C, D))
            battr.append(a)

    out = Mesh(
        geom=Geometry.CUBE,
        vertices=np.array(verts),
        elements=np.array(elems, dtype=np.int64),
        attributes=np.array(attrs, dtype=np.int64),
        boundary=np.array(bdr, dtype=np.int64),
        bdr_attributes=np.array(battr, dtype=np.int64),
    )
    return _RefineResult(mesh_out=out, parent_of=np.array(parent))


def refine_hexes(nc: NCHexMesh, marks: np.ndarray,
                 balance: bool = True) -> Tuple["NCHexMesh", np.ndarray]:
    """Refine marked hexes 8-ways; re-derive constraints; enforce 2:1 balance
    (both face- and edge-level) by marking propagation."""
    mesh = nc.mesh
    assert mesh.geom == Geometry.CUBE
    marks = np.asarray(marks, dtype=bool).copy()

    for _ in range(64):
        new = _refine_once_3d(mesh, marks)
        ec, fc, bad = _find_constraints_3d(new.mesh_out)
        if not balance:
            break
        extra = np.zeros(mesh.ne, dtype=bool)
        # face-level >2:1: the *coarse* owner of an over-hung face refines.
        # bad owner ids index the refined mesh; map back via parent_of.
        for (_key, eid) in bad:
            extra[new.parent_of[eid]] = True
        # edge-level >2:1 (as in 2D): master edge with a constrained sub-edge
        masters = {(int(r[1]), int(r[2])) for r in ec}
        bad_edges = set()
        for (v, a, b) in ec:
            for sub in ((min(a, v), max(a, v)), (min(v, b), max(v, b))):
                if sub in masters or (sub[1], sub[0]) in masters:
                    bad_edges.add((min(a, b), max(a, b)))
        if bad_edges:
            for e in range(mesh.ne):
                t = mesh.elements[e]
                for (la, lb) in EDGES[Geometry.CUBE]:
                    a, b = int(t[la]), int(t[lb])
                    if (min(a, b), max(a, b)) in bad_edges:
                        extra[e] = True
        if not (extra & ~marks).any():
            break
        marks |= extra
    return (
        NCHexMesh(mesh=new.mesh_out, constraints=ec, face_constraints=fc),
        new.parent_of,
    )


def make_nc(mesh: Mesh):
    """NC wrapper for a conforming quad or hex mesh."""
    if mesh.geom == Geometry.CUBE:
        ec, fc, _bad = _find_constraints_3d(mesh)
        return NCHexMesh(mesh=mesh, constraints=ec, face_constraints=fc)
    return NCQuadMesh(mesh=mesh, constraints=_find_constraints(mesh))
