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
    ``half_face_constraints``: (nh, 6) rows (mE, mF, c1, c2, c3, c4) — an
    ANISOTROPIC neighbor split the master face (cyclic c1..c4, as seen from
    the unrefined owner) in two; mE = midpoint of edge (c1,c2), mF = of
    (c3,c4); the medial edge mE–mF hangs on the master face (reference
    ref_type splits, mesh/ncmesh.hpp:662).
    """

    mesh: Mesh
    constraints: np.ndarray
    face_constraints: np.ndarray
    half_face_constraints: np.ndarray = None

    def __post_init__(self):
        if self.half_face_constraints is None:
            self.half_face_constraints = np.zeros((0, 6), dtype=np.int64)

    @property
    def n_hanging(self) -> int:
        return (len(self.constraints) + len(self.face_constraints)
                + len(self.half_face_constraints))


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

    Edge hangers: as in 2D.  Full-face hangers: face F (cyclic A,B,C,D) of
    exactly one element whose center exists as a vertex, whose 4 edge
    midpoints exist, and whose 4 child faces all exist as element faces.
    Half-face hangers (anisotropic neighbor): exactly one opposite
    edge-midpoint pair exists and both half children exist — the medial
    edge hangs on the master face.  Returns (edge_cons, face_cons,
    half_face_cons, bad_faces) where bad_faces lists
    (sorted_key, owner_elem, (need_u, need_v), (A, B, C, D)) for faces
    whose neighbor refined deeper/crosswise than a single 2:1 pattern —
    consumed by the typed balance propagation (the CheckAnisoFace /
    forced-refinement role, reference mesh/ncmesh.cpp).
    """
    verts0 = mesh.vertices
    edges = _hex_edge_set(mesh)
    edge_cons = _edge_constraints_from(edges, mesh)

    pos = {}
    for i, p in enumerate(verts0):
        pos.setdefault(tuple(p), i)
    fm = _face_map(mesh)
    # boundary faces are never NC masters (no neighbor): skip them, or
    # edge-neighbor refinements would spuriously flag them as crossing
    bdr_keys = {tuple(sorted(int(x) for x in q)) for q in mesh.boundary}
    face_cons, half_cons, bad = [], [], []
    for key, owners in fm.items():
        if len(owners) != 1 or key in bdr_keys:
            continue
        (A, B, C, D), eid = owners[0]
        c = pos.get(tuple(_sorted_avg(verts0, key)))
        mids = [
            pos.get(tuple(0.5 * (verts0[x] + verts0[y])))
            for (x, y) in ((A, B), (B, C), (C, D), (D, A))
        ]
        mAB, mBC, mCD, mDA = mids
        if c is not None:
            if any(m is None for m in mids):
                bad.append((key, eid, (True, True), (A, B, C, D)))
                continue
            children = [
                (A, mAB, c, mDA), (mAB, B, mBC, c),
                (c, mBC, C, mCD), (mDA, c, mCD, D),
            ]
            if all(tuple(sorted(ch)) in fm for ch in children):
                face_cons.append((c, A, B, C, D))
            else:
                bad.append((key, eid, (True, True), (A, B, C, D)))
            continue
        # no center: anisotropic neighbor?  u pair = (mAB, mCD) → medial
        # along v; v pair = (mBC, mDA) → medial along u.  Cycle stored so
        # the split separates corner 1 from corner 2.
        has_u = mAB is not None and mCD is not None
        has_v = mBC is not None and mDA is not None
        if has_u and not has_v:
            ch = [(A, mAB, mCD, D), (mAB, B, C, mCD)]
            if all(tuple(sorted(x)) in fm for x in ch):
                half_cons.append((mAB, mCD, A, B, C, D))
            else:
                bad.append((key, eid, (True, False), (A, B, C, D)))
        elif has_v and not has_u:
            ch = [(A, B, mBC, mDA), (mDA, mBC, C, D)]
            if all(tuple(sorted(x)) in fm for x in ch):
                half_cons.append((mBC, mDA, B, C, D, A))
            else:
                bad.append((key, eid, (False, True), (A, B, C, D)))
        elif any(m is not None for m in mids):
            # crossed/partial pattern (e.g. the neighbor split the OTHER
            # way across a half-face): force the owner to match
            bad.append((key, eid,
                        (mAB is not None or mCD is not None,
                         mBC is not None or mDA is not None),
                        (A, B, C, D)))
    return (
        edge_cons,
        np.array(face_cons, dtype=np.int64).reshape(-1, 5),
        np.array(half_cons, dtype=np.int64).reshape(-1, 6),
        bad,
    )


# 3D refinement type bitmask (reference NCMesh ref_type, mesh/ncmesh.hpp:662:
# bit k = split by a plane normal to the local k axis)
X3, Y3, Z3, ISO3 = 1, 2, 4, 7


def _refine_once_3d(mesh: Mesh, types: np.ndarray) -> _RefineResult:
    """Split each hex per its type bitmask (0 none … ISO3 8-way).

    Every new vertex is a 2/4/8-corner average (``_sorted_avg`` —
    deterministic), placed on the {0,1,2}³ lattice of the parent: a lattice
    point with k coordinates equal to 1 averages the 2^k corners obtained
    by rounding those coordinates both ways."""
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
        ty = int(types[e])
        if ty == 0:
            elems.append([int(x) for x in t])
            attrs.append(mesh.attributes[e])
            parent.append(e)
            continue
        split = [bool(ty & (1 << d)) for d in range(3)]
        lat: Dict[tuple, int] = {}

        def lat_id(lx, ly, lz, _t=t, _lat=lat):
            key = (lx, ly, lz)
            if key in _lat:
                return _lat[key]
            corners = []
            for cx in ((0, 2) if lx == 1 else (lx,)):
                for cy in ((0, 2) if ly == 1 else (ly,)):
                    for cz in ((0, 2) if lz == 1 else (lz,)):
                        corners.append(int(_t[corner_of[(cx, cy, cz)]]))
            if len(corners) == 1:
                _lat[key] = corners[0]
            else:
                _lat[key] = point_id(_sorted_avg(verts0, corners))
            return _lat[key]

        # child cells: per split axis two slabs [0,1],[1,2]; else one [0,2]
        spans = [((0, 1), (1, 2)) if split[d] else ((0, 2),)
                 for d in range(3)]
        for (z0, z1) in spans[2]:
            for (y0, y1) in spans[1]:
                for (x0, x1) in spans[0]:
                    ch = [
                        lat_id(x0, y0, z0), lat_id(x1, y0, z0),
                        lat_id(x1, y1, z0), lat_id(x0, y1, z0),
                        lat_id(x0, y0, z1), lat_id(x1, y0, z1),
                        lat_id(x1, y1, z1), lat_id(x0, y1, z1),
                    ]
                    elems.append(ch)
                    attrs.append(mesh.attributes[e])
                    parent.append(e)

    # boundary quads: split full (center exists), half (one opposite-mid
    # pair exists), or keep
    def _mid(x, y):
        return vpos.get(tuple(0.5 * (verts0[x] + verts0[y])))

    bdr, battr = [], []
    for quad, a in zip(mesh.boundary, mesh.bdr_attributes):
        A, B, C, D = (int(x) for x in quad)
        c = vpos.get(tuple(_sorted_avg(verts0, quad)))
        mAB, mBC = _mid(A, B), _mid(B, C)
        mCD, mDA = _mid(C, D), _mid(D, A)
        if c is not None:
            bdr += [
                (A, mAB, c, mDA), (mAB, B, mBC, c),
                (c, mBC, C, mCD), (mDA, c, mCD, D),
            ]
            battr += [a] * 4
        elif mAB is not None and mCD is not None:
            bdr += [(A, mAB, mCD, D), (mAB, B, C, mCD)]
            battr += [a] * 2
        elif mBC is not None and mDA is not None:
            bdr += [(A, B, mBC, mDA), (mDA, mBC, C, D)]
            battr += [a] * 2
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
    marks = np.asarray(marks, dtype=bool)
    return refine_hexes_aniso(nc, np.where(marks, ISO3, 0), balance=balance)


def _face_axis_bits(mesh: Mesh, eid: int, cyc, need_u: bool,
                    need_v: bool) -> int:
    """Element split bits that subdivide face ``cyc`` = (A,B,C,D) of element
    ``eid`` along its u (A→B) / v (A→D) directions.  Topological when the
    corners are element corners; geometric (max-|cos| axis match against
    the element's corner frame) for child faces of partially-refined
    parents."""
    t = mesh.elements[eid]
    latt_v = np.rint(REF_VERTS[Geometry.CUBE] * 2).astype(np.int64)
    lookup = {int(t[lv]): lv for lv in range(8)}
    A, B, _C, D = (int(x) for x in cyc)
    bits = 0

    def axis_of(p, q):
        if p in lookup and q in lookup:
            d = latt_v[lookup[q]] - latt_v[lookup[p]]
            ax = int(np.nonzero(d)[0][0])
        else:
            v = mesh.vertices[q] - mesh.vertices[p]
            frame = np.stack([
                mesh.vertices[t[1]] - mesh.vertices[t[0]],
                mesh.vertices[t[3]] - mesh.vertices[t[0]],
                mesh.vertices[t[4]] - mesh.vertices[t[0]],
            ])
            cos = np.abs(frame @ v) / (
                np.linalg.norm(frame, axis=1) * np.linalg.norm(v) + 1e-300)
            ax = int(np.argmax(cos))
        return 1 << ax

    if need_u:
        bits |= axis_of(A, B)
    if need_v:
        bits |= axis_of(A, D)
    return bits


def refine_hexes_aniso(nc: NCHexMesh, types: np.ndarray,
                       balance: bool = True
                       ) -> Tuple["NCHexMesh", np.ndarray]:
    """Anisotropically refine hexes (reference ``NCMesh::Refine`` ref_type
    bitmask, mesh/ncmesh.hpp:662): ``types[e]`` ∈ {0..7}, bit k = split by
    a plane normal to local axis k (X3=1, Y3=2, Z3=4, ISO3=7).

    2:1 balance propagates TYPED forced refinements: the owner of an
    over-hung or cross-split face is split in exactly the directions that
    subdivide it (the CheckAnisoFace forced-refinement role); over-hung
    master edges force a split along the edge's axis."""
    mesh = nc.mesh
    assert mesh.geom == Geometry.CUBE
    types = np.asarray(types, dtype=np.int64).copy()

    for _ in range(64):
        new = _refine_once_3d(mesh, types)
        ec, fc, hc, bad = _find_constraints_3d(new.mesh_out)
        if not balance:
            break
        extra = np.zeros(mesh.ne, dtype=np.int64)
        # face-level: typed bits on the *coarse* parent of the bad owner
        for (_key, eid, (nu, nv), cyc) in bad:
            par = int(new.parent_of[eid])
            extra[par] |= _face_axis_bits(new.mesh_out, eid, cyc, nu, nv)
        # edge-level >2:1: master edge with a constrained sub-edge forces a
        # split along that edge's axis
        masters = {(int(r[1]), int(r[2])) for r in ec}
        bad_edges = set()
        for (v, a, b) in ec:
            for sub in ((min(a, v), max(a, v)), (min(v, b), max(v, b))):
                if sub in masters or (sub[1], sub[0]) in masters:
                    bad_edges.add((min(a, b), max(a, b)))
        if bad_edges:
            latt_v = np.rint(REF_VERTS[Geometry.CUBE] * 2).astype(np.int64)
            for e in range(mesh.ne):
                t = mesh.elements[e]
                for (la, lb) in EDGES[Geometry.CUBE]:
                    a, b = int(t[la]), int(t[lb])
                    if (min(a, b), max(a, b)) in bad_edges:
                        d = latt_v[lb] - latt_v[la]
                        extra[e] |= 1 << int(np.nonzero(d)[0][0])
        grown = (types | extra) != types
        if not grown.any():
            break
        types |= extra
    return (
        NCHexMesh(mesh=new.mesh_out, constraints=ec, face_constraints=fc,
                  half_face_constraints=hc),
        new.parent_of,
    )


def make_nc(mesh: Mesh):
    """NC wrapper for a conforming quad or hex mesh."""
    if mesh.geom == Geometry.CUBE:
        ec, fc, hc, _bad = _find_constraints_3d(mesh)
        return NCHexMesh(mesh=mesh, constraints=ec, face_constraints=fc,
                         half_face_constraints=hc)
    return NCQuadMesh(mesh=mesh, constraints=_find_constraints(mesh))
