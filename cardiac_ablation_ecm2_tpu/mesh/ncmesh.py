"""Nonconforming (hanging-node) quad AMR with 2:1 balance.

Reference analog: ``NCMesh`` (``mesh/ncmesh.hpp:189``) — re-scoped per
SURVEY.md §7 hard-parts item 4 from the reference's 11k-LoC pointer octree to
**array-encoded 2:1 refinement**: isotropic quad refinement with hanging
vertices, constraints recovered *geometrically* (a hanging vertex sits
bit-exactly at the midpoint of a neighbor's unrefined edge, because both are
computed as (va+vb)/2), and 2:1 balance enforced by marking propagation.

The companion ``fem/ncfespace.py`` builds the conforming-constraint
prolongation (the analog of ``FiniteElementSpace::cP``, fespace.hpp:299).
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
    mesh = nc.mesh
    assert mesh.geom == Geometry.SQUARE
    marks = np.asarray(marks, dtype=bool).copy()

    for _ in range(64):
        new = _refine_once(mesh, marks)
        cons = _find_constraints(new.mesh_out)
        if not balance:
            break
        # 2:1 violation: a hanging vertex that is itself a master endpoint of
        # another constraint chain ⇒ the *unrefined* element owning the long
        # edge must refine.  Detect: constraint whose master edge (a,b) has a
        # constrained sub-edge — i.e. some other constraint's master is
        # (a, v) or (v, b).
        masters = {(int(r[1]), int(r[2])) for r in cons}
        bad_edges = set()
        for (v, a, b) in cons:
            for sub in ((min(a, v), max(a, v)), (min(v, b), max(v, b))):
                if sub in masters or (sub[1], sub[0]) in masters:
                    bad_edges.add((min(a, b), max(a, b)))
        if not bad_edges:
            break
        # find unrefined parents owning bad master edges and mark them too
        extra = np.zeros(mesh.ne, dtype=bool)
        for e in range(mesh.ne):
            t = mesh.elements[e]
            for i in range(4):
                a, b = int(t[i]), int(t[(i + 1) % 4])
                if (min(a, b), max(a, b)) in bad_edges:
                    extra[e] = True
        if not (extra & ~marks).any():
            break
        marks |= extra
    return NCQuadMesh(mesh=new.mesh_out, constraints=cons), new.parent_of


@dataclasses.dataclass
class _RefineResult:
    mesh_out: Mesh
    parent_of: np.ndarray


def _refine_once(mesh: Mesh, marks: np.ndarray) -> _RefineResult:
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
        if not marks[e]:
            elems.append(list(t))
            attrs.append(mesh.attributes[e])
            parent.append(e)
            continue
        p = mesh.vertices[t]
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


def make_nc(mesh: Mesh) -> NCQuadMesh:
    return NCQuadMesh(mesh=mesh, constraints=_find_constraints(mesh))
