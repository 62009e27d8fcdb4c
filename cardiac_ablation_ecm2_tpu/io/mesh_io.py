"""MFEM-native mesh file I/O.

Reference analog: the ``"MFEM mesh v1.0"`` reader/writer
(``mesh/mesh.cpp:4964-4972`` parse, ``mesh.cpp:12288`` write).  The v1.0
format is the test corpus format for the 115 bundled meshes in
``/root/reference/data`` (star.mesh, beam-hex.mesh, fichera.mesh, …), so
reading it untranslated gives us the reference's acceptance meshes.

Geometry type codes match ``fem/geom.hpp``: 0=POINT … 5=CUBE.  Curved meshes
(trailing ``nodes`` FiniteElementSpace section) are read and written for H1
nodal spaces (byNODES/byVDIM orderings) into ``Mesh.nodes`` E-vectors.
"""

from __future__ import annotations

import io
from typing import List, Optional

import numpy as np

from ..fem.geometry import Geometry, NUM_VERTS
from ..mesh.mesh import Mesh


def _tokens(text: str):
    """Token stream skipping comments and blank lines."""
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        yield from line.split()


def read_mfem_mesh(path_or_text) -> Mesh:
    """Parse an 'MFEM mesh v1.0'/'v1.1' file into a Mesh."""
    if isinstance(path_or_text, str) and "\n" not in path_or_text:
        with open(path_or_text) as f:
            text = f.read()
    else:
        text = path_or_text

    header, _, rest = text.partition("\n")
    if "MFEM INLINE mesh v1.0" in header:
        return _read_inline(rest)
    if "MFEM NC mesh v1." in header:
        from .ncmesh_io import read_ncmesh

        return read_ncmesh(text)
    if "MFEM mesh v1." not in header:
        raise ValueError(f"unsupported mesh header: {header!r}")

    toks = _tokens(rest)

    def next_tok():
        return next(toks)

    dim = None
    elements = attributes = boundary = bdr_attributes = None
    vertices = None
    nodes_evec = None
    nodes_order = 1
    geom: Optional[Geometry] = None
    bgeom: Optional[Geometry] = None

    def read_element_block(n):
        attrs = np.empty(n, dtype=np.int64)
        geoms = np.empty(n, dtype=np.int64)
        conn: List[List[int]] = []
        for i in range(n):
            attrs[i] = int(next_tok())
            g = Geometry(int(next_tok()))
            geoms[i] = g
            nv = NUM_VERTS[g]
            conn.append([int(next_tok()) for _ in range(nv)])
        gset = set(geoms.tolist())
        if len(gset) > 1:
            # mixed volume geometries → caller assembles a MixedMesh (2D)
            return attrs, ("mixed", geoms, conn), None
        return attrs, Geometry(geoms[0]) if n else None, np.array(conn, dtype=np.int64)

    while True:
        try:
            section = next_tok()
        except StopIteration:
            break
        if section == "dimension":
            dim = int(next_tok())
        elif section == "elements":
            n = int(next_tok())
            attributes, geom, elements = read_element_block(n)
        elif section == "boundary":
            n = int(next_tok())
            if n == 0:
                bdr_attributes = np.zeros(0, dtype=np.int64)
                boundary = np.zeros((0, 2 if dim == 2 else 4), dtype=np.int64)
            else:
                bdr_attributes, bgeom, boundary = read_element_block(n)
        elif section == "vertices":
            nv = int(next_tok())
            peek = next_tok()
            if peek == "nodes":
                # curved mesh: coordinates live in the nodes GridFunction
                vertices, nodes_evec, nodes_order = _read_nodes_section(
                    toks, nv, geom, elements, attributes
                )
                continue
            vdim = int(peek)
            vals = np.array(
                [float(next_tok()) for _ in range(nv * vdim)]
            ).reshape(nv, vdim)
            vertices = vals
        elif section == "nodes":
            vertices, nodes_evec, nodes_order = _read_nodes_section(
                toks, len(vertices) if vertices is not None else 0,
                geom, elements, attributes,
            )
        else:
            raise ValueError(f"unknown section {section!r}")

    if vertices is None or (elements is None and not isinstance(geom, tuple)):
        raise ValueError("incomplete mesh file")
    if isinstance(geom, tuple) and geom[0] == "mixed":
        # mixed-geometry 2D mesh → per-geometry blocks (fem/mixed.MixedMesh)
        _tag, geoms, conn = geom
        if dim != 2:
            raise NotImplementedError("mixed 3D volume geometries")
        if nodes_evec is not None:
            raise NotImplementedError("curved mixed meshes")
        from ..fem.mixed import MixedMesh

        blocks = []
        for g in sorted(set(geoms.tolist())):
            idx = np.nonzero(geoms == g)[0]
            blocks.append((
                Geometry(g),
                np.array([conn[i] for i in idx], dtype=np.int64),
                attributes[idx],
            ))
        return MixedMesh(
            vertices=vertices,
            blocks=tuple(blocks),
            boundary=(boundary if boundary is not None
                      else np.zeros((0, 2), np.int64)),
            bdr_attributes=(bdr_attributes if bdr_attributes is not None
                            else np.zeros(0, np.int64)),
        )
    return Mesh(
        geom=geom,
        vertices=vertices,
        elements=elements,
        attributes=attributes,
        boundary=boundary if boundary is not None else np.zeros((0, 1), np.int64),
        bdr_attributes=(
            bdr_attributes if bdr_attributes is not None else np.zeros(0, np.int64)
        ),
        nodes=nodes_evec,
        nodes_order=nodes_order if nodes_evec is not None else 1,
    )


#: MFEM local edge tables (mesh/{triangle,quadrilateral,tetrahedron,
#: hexahedron}.cpp) — needed to reproduce the reference's edge enumeration
#: when loading curved-mesh nodes GridFunctions.  NOTE the tet table differs
#: from this library's own (fem/geometry.py) table.
_MFEM_EDGES = {
    Geometry.TRIANGLE: [(0, 1), (1, 2), (2, 0)],
    Geometry.SQUARE: [(0, 1), (1, 2), (2, 3), (3, 0)],
    Geometry.TETRAHEDRON: [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
    Geometry.CUBE: [
        (0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
}

_MFEM_FACES = {
    Geometry.CUBE: [
        (3, 2, 1, 0), (0, 1, 5, 4), (1, 2, 6, 5),
        (2, 3, 7, 6), (3, 0, 4, 7), (4, 5, 6, 7),
    ],
}


def _read_nodes_section(toks, nv, geom, elements, attributes):
    """Parse a curved-mesh ``nodes`` GridFunction (order-2 H1 only) and
    return (vertices, nodes E-vector in our lex local ordering, order).

    Order 2 keeps every edge/face/interior entity to a single dof, so the
    reference's DofTransformation orientation machinery is not needed — only
    its first-seen entity enumeration, reproduced here.
    """
    from ..fem.basis import lattice_multi_index
    from ..fem.geometry import DIMENSION, NUM_VERTS, REF_VERTS

    def next_tok():
        return next(toks)

    assert next_tok() == "FiniteElementSpace"
    line = next_tok()
    assert line == "FiniteElementCollection:"
    fec = next_tok()
    assert next_tok() == "VDim:"
    vdim = int(next_tok())
    assert next_tok() == "Ordering:"
    ordering = int(next_tok())

    if fec.endswith("P1") or fec == "Linear":
        # order-1 nodes GridFunction ≡ the vertex coordinates (H1_P1 dofs
        # are MFEM's vertex ids), byNODES ordering
        vals = []
        while True:
            try:
                vals.append(float(next_tok()))
            except StopIteration:
                break
            if len(vals) == nv * vdim:
                break
        arr = np.array(vals)
        if ordering == 0:          # byNODES: all x, then all y, …
            verts = arr.reshape(vdim, nv).T
        else:                      # byVDIM: interleaved
            verts = arr.reshape(nv, vdim)
        return verts, None, 1

    p = _fec_order(fec)
    if p >= 3:
        # legacy named collections (Cubic, …) use EQUISPACED nodes; the
        # H1_* collections use Gauss-Lobatto-based nodes (our convention)
        uniform = "_" not in fec
        return _read_nodes_general(toks, nv, geom, elements, p, vdim,
                                   ordering, uniform_nodes=uniform)
    dim = DIMENSION[geom]

    # first-seen entity enumeration with MFEM local tables
    edge_ids = {}
    elem_edges = []
    for conn in elements:
        row = []
        for (a, b) in _MFEM_EDGES[geom]:
            key = tuple(sorted((int(conn[a]), int(conn[b]))))
            row.append(edge_ids.setdefault(key, len(edge_ids)))
        elem_edges.append(row)
    nedge = len(edge_ids)

    face_ids = {}
    elem_faces = []
    if geom == Geometry.CUBE:
        for conn in elements:
            row = []
            for f in _MFEM_FACES[geom]:
                key = tuple(sorted(int(conn[v]) for v in f))
                row.append(face_ids.setdefault(key, len(face_ids)))
            elem_faces.append(row)
    nface = len(face_ids)

    ne = len(elements)
    if geom in (Geometry.TETRAHEDRON, Geometry.TRIANGLE):
        ndof = nv + nedge               # P2 simplices: no interior dofs
    elif geom == Geometry.SQUARE:
        ndof = nv + nedge + ne
    elif geom == Geometry.CUBE:
        ndof = nv + nedge + nface + ne
    else:
        raise NotImplementedError(geom)

    vals = np.array([float(next_tok()) for _ in range(ndof * vdim)])
    if ordering == 0:   # byNODES: all component-0 dofs first
        X = vals.reshape(vdim, ndof).T
    else:               # byVDIM: interleaved
        X = vals.reshape(ndof, vdim)

    vertices = X[:nv].copy()

    # assemble our lex-ordered E-vector of geometry nodes
    mi = lattice_multi_index(geom, p)               # (nd, dim), coords in {0,1,2}
    latt_v = np.rint(REF_VERTS[geom] * p).astype(np.int64)
    corner_of = {tuple(latt_v[v]): v for v in range(NUM_VERTS[geom])}
    edge_mid = {}
    for le, (a, b) in enumerate(_MFEM_EDGES[geom]):
        edge_mid[tuple(((latt_v[a] + latt_v[b]) // 2).tolist())] = le
    face_mid = {}
    if geom == Geometry.CUBE:
        for lf, f in enumerate(_MFEM_FACES[geom]):
            c = sum(latt_v[v] for v in f) // 4
            face_mid[tuple(c.tolist())] = lf

    nodes = np.zeros((ne, len(mi), vdim))
    for e, conn in enumerate(elements):
        for n, latt in enumerate(map(tuple, mi)):
            if latt in corner_of:
                gid = int(conn[corner_of[latt]])
            elif latt in edge_mid:
                gid = nv + elem_edges[e][edge_mid[latt]]
            elif latt in face_mid:
                gid = nv + nedge + elem_faces[e][face_mid[latt]]
            else:
                gid = nv + nedge + nface + e
            nodes[e, n] = X[gid]
    return vertices, nodes, p


def _fec_order(fec: str) -> int:
    """Order of an H1 FE-collection name ('Cubic', 'H1_3D_P4', …)."""
    named = {"Linear": 1, "Quadratic": 2, "Cubic": 3}
    if fec in named:
        return named[fec]
    if "_P" in fec:
        return int(fec.rsplit("_P", 1)[1])
    raise NotImplementedError(f"nodes FE collection {fec!r}")


def _read_nodes_general(toks, nv, geom, elements, p, vdim, ordering,
                        uniform_nodes=False):
    """Order-p (p ≥ 3) curved-mesh nodes GridFunction reader.

    MFEM dof layout (fem/fespace.cpp dof enumeration): vertices, then
    edges ((p−1) dofs each, directed from the lower to the higher global
    vertex id), then faces (lex in the stored face frame — the first-seen
    element's local face vertex order, mesh/mesh.cpp GetElementToFaceTable),
    then element interiors (lex).
    """
    from ..fem.basis import lattice_multi_index
    from ..fem.geometry import DIMENSION, NUM_VERTS, REF_VERTS

    dim = DIMENSION[geom]
    ne = len(elements)

    # --- entity enumeration (first-seen, mirroring MFEM tables) ----------
    # each edge's dof direction is the local (a, b) order of the FIRST
    # element that introduced it (mesh/mesh.cpp GetVertexToVertexTable
    # insertion order; tet meshes don't show this because edge marking
    # sorts their connectivity)
    edge_ids = {}        # sorted key -> (id, (ga, gb) stored direction)
    for conn in elements:
        for (a, b) in _MFEM_EDGES[geom]:
            ga, gb = int(conn[a]), int(conn[b])
            key = (min(ga, gb), max(ga, gb))
            if key not in edge_ids:
                edge_ids[key] = (len(edge_ids), (ga, gb))
    nedge = len(edge_ids)

    face_ids = {}          # sorted key -> (id, stored corner tuple)
    tri_faces = geom == Geometry.TETRAHEDRON
    if geom == Geometry.CUBE:
        for conn in elements:
            for f in _MFEM_FACES[geom]:
                fv = tuple(int(conn[v]) for v in f)
                key = tuple(sorted(fv))
                if key not in face_ids:
                    face_ids[key] = (len(face_ids), fv)
    elif tri_faces:
        for conn in elements:
            for f in _MFEM_TET_FACES:
                fv = tuple(int(conn[v]) for v in f)
                key = tuple(sorted(fv))
                if key not in face_ids:
                    face_ids[key] = (len(face_ids), fv)
    nface = len(face_ids)

    per_edge = p - 1
    if geom == Geometry.CUBE:
        per_face, per_int = (p - 1) ** 2, (p - 1) ** 3
    elif geom == Geometry.SQUARE:
        per_face, per_int = 0, (p - 1) ** 2
    elif geom == Geometry.TETRAHEDRON:
        per_face = (p - 1) * (p - 2) // 2
        per_int = (p - 1) * (p - 2) * (p - 3) // 6
    elif geom == Geometry.TRIANGLE:
        per_face, per_int = 0, (p - 1) * (p - 2) // 2
    else:
        raise NotImplementedError(geom)
    ndof = nv + nedge * per_edge + nface * per_face + ne * per_int

    vals = np.array([float(next(toks)) for _ in range(ndof * vdim)])
    X = vals.reshape(vdim, ndof).T if ordering == 0 else vals.reshape(
        ndof, vdim)
    vertices = X[:nv].copy()

    # --- lattice → dof id -------------------------------------------------
    mi = lattice_multi_index(geom, p)
    latt_v = np.rint(REF_VERTS[geom] * p).astype(np.int64)
    corner_of = {tuple(latt_v[v]): v for v in range(NUM_VERTS[geom])}

    # classify every lattice point once: on which entity does it live?
    def classify(latt):
        latt = np.asarray(latt)
        if tuple(latt) in corner_of:
            return ("v", corner_of[tuple(latt)])
        for le, (a, b) in enumerate(_MFEM_EDGES[geom]):
            va, vb = latt_v[a], latt_v[b]
            d = vb - va
            tpar = None
            for t in range(1, p):
                if np.array_equal(va + (d * t) // p, latt) and np.array_equal(
                        (d * t) % p, np.zeros(dim, np.int64)):
                    tpar = t
                    break
            if tpar is not None:
                return ("e", le, a, b, tpar)
        if geom == Geometry.CUBE:
            for lf, f in enumerate(_MFEM_FACES[geom]):
                vs = latt_v[list(f)]
                # on the face plane?
                normal_ax = [d for d in range(3)
                             if len(set(vs[:, d])) == 1]
                if len(normal_ax) == 1 and latt[normal_ax[0]] == vs[0, normal_ax[0]]:
                    return ("f", lf, f)
        elif tri_faces:
            for lf, f in enumerate(_MFEM_TET_FACES):
                # barycentric: on face ⇔ opposite-vertex coordinate is 0
                opp = ({0, 1, 2, 3} - set(f)).pop()
                bar = _tet_bary(latt, p)
                if bar[opp] == 0:
                    return ("f", lf, f)
        return ("i",)

    kinds = [classify(latt) for latt in mi]

    # interior enumeration index for each interior lattice point: lex for
    # H1_* collections; the legacy LagrangeHexFiniteElement (p=3) orders
    # each z-layer counterclockwise ((1,1),(2,1),(2,2),(1,2) — see
    # fe_fixed_order.cpp:3192-3199)
    int_pts = [n for n, k in enumerate(kinds) if k[0] == "i"]
    if uniform_nodes and geom == Geometry.CUBE and p == 3:
        ccw = [(1, 1), (2, 1), (2, 2), (1, 2)]
        order = sorted(
            int_pts,
            key=lambda n: (mi[n][2], ccw.index((int(mi[n][0]),
                                                int(mi[n][1])))),
        )
        int_index = {n: i for i, n in enumerate(order)}
    else:
        int_index = {n: i for i, n in enumerate(int_pts)}
    assert len(int_pts) == per_int, (len(int_pts), per_int)

    nodes = np.zeros((ne, len(mi), vdim))
    for e, conn in enumerate(elements):
        conn = [int(v) for v in conn]
        for n, k in zip(range(len(mi)), kinds):
            latt = mi[n]
            if k[0] == "v":
                gid = conn[k[1]]
            elif k[0] == "e":
                _, le, a, b, t = k
                ga, gb = conn[a], conn[b]
                eid, stored_dir = edge_ids[(min(ga, gb), max(ga, gb))]
                # edge dofs are stored in the min→max global-vertex
                # direction (verified against the file data directly:
                # 51/51 edges of fichera-q3)
                idx = (t - 1) if ga < gb else (p - 1 - t)
                gid = nv + eid * per_edge + idx
            elif k[0] == "f":
                lf, f = k[1], k[2]
                my = [conn[v] for v in f]
                fid, stored = face_ids[tuple(sorted(my))]
                if geom == Geometry.CUBE:
                    idx = _quad_face_index(latt, latt_v[list(f)], my,
                                           stored, p)
                else:
                    idx = _tri_face_index(latt, f, my, stored, p)
                gid = nv + nedge * per_edge + fid * per_face + idx
            else:
                gid = (nv + nedge * per_edge + nface * per_face
                       + e * per_int + int_index[n])
            nodes[e, n] = X[gid]

    if uniform_nodes:
        # file dofs sit at the EQUISPACED lattice (legacy Cubic/… FECs);
        # resample onto our Gauss-Lobatto-based node positions by
        # evaluating the uniform-node interpolant there
        from ..fem.basis import h1_nodes

        ours = h1_nodes(geom, p)
        unif = mi.astype(np.float64) / p
        B = _nodal_basis_at(geom, p, unif, ours)       # (nd, nd)
        nodes = np.einsum("mn,ens->ems", B, nodes)
    return vertices, nodes, p


def _nodal_basis_at(geom, p, node_pts, eval_pts):
    """Nodal basis on ``node_pts`` evaluated at ``eval_pts`` (generalized
    Vandermonde solve; exact for the element's polynomial space)."""
    from ..fem.basis import lattice_multi_index

    mi = lattice_multi_index(geom, p)

    def mono(pts):
        # monomial basis spanning the element space (tensor / total degree)
        cols = []
        for mexp in mi:
            v = np.ones(len(pts))
            for d, e_ in enumerate(mexp):
                v = v * pts[:, d] ** int(e_)
            cols.append(v)
        return np.stack(cols, axis=1)

    V = mono(np.asarray(node_pts, dtype=np.float64))
    E = mono(np.asarray(eval_pts, dtype=np.float64))
    return np.linalg.solve(V.T, E.T).T


_MFEM_TET_FACES = [(1, 2, 3), (0, 3, 2), (0, 1, 3), (0, 2, 1)]


def _tet_bary(latt, p):
    i, j, k = int(latt[0]), int(latt[1]), int(latt[2])
    return (p - i - j - k, i, j, k)    # w.r.t. vertices 0,1,2,3


def _quad_face_index(latt, face_latt, my_ids, stored_ids, p):
    """Lex dof index of a quad-face lattice point in the STORED face frame.

    ``face_latt``: lattice coords of my 4 face corners (my frame order);
    ``my_ids``/``stored_ids``: global vertex ids in my / stored order.
    """
    # my (u, v) in 1..p-1 along (c1-c0, c3-c0)
    c0, c1, c3 = face_latt[0], face_latt[1], face_latt[3]
    eu = (c1 - c0) // p
    ev = (c3 - c0) // p
    rel = np.asarray(latt) - c0
    u = int(rel @ eu)
    v = int(rel @ ev)
    # map to stored frame: stored corner q has quad coords Q[q]
    Q = [(0, 0), (p, 0), (p, p), (0, p)]
    pos = {g: Q[q] for q, g in enumerate(stored_ids)}
    P0 = np.array(pos[my_ids[0]])
    Pu = (np.array(pos[my_ids[1]]) - P0) // p
    Pv = (np.array(pos[my_ids[3]]) - P0) // p
    up, vp = P0 + u * Pu + v * Pv
    return (int(vp) - 1) * (p - 1) + (int(up) - 1)


def _tri_face_index(latt, f, my_ids, stored_ids, p):
    """Lex dof index of a tet tri-face lattice point in the stored frame.

    MFEM tri-face interior dofs: barycentric loops (for j, for i) w.r.t. the
    stored corner order (s0, s1, s2): point = s0 + i·(s1−s0)/p + j·(s2−s0)/p,
    i ≥ 1, j ≥ 1, i + j ≤ p − 1.
    """
    bar = _tet_bary(latt, p)
    # barycentric weight per my-face corner
    w = {g: bar[v] for g, v in zip(my_ids, f)}
    b1 = w[stored_ids[1]]
    b2 = w[stored_ids[2]]
    i, j = b1, b2
    # lex index over interior points (i>=1, j>=1, i+j<=p-1)
    idx = 0
    for jj in range(1, j):
        idx += (p - 1 - jj)
    return idx + (i - 1)


def _read_inline(body: str) -> Mesh:
    """'MFEM INLINE mesh v1.0': Cartesian generator parameters
    (mesh/mesh.cpp ReadInlineMesh analog)."""
    from ..mesh.mesh import (
        make_cartesian_2d,
        make_cartesian_2d_tri,
        make_cartesian_3d,
        make_cartesian_3d_tet,
    )

    kv = {}
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if "=" in line:
            k, v = (s.strip() for s in line.split("=", 1))
            kv[k] = v
    t = kv.get("type")
    g = lambda k, d: type(d)(kv.get(k, d))
    if t == "quad":
        return make_cartesian_2d(g("nx", 1), g("ny", 1), g("sx", 1.0), g("sy", 1.0))
    if t == "tri":
        return make_cartesian_2d_tri(g("nx", 1), g("ny", 1), g("sx", 1.0), g("sy", 1.0))
    if t == "hex":
        return make_cartesian_3d(
            g("nx", 1), g("ny", 1), g("nz", 1), g("sx", 1.0), g("sy", 1.0), g("sz", 1.0)
        )
    if t == "tet":
        return make_cartesian_3d_tet(
            g("nx", 1), g("ny", 1), g("nz", 1), g("sx", 1.0), g("sy", 1.0), g("sz", 1.0)
        )
    raise NotImplementedError(f"inline mesh type {t!r}")


def write_mfem_mesh(mesh, path: Optional[str] = None) -> str:
    """Serialize to 'MFEM mesh v1.0' (mesh/mesh.cpp:12288 analog).

    Accepts both homogeneous ``Mesh`` and ``fem.mixed.MixedMesh`` (one
    element line per block entry, MFEM geometry ids per row)."""
    out = io.StringIO()
    out.write("MFEM mesh v1.0\n\ndimension\n%d\n" % mesh.dim)
    out.write("\nelements\n%d\n" % mesh.ne)
    if hasattr(mesh, "blocks"):           # MixedMesh
        for (geom, elems, attrs) in mesh.blocks:
            g = int(geom)
            for attr, conn in zip(attrs, elems):
                out.write("%d %d %s\n" % (attr, g, " ".join(map(str, conn))))
        out.write("\nboundary\n%d\n" % mesh.nbe)
        for attr, conn in zip(mesh.bdr_attributes, mesh.boundary):
            out.write("%d 1 %s\n" % (attr, " ".join(map(str, conn))))
        out.write("\nvertices\n%d\n%d\n"
                  % (mesh.nv, mesh.vertices.shape[1]))
        for v in mesh.vertices:
            out.write(" ".join(repr(float(c)) for c in v) + "\n")
        s2 = out.getvalue()
        if path is not None:
            with open(path, "w") as f:
                f.write(s2)
        return s2
    g = int(mesh.geom)
    for attr, conn in zip(mesh.attributes, mesh.elements):
        out.write("%d %d %s\n" % (attr, g, " ".join(map(str, conn))))
    out.write("\nboundary\n%d\n" % mesh.nbe)
    bg = int(mesh.bdr_geom)
    for attr, conn in zip(mesh.bdr_attributes, mesh.boundary):
        out.write("%d %d %s\n" % (attr, bg, " ".join(map(str, conn))))
    out.write("\nvertices\n%d\n%d\n" % (mesh.nv, mesh.sdim))
    for v in mesh.vertices:
        out.write(" ".join(repr(float(c)) for c in v) + "\n")
    s = out.getvalue()
    if path is not None:
        with open(path, "w") as f:
            f.write(s)
    return s
