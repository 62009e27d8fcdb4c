"""MFEM-native mesh file I/O.

Reference analog: the ``"MFEM mesh v1.0"`` reader/writer
(``mesh/mesh.cpp:4964-4972`` parse, ``mesh.cpp:12288`` write).  The v1.0
format is the test corpus format for the 115 bundled meshes in
``/root/reference/data`` (star.mesh, beam-hex.mesh, fichera.mesh, …), so
reading it untranslated gives us the reference's acceptance meshes.

Geometry type codes match ``fem/geom.hpp``: 0=POINT … 5=CUBE.  Curved meshes
(trailing ``nodes`` FiniteElementSpace section) are parsed for H1 spaces with
lexicographic reconstruction deferred — straight meshes cover the current
test matrix; curved support is tracked for the NURBS/isoparametric round.
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

    if not (fec.endswith("P2") or fec == "Quadratic"):
        raise NotImplementedError(
            f"curved meshes: only order-1/2 nodes supported, got {fec!r}"
        )
    p = 2
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
