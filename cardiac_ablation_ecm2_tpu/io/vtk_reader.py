"""Legacy VTK (ASCII, DATASET UNSTRUCTURED_GRID) mesh reader.

Reference analog: ``Mesh::ReadVTKMesh`` (``mesh/mesh_readers.cpp:1178``) —
cardiac/anatomy geometries commonly arrive in this format.  Supports linear
cells (line/tri/quad/tet/hex/wedge/pyramid), quadratic cells (tri-6, tet-10,
biquadratic quad-9, triquadratic hex-27 → order-2 curved ``nodes``), and the
``CELL_DATA SCALARS material`` attribute convention MFEM writes.  Boundary
elements are generated from once-referenced faces (attribute 1), matching
``Mesh::GenerateBoundaryElements``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..fem.geometry import (
    DIMENSION,
    FACES,
    Geometry,
    NUM_VERTS,
    REF_VERTS,
)
from ..mesh.mesh import Mesh

# VTK cell type → (geometry, nnodes, order)
_VTK_LINEAR = {
    3: (Geometry.SEGMENT, 2),
    5: (Geometry.TRIANGLE, 3),
    9: (Geometry.SQUARE, 4),
    10: (Geometry.TETRAHEDRON, 4),
    12: (Geometry.CUBE, 8),
    13: (Geometry.PRISM, 6),
    14: (Geometry.PYRAMID, 5),
}
_VTK_QUADRATIC = {
    22: (Geometry.TRIANGLE, 6),
    24: (Geometry.TETRAHEDRON, 10),
    28: (Geometry.SQUARE, 9),          # biquadratic quad (with center)
    29: (Geometry.CUBE, 27),           # triquadratic hex
}

# VTK edge orderings (corner-pair per midside node, in node order)
_VTK_EDGES = {
    Geometry.TRIANGLE: [(0, 1), (1, 2), (2, 0)],
    Geometry.SQUARE: [(0, 1), (1, 2), (2, 3), (3, 0)],
    Geometry.TETRAHEDRON: [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)],
    # verified against fichera-q2.{vtk,mesh}: edges CCW bottom, CCW top,
    # then verticals
    Geometry.CUBE: [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                    (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)],
}
# VTK face-center order for the 27-node hex (nodes 20-25): -x +x -y +y -z +z
# (verified against fichera-q2.{vtk,mesh})
_VTK_HEX_FACES = [(0, 4, 7, 3), (1, 2, 6, 5), (0, 1, 5, 4), (3, 7, 6, 2),
                  (0, 3, 2, 1), (4, 5, 6, 7)]


def read_vtk_mesh(path_or_text) -> Mesh:
    """Parse a legacy ASCII VTK unstructured grid into a Mesh."""
    if "\n" in str(path_or_text):
        text = str(path_or_text)
    else:
        with open(path_or_text) as f:
            text = f.read()
    lines = text.splitlines()
    # tokenize section-aware
    i = 0

    def next_line():
        nonlocal i
        while i < len(lines):
            ln = lines[i].strip()
            i += 1
            if ln:
                return ln
        raise EOFError("unexpected end of VTK file")

    header = next_line()
    if not header.startswith("# vtk DataFile"):
        raise ValueError("not a legacy VTK file")
    next_line()                                   # title
    fmt = next_line().upper()
    if fmt != "ASCII":
        raise NotImplementedError("only ASCII legacy VTK supported")
    ds = next_line().split()
    if ds[0] != "DATASET" or ds[1] != "UNSTRUCTURED_GRID":
        raise NotImplementedError(f"unsupported dataset {ds}")

    points = None
    conn = None
    offsets = None
    types = None
    material = None
    ncells = 0
    while i < len(lines):
        try:
            ln = next_line()
        except EOFError:
            break
        key = ln.split()[0].upper()
        if key == "POINTS":
            npts = int(ln.split()[1])
            vals = []
            while len(vals) < 3 * npts:
                vals.extend(float(t) for t in next_line().split())
            points = np.array(vals).reshape(npts, 3)
        elif key == "CELLS":
            ncells = int(ln.split()[1])
            total = int(ln.split()[2])
            vals = []
            while len(vals) < total:
                vals.extend(int(t) for t in next_line().split())
            vals = np.array(vals, dtype=np.int64)
            conn, offsets = [], []
            pos = 0
            for _ in range(ncells):
                n = vals[pos]
                conn.append(vals[pos + 1: pos + 1 + n])
                pos += 1 + n
        elif key == "CELL_TYPES":
            n = int(ln.split()[1])
            vals = []
            while len(vals) < n:
                vals.extend(int(t) for t in next_line().split())
            types = np.array(vals, dtype=np.int64)
        elif key == "CELL_DATA":
            pass
        elif key == "SCALARS":
            name = ln.split()[1]
            next_line()                            # LOOKUP_TABLE
            vals = []
            while len(vals) < ncells:
                vals.extend(int(float(t)) for t in next_line().split())
            if name.lower() == "material":
                material = np.array(vals, dtype=np.int64)
        elif key in ("POINT_DATA", "VECTORS", "FIELD", "LOOKUP_TABLE"):
            pass
    if points is None or types is None:
        raise ValueError("VTK file missing POINTS/CELLS/CELL_TYPES")

    utypes = set(int(t) for t in types)
    linear = utypes <= set(_VTK_LINEAR)
    quadratic = utypes <= set(_VTK_QUADRATIC)
    if not (linear or quadratic):
        raise NotImplementedError(
            f"unsupported or mixed-order VTK cell types {sorted(utypes)}"
        )
    table = _VTK_LINEAR if linear else _VTK_QUADRATIC
    geoms = {table[int(t)][0] for t in types}
    if len(geoms) > 1:
        raise NotImplementedError(
            f"mixed-geometry VTK meshes not supported yet: {geoms}"
        )
    geom = geoms.pop()
    dim = DIMENSION[geom]
    nve = NUM_VERTS[geom]

    corners = np.array([c[:nve] for c in conn], dtype=np.int64)
    if geom == Geometry.PRISM:
        # VTK wedges orient their triangles opposite to MFEM prisms
        # (vtk.cpp's prism permutation): swap 1<->2 and 4<->5
        corners = corners[:, [0, 2, 1, 3, 5, 4]]
    attrs = material if material is not None else np.ones(
        len(conn), dtype=np.int64)

    # compact vertices to the corner-referenced points
    used = np.unique(corners)
    remap = np.full(points.shape[0], -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    vertices = points[used][:, :max(dim, 1) if dim < 3 else 3]
    # keep z only when genuinely 3D data
    if dim < 3 and np.allclose(points[:, dim:], 0.0):
        vertices = points[used][:, :dim]
    elements = remap[corners]

    boundary, battr = _gen_boundary(geom, elements)
    mesh = Mesh(
        geom=geom, vertices=vertices, elements=elements,
        attributes=attrs, boundary=boundary, bdr_attributes=battr,
    )
    if quadratic:
        mesh.nodes = _quadratic_nodes(geom, conn, points, vertices.shape[1])
        mesh.nodes_order = 2
    return mesh


def _gen_boundary(geom: Geometry, elements: np.ndarray):
    """Faces referenced exactly once → boundary (attribute 1).

    For wedges/pyramids (mixed tri/quad faces) only faces of the primary
    boundary geometry (``FACE_GEOM``) are emitted — the single-shape
    boundary-array limitation of ``Mesh``; the rest remain natural.
    """
    from ..fem.geometry import FACE_GEOM

    faces = FACES[geom]
    nvf = NUM_VERTS[FACE_GEOM[geom]]
    keys = {}
    for e, conn in enumerate(elements):
        for f in faces:
            fv = tuple(int(conn[v]) for v in f)
            k = tuple(sorted(fv))
            if k in keys:
                keys[k] = None
            else:
                keys[k] = fv
    bdr = [fv for fv in keys.values() if fv is not None and len(fv) == nvf]
    if not bdr:
        return np.zeros((0, nvf), np.int64), np.zeros(0, np.int64)
    return np.array(bdr, dtype=np.int64), np.ones(len(bdr), dtype=np.int64)


def _quadratic_nodes(geom: Geometry, conn, points, sdim):
    """Map VTK quadratic node layouts onto our order-2 lattice E-vector."""
    from ..fem.basis import lattice_multi_index

    p = 2
    mi = lattice_multi_index(geom, p)
    latt_v = np.rint(REF_VERTS[geom] * p).astype(np.int64)
    nve = NUM_VERTS[geom]
    corner_of = {tuple(latt_v[v]): v for v in range(nve)}
    edges = _VTK_EDGES[geom]
    edge_of = {}
    for le, (a, b) in enumerate(edges):
        edge_of[tuple(((latt_v[a] + latt_v[b]) // 2).tolist())] = nve + le
    extra_of = {}
    if geom == Geometry.SQUARE:
        extra_of[(1, 1)] = nve + len(edges)                  # center = 8
    elif geom == Geometry.CUBE:
        for lf, f in enumerate(_VTK_HEX_FACES):
            c = sum(latt_v[v] for v in f) // 4
            extra_of[tuple(c.tolist())] = 20 + lf
        extra_of[(1, 1, 1)] = 26

    ne = len(conn)
    nodes = np.zeros((ne, len(mi), sdim))
    for e in range(ne):
        c = conn[e]
        for n, latt in enumerate(map(tuple, mi)):
            if latt in corner_of:
                pid = c[corner_of[latt]]
            elif latt in edge_of:
                pid = c[edge_of[latt]]
            else:
                pid = c[extra_of[latt]]
            nodes[e, n] = points[pid][:sdim]
    return nodes
