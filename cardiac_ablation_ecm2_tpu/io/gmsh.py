"""Gmsh mesh reader (MSH 2.2 ASCII).

Reference analog: ``mesh/gmsh.cpp`` (the reference reads .msh files; its
test corpus includes ``data/compass.msh``).  Scope: linear elements of a
single volume geometry (tri/quad/tet/hex) + boundary elements of the
matching facet type; physical-group tags become attributes; physical names
are returned as :class:`~..mesh.attribute_sets.AttributeSets`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..fem.geometry import Geometry
from ..mesh.attribute_sets import AttributeSets
from ..mesh.mesh import Mesh

# Gmsh element type → (geometry, nv); linear elements only
_GMSH_TYPES = {
    1: (Geometry.SEGMENT, 2),
    2: (Geometry.TRIANGLE, 3),
    3: (Geometry.SQUARE, 4),
    4: (Geometry.TETRAHEDRON, 4),
    5: (Geometry.CUBE, 8),
}

#: local vertex reorderings Gmsh → this library (MFEM conventions); identity
#: for everything except none needed at linear order (orderings coincide)
_DIM = {Geometry.SEGMENT: 1, Geometry.TRIANGLE: 2, Geometry.SQUARE: 2,
        Geometry.TETRAHEDRON: 3, Geometry.CUBE: 3}


def read_gmsh(path_or_text) -> Tuple[Mesh, AttributeSets]:
    if isinstance(path_or_text, str) and "\n" not in path_or_text:
        with open(path_or_text) as f:
            text = f.read()
    else:
        text = path_or_text
    lines = iter(text.splitlines())

    nodes: Dict[int, np.ndarray] = {}
    names = AttributeSets()
    elems_by_dim: Dict[int, list] = {0: [], 1: [], 2: [], 3: []}

    for line in lines:
        tag = line.strip()
        if tag == "$MeshFormat":
            ver = next(lines).split()
            if not ver[0].startswith("2"):
                raise NotImplementedError(f"MSH version {ver[0]} (need 2.x)")
            next(lines)  # $EndMeshFormat
        elif tag == "$PhysicalNames":
            n = int(next(lines))
            for _ in range(n):
                parts = next(lines).split(maxsplit=2)
                name = parts[2].strip('"')
                names.add_to(name, [int(parts[1])])
            next(lines)
        elif tag == "$Nodes":
            n = int(next(lines))
            for _ in range(n):
                parts = next(lines).split()
                nodes[int(parts[0])] = np.array(
                    [float(x) for x in parts[1:4]]
                )
            next(lines)
        elif tag == "$Elements":
            n = int(next(lines))
            for _ in range(n):
                parts = [int(x) for x in next(lines).split()]
                etype = parts[1]
                if etype not in _GMSH_TYPES:
                    continue
                geom, nv = _GMSH_TYPES[etype]
                ntags = parts[2]
                phys = parts[3] if ntags >= 1 else 1
                conn = parts[3 + ntags: 3 + ntags + nv]
                elems_by_dim[_DIM[geom]].append((geom, phys, conn))
            next(lines)

    dim = max(d for d in (3, 2, 1) if elems_by_dim[d]) if any(
        elems_by_dim[d] for d in (1, 2, 3)
    ) else 0
    vol = elems_by_dim[dim]
    bdr = elems_by_dim[dim - 1]
    geoms = sorted({g for g, _, _ in vol})

    # compact node numbering
    used = sorted(nodes)
    remap = {nid: i for i, nid in enumerate(used)}
    verts = np.array([nodes[nid] for nid in used])
    # drop unused trailing coordinate for 2D meshes
    if dim == 2 and np.allclose(verts[:, 2], verts[0, 2]):
        verts = verts[:, :2]

    if bdr:
        boundary = np.array([[remap[v] for v in c] for _, _, c in bdr],
                            dtype=np.int64)
        battrs = np.array([a for _, a, _ in bdr], dtype=np.int64)
    else:
        boundary = None
        battrs = np.zeros(0, dtype=np.int64)

    if len(geoms) > 1:
        # mixed-geometry mesh → per-geometry element blocks (2D)
        if dim != 2:
            raise NotImplementedError("mixed 3D volume geometries")
        from ..fem.mixed import MixedMesh

        blocks = []
        for g in geoms:
            rows = [(a, c) for gg, a, c in vol if gg == g]
            blocks.append((
                g,
                np.array([[remap[v] for v in c] for _, c in rows],
                         dtype=np.int64),
                np.array([a for a, _ in rows], dtype=np.int64),
            ))
        if boundary is None:
            boundary = np.zeros((0, 2), dtype=np.int64)
        mesh = MixedMesh(
            vertices=verts, blocks=tuple(blocks),
            boundary=boundary, bdr_attributes=battrs,
        )
        return mesh, names

    geom = geoms[0]
    elements = np.array([[remap[v] for v in c] for _, _, c in vol],
                        dtype=np.int64)
    attributes = np.array([a for _, a, _ in vol], dtype=np.int64)
    if boundary is None:
        from ..fem.geometry import FACE_GEOM, NUM_VERTS

        boundary = np.zeros((0, NUM_VERTS[FACE_GEOM[geom]]), dtype=np.int64)

    mesh = Mesh(
        geom=geom, vertices=verts, elements=elements, attributes=attributes,
        boundary=boundary, bdr_attributes=battrs,
    )
    return mesh, names
