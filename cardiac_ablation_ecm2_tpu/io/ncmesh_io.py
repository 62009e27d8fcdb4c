"""Reader for the "MFEM NC mesh v1.0/v1.1" nonconforming format.

Reference analog: ``NCMesh::NCMesh(std::istream&)`` / ``Print``
(``mesh/ncmesh.cpp``; format dispatch ``mesh/mesh.cpp:4964-4972``).

The file stores the refinement FOREST in preorder — each element row is
``rank attr geom ref_type ids...`` where ``ref_type != 0`` makes ``ids``
child element indices and ``ref_type == 0`` makes them node ids — plus
``vertex_parents`` (every non-root vertex is the midpoint of two parents)
and top-level ``coordinates``.  We materialize the LEAF mesh (the active NC
mesh); hanging-node constraints re-derive geometrically via
``mesh.ncmesh.make_nc``.  Only isotropic refinements are supported (the
reference's anisotropic ref_types raise).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..fem.geometry import Geometry
from ..mesh.mesh import Mesh

_GEOM = {
    1: Geometry.SEGMENT,
    2: Geometry.TRIANGLE,
    3: Geometry.SQUARE,
    4: Geometry.TETRAHEDRON,
    5: Geometry.CUBE,
    6: Geometry.PRISM,
}
_NNODES = {Geometry.SEGMENT: 2, Geometry.TRIANGLE: 3, Geometry.SQUARE: 4,
           Geometry.TETRAHEDRON: 4, Geometry.CUBE: 8, Geometry.PRISM: 6}
_ISO_REF = {Geometry.SQUARE: 3, Geometry.CUBE: 7, Geometry.TRIANGLE: 3}


def read_ncmesh(path_or_text) -> Mesh:
    """Parse an NC mesh file into its active-leaf Mesh."""
    if isinstance(path_or_text, str) and "\n" not in path_or_text:
        with open(path_or_text) as f:
            text = f.read()
    else:
        text = path_or_text
    header, _, rest = text.partition("\n")
    if "MFEM NC mesh v1." not in header:
        raise ValueError(f"not an NC mesh: {header!r}")
    toks = iter(
        t for line in rest.splitlines()
        for t in line.split("#", 1)[0].split()
    )

    def tk():
        return next(toks)

    dim = None
    elements = []          # (rank, attr, geom, ref_type, ids)
    boundary = []
    vparents: List[tuple] = []
    coords = None
    while True:
        try:
            sec = tk()
        except StopIteration:
            break
        if sec == "dimension":
            dim = int(tk())
        elif sec == "elements":
            n = int(tk())
            for _ in range(n):
                rank, attr = int(tk()), int(tk())
                geom = _GEOM[int(tk())]
                ref = int(tk())
                # refined rows list 2^popcount(ref_type) children
                # (anisotropic ref_types 1..6 have 2 or 4); leaves list
                # the geometry's node count
                cnt = (_NNODES[geom] if ref == 0
                       else 2 ** bin(ref).count("1"))
                ids = [int(tk()) for _ in range(cnt)]
                elements.append((rank, attr, geom, ref, ids))
        elif sec == "boundary":
            n = int(tk())
            for _ in range(n):
                attr = int(tk())
                geom = _GEOM[int(tk())]
                ids = [int(tk()) for _ in range(_NNODES[geom])]
                boundary.append((attr, geom, ids))
        elif sec == "vertex_parents":
            n = int(tk())
            for _ in range(n):
                vparents.append((int(tk()), int(tk()), int(tk())))
        elif sec == "coordinates":
            nv = int(tk())
            d2 = int(tk())
            coords = np.array(
                [[float(tk()) for _ in range(d2)] for _ in range(nv)]
            )
        elif sec == "mfem_mesh_end":
            break
        elif sec in ("root_state", "nodes"):
            n = int(tk())
            for _ in range(n):
                tk()
        else:
            raise ValueError(f"unknown NC section {sec!r}")

    if coords is None or dim is None:
        raise ValueError("NC mesh missing coordinates/dimension")

    # resolve vertex coordinates (parents may come in any order → iterate)
    maxv = max(
        [v for v, _, _ in vparents] + [coords.shape[0] - 1]
        + [i for (_, _, _, ref, ids) in elements if ref == 0 for i in ids]
    )
    verts = np.full((maxv + 1, coords.shape[1]), np.nan)
    verts[: coords.shape[0]] = coords
    pending = list(vparents)
    for _ in range(64):
        left = []
        for (v, a, b) in pending:
            if np.isfinite(verts[a]).all() and np.isfinite(verts[b]).all():
                verts[v] = 0.5 * (verts[a] + verts[b])
            else:
                left.append((v, a, b))
        if len(left) == len(pending):
            break                       # no progress
        pending = left
        if not pending:
            break
    if pending:
        raise ValueError("unresolvable vertex_parents chain")

    leaves = [(attr, geom, ids) for (rank, attr, geom, ref, ids)
              in elements if ref == 0]
    geoms = {g for (_, g, _) in leaves}
    if len(geoms) != 1:
        raise NotImplementedError(f"mixed NC geometries {geoms}")
    geom = geoms.pop()

    conns = np.array([ids for (_, _, ids) in leaves], dtype=np.int64)
    attrs = np.array([a for (a, _, _) in leaves], dtype=np.int64)
    bconn = np.array([ids for (_, _, ids) in boundary], dtype=np.int64)
    battr = np.array([a for (a, _, _) in boundary], dtype=np.int64)

    used = np.unique(np.concatenate([conns.reshape(-1), bconn.reshape(-1)]))
    assert np.isfinite(verts[used]).all()
    remap = np.full(maxv + 1, -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    return Mesh(
        geom=geom,
        vertices=verts[used],
        elements=remap[conns],
        attributes=attrs,
        boundary=remap[bconn] if len(bconn) else bconn.reshape(0, 2),
        bdr_attributes=battr,
    )
