"""Exodus II / Cubit (.e/.exo, NetCDF classic) mesh reader.

Reference analog: ``Mesh::ReadCubit`` (``mesh/mesh_readers.cpp:3722-4050``).
Cardiac anatomies meshed in Cubit/Coreform arrive in this format.

Uses ``scipy.io.netcdf_file`` (NetCDF-3 classic, which is what Cubit
writes).  Supported: linear TRI3/QUAD4/TET4/HEX8/WEDGE6/PYRAMID5 blocks
(single geometry per mesh — block attributes become element attributes),
node coordinates (``coordx/y/z`` or a combined ``coord`` variable), and
side sets → boundary elements with the Exodus side-numbering tables
(``cubit_side_map_*``, mesh_readers.cpp:2890-2936).
"""

from __future__ import annotations

import numpy as np

from ..fem.geometry import Geometry
from ..mesh.mesh import Mesh

_TYPES = {
    "TRI": (Geometry.TRIANGLE, 3), "TRI3": (Geometry.TRIANGLE, 3),
    "QUAD": (Geometry.SQUARE, 4), "QUAD4": (Geometry.SQUARE, 4),
    "TETRA": (Geometry.TETRAHEDRON, 4), "TET4": (Geometry.TETRAHEDRON, 4),
    "TETRA4": (Geometry.TETRAHEDRON, 4),
    "HEX": (Geometry.CUBE, 8), "HEX8": (Geometry.CUBE, 8),
    "WEDGE": (Geometry.PRISM, 6), "WEDGE6": (Geometry.PRISM, 6),
    "PYRAMID": (Geometry.PYRAMID, 5), "PYRAMID5": (Geometry.PYRAMID, 5),
}

# Exodus side id (1-based) -> element-local node ids (1-based),
# mesh_readers.cpp:2890-2936
_SIDE_MAPS = {
    Geometry.TRIANGLE: [(1, 2), (2, 3), (3, 1)],
    Geometry.SQUARE: [(1, 2), (2, 3), (3, 4), (4, 1)],
    Geometry.TETRAHEDRON: [(1, 2, 4), (2, 3, 4), (1, 4, 3), (1, 3, 2)],
    Geometry.CUBE: [(1, 2, 6, 5), (2, 3, 7, 6), (3, 4, 8, 7),
                    (1, 5, 8, 4), (1, 4, 3, 2), (5, 6, 7, 8)],
}


def read_exodus(path) -> Mesh:
    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as nc:
        dims = nc.dimensions
        ndim = int(dims["num_dim"])
        nnodes = int(dims["num_nodes"])
        nblk = int(dims["num_el_blk"])
        nss = int(dims.get("num_side_sets") or 0)

        # coordinates: either coordx/coordy/coordz or one (ndim, nnodes)
        if "coordx" in nc.variables:
            axes = ["coordx", "coordy", "coordz"][:ndim]
            verts = np.stack(
                [nc.variables[a][:].astype(float) for a in axes], axis=1)
        else:
            verts = np.array(nc.variables["coord"][:]).T[:, :ndim]
        assert verts.shape == (nnodes, ndim)

        blk_ids = np.array(nc.variables["eb_prop1"][:]).astype(int) \
            if "eb_prop1" in nc.variables else np.arange(1, nblk + 1)

        elements, attrs = [], []
        geoms = set()
        for b in range(1, nblk + 1):
            conn = nc.variables[f"connect{b}"]
            etype = getattr(conn, "elem_type", b"").decode() \
                if isinstance(getattr(conn, "elem_type", ""), bytes) \
                else str(getattr(conn, "elem_type", ""))
            etype = etype.strip().upper().rstrip("\x00")
            if etype not in _TYPES:
                raise NotImplementedError(f"Exodus element type {etype!r}")
            geom, nv = _TYPES[etype]
            geoms.add(geom)
            c = np.array(conn[:]).astype(np.int64).reshape(-1, nv) - 1
            elements.append(c)
            attrs.append(np.full(len(c), blk_ids[b - 1], dtype=np.int64))
        if len(geoms) != 1:
            raise NotImplementedError(
                f"mixed-geometry Exodus meshes not supported: {geoms}")
        geom = geoms.pop()
        conn = np.concatenate(elements, axis=0)
        attr = np.concatenate(attrs)

        # side sets → boundary
        bdr, battr = [], []
        if nss:
            ss_ids = np.array(nc.variables["ss_prop1"][:]).astype(int) \
                if "ss_prop1" in nc.variables else np.arange(1, nss + 1)
            smap = _SIDE_MAPS.get(geom)
            for s in range(1, nss + 1):
                els = np.array(
                    nc.variables[f"elem_ss{s}"][:]).astype(int) - 1
                sides = np.array(
                    nc.variables[f"side_ss{s}"][:]).astype(int)
                for e, sd in zip(els, sides):
                    loc = smap[sd - 1]
                    bdr.append([int(conn[e, i - 1]) for i in loc])
                    battr.append(int(ss_ids[s - 1]))
        nvf = len(_SIDE_MAPS[geom][0]) if geom in _SIDE_MAPS else 2
        return Mesh(
            geom=geom, vertices=verts, elements=conn, attributes=attr,
            boundary=np.array(bdr, dtype=np.int64).reshape(-1, nvf),
            bdr_attributes=np.array(battr, dtype=np.int64),
        )


def write_exodus(mesh: Mesh, path: str) -> None:
    """Minimal Exodus II writer (single block, one side set per boundary
    attribute) — round-trip testing + interchange."""
    from scipy.io import netcdf_file

    geom_name = {
        Geometry.TRIANGLE: "TRI3", Geometry.SQUARE: "QUAD4",
        Geometry.TETRAHEDRON: "TET4", Geometry.CUBE: "HEX8",
        Geometry.PRISM: "WEDGE6", Geometry.PYRAMID: "PYRAMID5",
    }[mesh.geom]
    smap = _SIDE_MAPS[mesh.geom]

    # match boundary rows to (element, side) pairs
    face_of = {}
    for e in range(mesh.ne):
        for si, loc in enumerate(smap):
            key = tuple(sorted(int(mesh.elements[e, i - 1]) for i in loc))
            face_of.setdefault(key, (e + 1, si + 1))
    battrs = sorted(set(int(a) for a in mesh.bdr_attributes))
    ss = {a: [] for a in battrs}
    for row, a in zip(mesh.boundary, mesh.bdr_attributes):
        key = tuple(sorted(int(v) for v in row))
        if key in face_of:
            ss[int(a)].append(face_of[key])

    with netcdf_file(path, "w") as nc:
        nc.createDimension("num_dim", mesh.sdim)
        nc.createDimension("num_nodes", mesh.nv)
        nc.createDimension("num_elem", mesh.ne)
        nc.createDimension("num_el_blk", 1)
        nc.createDimension("num_el_in_blk1", mesh.ne)
        nc.createDimension("num_nod_per_el1", mesh.elements.shape[1])
        if battrs:
            nc.createDimension("num_side_sets", len(battrs))
        for d, name in enumerate(["coordx", "coordy", "coordz"][:mesh.sdim]):
            v = nc.createVariable(name, "d", ("num_nodes",))
            v[:] = mesh.vertices[:, d]
        eb = nc.createVariable("eb_prop1", "i", ("num_el_blk",))
        eb[:] = [1]
        cv = nc.createVariable(
            "connect1", "i", ("num_el_in_blk1", "num_nod_per_el1"))
        cv[:] = (mesh.elements + 1).astype(np.int32)
        cv.elem_type = geom_name
        if battrs:
            sp = nc.createVariable("ss_prop1", "i", ("num_side_sets",))
            sp[:] = battrs
            for i, a in enumerate(battrs, start=1):
                pairs = ss[a]
                nc.createDimension(f"num_side_ss{i}", max(len(pairs), 1))
                ev = nc.createVariable(
                    f"elem_ss{i}", "i", (f"num_side_ss{i}",))
                sv = nc.createVariable(
                    f"side_ss{i}", "i", (f"num_side_ss{i}",))
                if pairs:
                    ev[:] = [p[0] for p in pairs]
                    sv[:] = [p[1] for p in pairs]
                else:
                    ev[:] = [1]
                    sv[:] = [1]
