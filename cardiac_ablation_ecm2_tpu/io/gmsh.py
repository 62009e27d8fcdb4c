"""Gmsh mesh reader: MSH 2.2 and 4.1, ASCII and binary.

Reference analog: ``mesh/mesh_readers.cpp:888-990`` (binary header &
endianness probe, v4 section layout) — real-world meshes today are MSH 4.1.
Scope: linear elements of a single volume geometry (tri/quad/tet/hex) +
boundary elements of the matching facet type; physical-group tags become
attributes (v4: elements inherit the first physical tag of their entity,
falling back to the elementary entity tag, matching gmsh.cpp); physical
names are returned as :class:`~..mesh.attribute_sets.AttributeSets`.
"""

from __future__ import annotations

import struct
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


def _parse_v2_ascii(lines, nodes, names, elems_by_dim):
    for line in lines:
        tag = line.strip()
        if tag == "$PhysicalNames":
            n = int(next(lines))
            for _ in range(n):
                parts = next(lines).split(maxsplit=2)
                names.add_to(parts[2].strip('"'), [int(parts[1])])
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


def _parse_v4_ascii(lines, nodes, names, elems_by_dim):
    """MSH 4.1 ASCII (gmsh.info MSH format spec; reference reader
    mesh/mesh_readers.cpp v4 sections)."""
    ent_phys: Dict[Tuple[int, int], int] = {}
    for line in lines:
        tag = line.strip()
        if tag == "$PhysicalNames":
            n = int(next(lines))
            for _ in range(n):
                parts = next(lines).split(maxsplit=2)
                names.add_to(parts[2].strip('"'), [int(parts[1])])
            next(lines)
        elif tag == "$Entities":
            counts = [int(x) for x in next(lines).split()]
            for d, cnt in enumerate(counts):
                for _ in range(cnt):
                    parts = next(lines).split()
                    etag = int(parts[0])
                    # points: tag x y z nphys [phys...]; others: tag + 6
                    # bbox floats + nphys [phys...] (+ bounding entities)
                    off = 4 if d == 0 else 7
                    nphys = int(parts[off])
                    if nphys > 0:
                        ent_phys[(d, etag)] = int(parts[off + 1])
            next(lines)
        elif tag == "$Nodes":
            nblocks = int(next(lines).split()[0])
            for _ in range(nblocks):
                _ed, _et, _par, nn = (int(x) for x in next(lines).split())
                tags = [int(next(lines)) for _ in range(nn)]
                for t in tags:
                    nodes[t] = np.array(
                        [float(x) for x in next(lines).split()[:3]])
            next(lines)
        elif tag == "$Elements":
            nblocks = int(next(lines).split()[0])
            for _ in range(nblocks):
                ed, et, etype, ne = (int(x) for x in next(lines).split())
                phys = ent_phys.get((ed, et), et)
                known = etype in _GMSH_TYPES
                for _ in range(ne):
                    parts = [int(x) for x in next(lines).split()]
                    if known:
                        geom, nv = _GMSH_TYPES[etype]
                        elems_by_dim[_DIM[geom]].append(
                            (geom, phys, parts[1:1 + nv]))
            next(lines)


def _sections(data: bytes):
    """Split binary MSH into {section: bytes} (between $X / $EndX)."""
    out = {}
    pos = 0
    while True:
        start = data.find(b"$", pos)
        if start < 0:
            break
        eol = data.find(b"\n", start)
        name = data[start + 1:eol].strip().decode()
        end_marker = b"$End" + name.encode()
        end = data.find(end_marker, eol)
        if end < 0:
            break
        out[name] = data[eol + 1:end]
        pos = end + len(end_marker)
    return out


def _parse_v2_binary(data, swap, nodes, names, elems_by_dim):
    sec = _sections(data)
    en = "<" if not swap else ">"
    if "PhysicalNames" in sec:
        txt = iter(sec["PhysicalNames"].decode().splitlines())
        n = int(next(txt))
        for _ in range(n):
            parts = next(txt).split(maxsplit=2)
            names.add_to(parts[2].strip('"'), [int(parts[1])])
    b = sec["Nodes"]
    eol = b.find(b"\n")
    n = int(b[:eol])
    rec = struct.Struct(en + "i3d")
    off = eol + 1
    for _ in range(n):
        nid, x, y, z = rec.unpack_from(b, off)
        nodes[nid] = np.array([x, y, z])
        off += rec.size
    b = sec["Elements"]
    eol = b.find(b"\n")
    n = int(b[:eol])
    off = eol + 1
    seen = 0
    i4 = struct.Struct(en + "i")

    def ints(k, off):
        return struct.unpack_from(en + f"{k}i", b, off), off + 4 * k

    while seen < n:
        (etype, nelem, ntags), off = ints(3, off)
        nv = _GMSH_TYPES.get(etype, (None, None))[1]
        if nv is None:
            # unknown type: we cannot skip without its node count
            raise NotImplementedError(f"gmsh binary element type {etype}")
        for _ in range(nelem):
            rec2, off = ints(1 + ntags + nv, off)
            phys = rec2[1] if ntags >= 1 else 1
            geom = _GMSH_TYPES[etype][0]
            elems_by_dim[_DIM[geom]].append(
                (geom, phys, list(rec2[1 + ntags:])))
        seen += nelem
    del i4


def _parse_v4_binary(data, swap, size_t, nodes, names, elems_by_dim):
    sec = _sections(data)
    en = "<" if not swap else ">"
    st = "q" if size_t == 8 else "i"
    if "PhysicalNames" in sec:
        txt = iter(sec["PhysicalNames"].decode().splitlines())
        n = int(next(txt))
        for _ in range(n):
            parts = next(txt).split(maxsplit=2)
            names.add_to(parts[2].strip('"'), [int(parts[1])])
    ent_phys: Dict[Tuple[int, int], int] = {}
    if "Entities" in sec:
        b = sec["Entities"]
        counts = struct.unpack_from(en + f"4{st}", b, 0)
        off = 4 * size_t
        for d, cnt in enumerate(counts):
            for _ in range(cnt):
                (etag,) = struct.unpack_from(en + "i", b, off)
                off += 4
                off += (3 if d == 0 else 6) * 8          # coords / bbox
                (nphys,) = struct.unpack_from(en + st, b, off)
                off += size_t
                if nphys > 0:
                    (p0,) = struct.unpack_from(en + "i", b, off)
                    ent_phys[(d, etag)] = p0
                off += 4 * nphys
                if d > 0:
                    (nb,) = struct.unpack_from(en + st, b, off)
                    off += size_t + 4 * nb               # bounding entities
    b = sec["Nodes"]
    nblocks = struct.unpack_from(en + st, b, 0)[0]
    off = 4 * size_t
    for _ in range(nblocks):
        _ed, _et, _par = struct.unpack_from(en + "3i", b, off)
        off += 12
        (nn,) = struct.unpack_from(en + st, b, off)
        off += size_t
        tags = struct.unpack_from(en + f"{nn}{st}", b, off)
        off += nn * size_t
        for t in tags:
            x, y, z = struct.unpack_from(en + "3d", b, off)
            nodes[t] = np.array([x, y, z])
            off += 24
    b = sec["Elements"]
    nblocks = struct.unpack_from(en + st, b, 0)[0]
    off = 4 * size_t
    for _ in range(nblocks):
        ed, et, etype = struct.unpack_from(en + "3i", b, off)
        off += 12
        (ne,) = struct.unpack_from(en + st, b, off)
        off += size_t
        phys = ent_phys.get((ed, et), et)
        if etype not in _GMSH_TYPES:
            raise NotImplementedError(f"gmsh binary element type {etype}")
        geom, nv = _GMSH_TYPES[etype]
        for _ in range(ne):
            rec = struct.unpack_from(en + f"{1 + nv}{st}", b, off)
            off += (1 + nv) * size_t
            elems_by_dim[_DIM[geom]].append((geom, phys, list(rec[1:])))


def read_gmsh(path_or_text) -> Tuple[Mesh, AttributeSets]:
    if isinstance(path_or_text, bytes):
        data = path_or_text
    elif isinstance(path_or_text, str) and "\n" not in path_or_text:
        with open(path_or_text, "rb") as f:
            data = f.read()
    else:
        data = path_or_text.encode()

    # header: "version file-type data-size" (file-type 1 = binary, followed
    # by the endianness probe int 1 — mesh/mesh_readers.cpp:888)
    hstart = data.find(b"$MeshFormat")
    heol = data.find(b"\n", hstart)
    hend = data.find(b"\n", heol + 1)
    ver, ftype, dsize = data[heol + 1:hend].split()[:3]
    binary = int(ftype) == 1
    size_t = int(dsize)

    nodes: Dict[int, np.ndarray] = {}
    names = AttributeSets()
    elems_by_dim: Dict[int, list] = {0: [], 1: [], 2: [], 3: []}

    if binary:
        probe = struct.unpack_from("<i", data, hend + 1)[0]
        swap = probe != 1
        body = data[data.find(b"$EndMeshFormat") + len(b"$EndMeshFormat"):]
        if ver.startswith(b"2"):
            _parse_v2_binary(body, swap, nodes, names, elems_by_dim)
        elif ver.startswith(b"4"):
            _parse_v4_binary(body, swap, size_t, nodes, names, elems_by_dim)
        else:
            raise NotImplementedError(f"MSH version {ver.decode()}")
    else:
        lines = iter(data.decode().splitlines())
        for line in lines:
            if line.strip() == "$MeshFormat":
                next(lines)
                next(lines)
                break
        if ver.startswith(b"2"):
            _parse_v2_ascii(lines, nodes, names, elems_by_dim)
        elif ver.startswith(b"4"):
            _parse_v4_ascii(lines, nodes, names, elems_by_dim)
        else:
            raise NotImplementedError(f"MSH version {ver.decode()}")

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
