"""MFEM parallel mesh format ("MFEM mesh v1.2") read/write.

Reference analog: ``ParMesh::ParPrint`` (``mesh/pmesh.cpp:6351``) writes,
per rank, the serial v1.0 body under an ``MFEM mesh v1.2`` header closed by
``mfem_serial_mesh_end``, then the group topology (``GroupTopology::Save``,
``general/communication.cpp``) and the per-group shared vertex/edge/face
lists, closed by ``mfem_mesh_end``; ``ParMesh::ParMesh(comm, istream&)``
reads it back via ``LoadSharedEntities`` (``mesh/pmesh.cpp:984``).  File
naming follows ``ParMesh::Save``: ``<prefix>.<rank:06d>``.

Here the writer derives each rank's local mesh AND its shared-entity
groups from a (global mesh, element→rank partition) pair — the same
information our element-block sharding uses — so a partitioned run can be
checkpointed in the reference's own parallel restart format and an
MFEM-written rank file set can be ingested for cross-code restart.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..fem.geometry import DIMENSION, EDGES, FACES, Geometry
from ..mesh.mesh import Mesh
from .mesh_io import read_mfem_mesh, write_mfem_mesh


@dataclasses.dataclass
class ParMeshPart:
    """One rank's slice: local mesh + shared-entity groups.

    ``groups``: list of sorted rank tuples (group 0 = (rank,) alone).
    ``shared_*``: per group (index ≥ 1), entity lists in LOCAL numbering —
    vertices as ids, edges as vertex pairs, faces as (geom, vertex tuple).
    """

    rank: int
    mesh: Mesh
    groups: List[Tuple[int, ...]]
    shared_vertices: List[List[int]]
    shared_edges: List[List[Tuple[int, int]]]
    shared_faces: List[List[Tuple[int, Tuple[int, ...]]]]
    global_vertex: Optional[np.ndarray] = None   # local → global (writer)


def _entity_rank_sets(mesh: Mesh, parts: np.ndarray):
    """rank-sets per global vertex / edge / face key."""
    nv = mesh.nv
    vsets: Dict[int, set] = {}
    esets: Dict[Tuple[int, int], set] = {}
    fsets: Dict[Tuple[int, ...], set] = {}
    edges_loc = EDGES[mesh.geom]
    faces_loc = FACES[mesh.geom] if mesh.dim == 3 else ()
    for e in range(mesh.ne):
        r = int(parts[e])
        ev = mesh.elements[e]
        for v in ev:
            vsets.setdefault(int(v), set()).add(r)
        for (a, b) in edges_loc:
            k = tuple(sorted((int(ev[a]), int(ev[b]))))
            esets.setdefault(k, set()).add(r)
        for f in faces_loc:
            k = tuple(sorted(int(ev[i]) for i in f))
            fsets.setdefault(k, set()).add(r)
    return vsets, esets, fsets


def partition_to_parts(mesh: Mesh, parts: np.ndarray) -> List[ParMeshPart]:
    """Split a conforming global mesh into per-rank ParMeshPart slices."""
    parts = np.asarray(parts)
    nranks = int(parts.max()) + 1
    vsets, esets, fsets = _entity_rank_sets(mesh, parts)
    out = []
    edges_loc = EDGES[mesh.geom]
    faces_loc = FACES[mesh.geom] if mesh.dim == 3 else ()
    for r in range(nranks):
        sel = np.nonzero(parts == r)[0]
        elems = mesh.elements[sel]
        gverts = np.unique(elems)
        l_of_g = {int(g): i for i, g in enumerate(gverts)}
        lelems = np.vectorize(lambda g: l_of_g[int(g)])(elems)
        # local boundary: global boundary faces whose element is on r —
        # keep every boundary face all of whose vertices live here AND
        # which bounds a local element (vertex containment is sufficient
        # for the conforming meshes we partition)
        bsel = [i for i in range(mesh.nbe)
                if all(int(v) in l_of_g for v in mesh.boundary[i])]
        lbdr = (np.vectorize(lambda g: l_of_g[int(g)])(mesh.boundary[bsel])
                if bsel else np.zeros((0, mesh.boundary.shape[1]), np.int64))
        lmesh = Mesh(
            geom=mesh.geom, vertices=mesh.vertices[gverts],
            elements=lelems.astype(np.int64),
            attributes=mesh.attributes[sel],
            boundary=lbdr.astype(np.int64),
            bdr_attributes=(mesh.bdr_attributes[bsel] if bsel
                            else np.zeros(0, np.int64)))
        # groups: unique rank-sets (|set| > 1) over the entities touching r
        gset = set()
        for table in (vsets, esets, fsets):
            for k, s in table.items():
                if r in s and len(s) > 1:
                    gset.add(tuple(sorted(s)))
        groups = [(r,)] + sorted(gset)
        gid = {g: i for i, g in enumerate(groups)}
        sv: List[List[int]] = [[] for _ in groups]
        se: List[List[Tuple[int, int]]] = [[] for _ in groups]
        sf: List[List[Tuple[int, Tuple[int, ...]]]] = [[] for _ in groups]
        for g, s in vsets.items():
            if r in s and len(s) > 1 and g in l_of_g:
                sv[gid[tuple(sorted(s))]].append(l_of_g[g])
        for k, s in esets.items():
            if r in s and len(s) > 1:
                se[gid[tuple(sorted(s))]].append(
                    (l_of_g[k[0]], l_of_g[k[1]]))
        for k, s in fsets.items():
            if r in s and len(s) > 1:
                geom_f = Geometry.TRIANGLE if len(k) == 3 else Geometry.SQUARE
                sf[gid[tuple(sorted(s))]].append(
                    (int(geom_f), tuple(l_of_g[v] for v in k)))
        out.append(ParMeshPart(
            rank=r, mesh=lmesh, groups=groups,
            shared_vertices=sv, shared_edges=se, shared_faces=sf,
            global_vertex=gverts))
    return out


def write_par_mesh(mesh: Mesh, parts: np.ndarray, prefix: str) -> List[str]:
    """Write per-rank ``<prefix>.<rank:06d>`` files in MFEM mesh v1.2."""
    pieces = partition_to_parts(mesh, parts)
    paths = []
    for p in pieces:
        path = f"{prefix}.{p.rank:06d}"
        serial = write_mfem_mesh(p.mesh)
        body = serial.replace("MFEM mesh v1.0\n", "MFEM mesh v1.2\n", 1)
        with open(path, "w") as f:
            f.write(body)
            f.write("\nmfem_serial_mesh_end\n")
            # GroupTopology::Save — every group lists its member ranks
            f.write("\ncommunication_groups\n")
            f.write(f"number_of_groups {len(p.groups)}\n\n")
            f.write("# number of entities in each group, followed by ranks "
                    "in group\n")
            for g in p.groups:
                f.write(str(len(g)) + "".join(f" {r}" for r in g) + "\n")
            nsv = sum(len(v) for v in p.shared_vertices)
            f.write(f"\ntotal_shared_vertices {nsv}\n")
            if mesh.dim >= 2:
                nse = sum(len(v) for v in p.shared_edges)
                f.write(f"total_shared_edges {nse}\n")
            if mesh.dim >= 3:
                nsf = sum(len(v) for v in p.shared_faces)
                f.write(f"total_shared_faces {nsf}\n")
            f.write("\n# group 0 has no shared entities\n")
            for gi in range(1, len(p.groups)):
                f.write(f"\n# group {gi}\nshared_vertices "
                        f"{len(p.shared_vertices[gi])}\n")
                for v in p.shared_vertices[gi]:
                    f.write(f"{v}\n")
                if mesh.dim >= 2:
                    f.write(f"\nshared_edges {len(p.shared_edges[gi])}\n")
                    for (a, b) in p.shared_edges[gi]:
                        f.write(f"{a} {b}\n")
                if mesh.dim >= 3:
                    f.write(f"\nshared_faces {len(p.shared_faces[gi])}\n")
                    for (gf, vs) in p.shared_faces[gi]:
                        f.write(str(gf) + "".join(f" {v}" for v in vs) + "\n")
            f.write("\nmfem_mesh_end\n")
        paths.append(path)
    return paths


def read_par_mesh(prefix: str, nranks: int) -> List[ParMeshPart]:
    """Read ``<prefix>.<rank:06d>`` v1.2 files (``ParMesh`` stream analog)."""
    out = []
    for r in range(nranks):
        with open(f"{prefix}.{r:06d}") as f:
            text = f.read()
        head, _, tail = text.partition("mfem_serial_mesh_end")
        if "MFEM mesh v1.2" not in head:
            raise ValueError("not an MFEM mesh v1.2 rank file")
        lmesh = read_mfem_mesh(
            head.replace("MFEM mesh v1.2", "MFEM mesh v1.0", 1))
        toks = iter(_strip_comments(tail).split())

        def expect(word, t=toks):
            got = next(t)
            if got != word:
                raise ValueError(f"expected {word!r}, got {got!r}")

        expect("communication_groups")
        expect("number_of_groups")
        ng = int(next(toks))
        groups = []
        for _ in range(ng):
            sz = int(next(toks))
            groups.append(tuple(int(next(toks)) for _ in range(sz)))
        expect("total_shared_vertices")
        int(next(toks))
        if lmesh.dim >= 2:
            expect("total_shared_edges")
            int(next(toks))
        if lmesh.dim >= 3:
            expect("total_shared_faces")
            int(next(toks))
        sv: List[List[int]] = [[] for _ in groups]
        se: List[List[Tuple[int, int]]] = [[] for _ in groups]
        sf: List[List[Tuple[int, Tuple[int, ...]]]] = [[] for _ in groups]
        for gi in range(1, ng):
            expect("shared_vertices")
            n = int(next(toks))
            sv[gi] = [int(next(toks)) for _ in range(n)]
            if lmesh.dim >= 2:
                expect("shared_edges")
                n = int(next(toks))
                se[gi] = [(int(next(toks)), int(next(toks)))
                          for _ in range(n)]
            if lmesh.dim >= 3:
                expect("shared_faces")
                n = int(next(toks))
                for _ in range(n):
                    gf = int(next(toks))
                    nfv = 3 if gf == int(Geometry.TRIANGLE) else 4
                    sf[gi].append(
                        (gf, tuple(int(next(toks)) for _ in range(nfv))))
        out.append(ParMeshPart(rank=r, mesh=lmesh, groups=groups,
                               shared_vertices=sv, shared_edges=se,
                               shared_faces=sf))
    return out


def _strip_comments(text: str) -> str:
    return "\n".join(ln for ln in text.splitlines()
                     if not ln.lstrip().startswith("#"))


def reassemble(parts: Sequence[ParMeshPart], tol: float = 0.0) -> Mesh:
    """Glue rank slices back into one conforming global mesh, identifying
    shared vertices by exact coordinate match (the writer round-trips
    float64 exactly via repr)."""
    key_of: Dict[bytes, int] = {}
    verts: List[np.ndarray] = []
    elems, attrs, bdr, battr = [], [], [], []
    for p in parts:
        local_to_glob = np.zeros(p.mesh.nv, dtype=np.int64)
        for i, v in enumerate(p.mesh.vertices):
            k = v.tobytes()
            if k not in key_of:
                key_of[k] = len(verts)
                verts.append(v)
            local_to_glob[i] = key_of[k]
        elems.append(local_to_glob[p.mesh.elements])
        attrs.append(p.mesh.attributes)
        if p.mesh.nbe:
            bdr.append(local_to_glob[p.mesh.boundary])
            battr.append(p.mesh.bdr_attributes)
    g0 = parts[0].mesh
    return Mesh(
        geom=g0.geom, vertices=np.asarray(verts),
        elements=np.concatenate(elems),
        attributes=np.concatenate(attrs),
        boundary=(np.concatenate(bdr) if bdr
                  else np.zeros((0, 1), np.int64)),
        bdr_attributes=(np.concatenate(battr) if battr
                        else np.zeros(0, np.int64)))
