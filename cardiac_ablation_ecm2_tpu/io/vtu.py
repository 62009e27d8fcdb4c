"""ParaView VTU export.

Reference analog: ``ParaViewDataCollection`` (``fem/datacollection.hpp:584``).
Writes ascii .vtu unstructured-grid files with point data; enough for
visualization and for diffing fields between runs.  (GLVis socket streaming —
``general/socketstream.hpp`` — is deliberately replaced by file-based viz,
SURVEY.md §7 non-goals.)
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..fem.geometry import Geometry
from ..mesh.mesh import Mesh

_VTK_TYPE = {
    Geometry.SEGMENT: 3,
    Geometry.TRIANGLE: 5,
    Geometry.SQUARE: 9,
    Geometry.TETRAHEDRON: 10,
    Geometry.CUBE: 12,
}

# MFEM vertex order == VTK vertex order for these linear cells
def write_vtu_mixed(mesh, path, point_data=None) -> None:
    """VTU export for a MixedMesh (one cell batch per geometry block)."""
    pts = mesh.vertices
    if pts.shape[1] < 3:
        pts = np.pad(pts, ((0, 0), (0, 3 - pts.shape[1])))
    cells, types, offsets = [], [], []
    off = 0
    for (geom, elems, _a) in mesh.blocks:
        vt = _VTK_TYPE[geom]
        for row in elems:
            cells.extend(int(v) for v in row)
            off += len(row)
            offsets.append(off)
            types.append(vt)
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n<UnstructuredGrid>\n')
        f.write(f'<Piece NumberOfPoints="{mesh.nv}" '
                f'NumberOfCells="{len(types)}">\n')
        f.write('<Points>\n<DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        np.savetxt(f, pts, fmt="%.16g")
        f.write("</DataArray>\n</Points>\n<Cells>\n")
        f.write('<DataArray type="Int64" Name="connectivity" format="ascii">\n')
        f.write(" ".join(map(str, cells)) + "\n")
        f.write('</DataArray>\n<DataArray type="Int64" Name="offsets" '
                'format="ascii">\n')
        f.write(" ".join(map(str, offsets)) + "\n")
        f.write('</DataArray>\n<DataArray type="UInt8" Name="types" '
                'format="ascii">\n')
        f.write(" ".join(map(str, types)) + "\n")
        f.write("</DataArray>\n</Cells>\n")
        if point_data:
            f.write("<PointData>\n")
            for name, arr in point_data.items():
                arr = np.asarray(arr).reshape(mesh.nv, -1)
                f.write(f'<DataArray type="Float64" Name="{name}" '
                        f'NumberOfComponents="{arr.shape[1]}" format="ascii">\n')
                np.savetxt(f, arr, fmt="%.16g")
                f.write("</DataArray>\n")
            f.write("</PointData>\n")
        f.write("</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")


def write_vtu(
    mesh: Mesh,
    path: str,
    point_data: Optional[Dict[str, np.ndarray]] = None,
    cell_data: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Write the mesh (linear cells at mesh vertices) with vertex-valued
    fields.  Fields on higher-order spaces should be sampled at vertices via
    the vertex dofs (order-p H1 spaces contain the vertex values directly)."""
    pts = mesh.vertices
    if pts.shape[1] < 3:
        pts = np.pad(pts, ((0, 0), (0, 3 - pts.shape[1])))
    conn = mesh.elements
    ne, nv_el = conn.shape
    vtk_type = _VTK_TYPE[mesh.geom]

    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write(
            '<VTKFile type="UnstructuredGrid" version="0.1" '
            'byte_order="LittleEndian">\n'
        )
        f.write("<UnstructuredGrid>\n")
        f.write(
            f'<Piece NumberOfPoints="{mesh.nv}" NumberOfCells="{ne}">\n'
        )
        f.write('<Points>\n<DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        np.savetxt(f, pts, fmt="%.16g")
        f.write("</DataArray>\n</Points>\n<Cells>\n")
        f.write('<DataArray type="Int64" Name="connectivity" format="ascii">\n')
        np.savetxt(f, conn, fmt="%d")
        f.write('</DataArray>\n<DataArray type="Int64" Name="offsets" '
                'format="ascii">\n')
        np.savetxt(f, np.arange(1, ne + 1) * nv_el, fmt="%d")
        f.write('</DataArray>\n<DataArray type="UInt8" Name="types" '
                'format="ascii">\n')
        np.savetxt(f, np.full(ne, vtk_type), fmt="%d")
        f.write("</DataArray>\n</Cells>\n")
        if point_data:
            f.write("<PointData>\n")
            for name, arr in point_data.items():
                arr = np.asarray(arr).reshape(mesh.nv, -1)
                f.write(
                    f'<DataArray type="Float64" Name="{name}" '
                    f'NumberOfComponents="{arr.shape[1]}" format="ascii">\n'
                )
                np.savetxt(f, arr, fmt="%.16g")
                f.write("</DataArray>\n")
            f.write("</PointData>\n")
        if cell_data:
            f.write("<CellData>\n")
            for name, arr in cell_data.items():
                arr = np.asarray(arr).reshape(ne, -1)
                f.write(
                    f'<DataArray type="Float64" Name="{name}" '
                    f'NumberOfComponents="{arr.shape[1]}" format="ascii">\n'
                )
                np.savetxt(f, arr, fmt="%.16g")
                f.write("</DataArray>\n")
            f.write("</CellData>\n")
        f.write("</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")


def vertex_values(fes, u) -> np.ndarray:
    """Sample an H1 L-vector at mesh vertices (for VTU point data)."""
    # vertex dofs are the lattice corners of element 0..ne; use dof_coords
    # match: vertex v has a unique dof whose coords equal the vertex coords.
    # Fast path: scatter element corner values through the gather map.
    from ..fem.basis import lattice_multi_index
    from ..fem.geometry import NUM_VERTS, REF_VERTS

    mesh, p = fes.mesh, fes.order
    mi = lattice_multi_index(mesh.geom, p)
    lookup = {tuple(r): i for i, r in enumerate(mi)}
    latt_v = np.rint(REF_VERTS[mesh.geom] * p).astype(np.int64)
    u = np.asarray(u)
    out = np.zeros(mesh.nv, dtype=u.dtype)
    for lv in range(NUM_VERTS[mesh.geom]):
        n = lookup[tuple(latt_v[lv])]
        out[mesh.elements[:, lv]] = u[fes.gather_map[:, n]]
    return out


def write_pvd(path: str, entries) -> None:
    """ParaView collection (.pvd) time series: entries = [(time, vtu_path)]
    (ParaViewDataCollection time-series analog)."""
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n<VTKFile type="Collection" '
                'version="0.1">\n<Collection>\n')
        for t, fn in entries:
            f.write(f'<DataSet timestep="{t}" group="" part="0" '
                    f'file="{fn}"/>\n')
        f.write("</Collection>\n</VTKFile>\n")
