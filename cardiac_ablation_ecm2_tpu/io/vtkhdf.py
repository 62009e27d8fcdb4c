"""VTKHDF (ParaView HDF5) DataCollection.

Reference analog: ``ParaViewHDFDataCollection`` (``fem/datacollection.hpp:651``,
impl ``fem/datacollection.cpp`` via ``mesh/vtkhdf.hpp``) — a single ``.vtkhdf``
file per collection holding the unstructured grid plus a temporal ``Steps``
group, readable directly by ParaView ≥ 5.13.

Layout written here (VTK HDF format v2.0, ``Type = "UnstructuredGrid"``):

    /VTKHDF                    attrs: Version=[2,0], Type
      NumberOfPoints/Cells/ConnectivityIds   (one partition)
      Points, Connectivity, Offsets, Types
      PointData/<name>         per-step rows appended along axis 0
      Steps                    attrs: NSteps; Values (times) + the
        PointOffsets/CellOffsets/PartOffsets/ConnectivityIdOffsets +
        PointDataOffsets/<name> tables (static geometry → zeros)

The geometry is written once (static mesh); each ``save(time, fields)``
appends one row block per field and bumps the step tables, matching how the
reference's collection appends cycles.  ``read_vtkhdf`` round-trips the file
for testing and for consuming reference-written collections.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..fem.geometry import Geometry
from .vtu import _VTK_TYPE


class VTKHDFDataCollection:
    """Append-mode temporal collection over a static unstructured mesh."""

    def __init__(self, path: str, mesh, compression: Optional[str] = None):
        import h5py

        self.path = path
        self._h5 = h5py.File(path, "w")
        self._compression = compression
        self._nsteps = 0
        self._names: list = []
        self._cell_names: list = []

        pts = np.asarray(mesh.vertices, np.float64)
        if pts.shape[1] < 3:
            pts = np.pad(pts, ((0, 0), (0, 3 - pts.shape[1])))
        if hasattr(mesh, "blocks"):            # MixedMesh
            conn, types, offs = [], [], [0]
            for (geom, elems, _a) in mesh.blocks:
                vt = _VTK_TYPE[geom]
                for row in elems:
                    conn.extend(int(v) for v in row)
                    offs.append(offs[-1] + len(row))
                    types.append(vt)
            conn = np.asarray(conn, np.int64)
            offs = np.asarray(offs, np.int64)
            types = np.asarray(types, np.uint8)
        else:
            ne, nv_el = mesh.elements.shape
            conn = np.asarray(mesh.elements, np.int64).ravel()
            offs = np.arange(ne + 1, dtype=np.int64) * nv_el
            types = np.full(ne, _VTK_TYPE[mesh.geom], np.uint8)

        g = self._h5.create_group("VTKHDF")
        g.attrs.create("Version", np.array([2, 0], np.int64))
        # ascii fixed-length attr — what ParaView's reader checks
        import h5py as _h5py

        g.attrs.create(
            "Type", np.bytes_("UnstructuredGrid"),
            dtype=_h5py.string_dtype("ascii", len("UnstructuredGrid")))
        self.npoints = pts.shape[0]
        self.ncells = len(types)
        g.create_dataset("NumberOfPoints", data=np.array([self.npoints]))
        g.create_dataset("NumberOfCells", data=np.array([self.ncells]))
        g.create_dataset("NumberOfConnectivityIds",
                         data=np.array([conn.size]))
        kw = dict(compression=compression) if compression else {}
        g.create_dataset("Points", data=pts, **kw)
        g.create_dataset("Connectivity", data=conn, **kw)
        g.create_dataset("Offsets", data=offs, **kw)
        g.create_dataset("Types", data=types)
        self._g = g

    def save(self, time: float, point_data: Dict[str, np.ndarray],
             cell_data: Optional[Dict[str, np.ndarray]] = None) -> None:
        """Append one time step.  Field name sets must match across steps."""
        import h5py

        g = self._g
        if self._nsteps == 0:
            st = g.create_group("Steps")
            st.create_dataset("Values", shape=(0,), maxshape=(None,),
                              dtype=np.float64)
            for nm in ("PartOffsets", "PointOffsets", "CellOffsets",
                       "ConnectivityIdOffsets"):
                st.create_dataset(nm, shape=(0,), maxshape=(None,),
                                  dtype=np.int64)
            pd = g.create_group("PointData")
            pdo = st.create_group("PointDataOffsets")
            for name, arr in point_data.items():
                arr = np.asarray(arr, np.float64)
                cols = () if arr.ndim == 1 else arr.shape[1:]
                pd.create_dataset(name, shape=(0,) + cols,
                                  maxshape=(None,) + cols, dtype=np.float64)
                pdo.create_dataset(name, shape=(0,), maxshape=(None,),
                                   dtype=np.int64)
            if cell_data:
                cd = g.create_group("CellData")
                cdo = st.create_group("CellDataOffsets")
                for name, arr in cell_data.items():
                    arr = np.asarray(arr, np.float64)
                    cols = () if arr.ndim == 1 else arr.shape[1:]
                    cd.create_dataset(name, shape=(0,) + cols,
                                      maxshape=(None,) + cols,
                                      dtype=np.float64)
                    cdo.create_dataset(name, shape=(0,), maxshape=(None,),
                                       dtype=np.int64)
            self._names = sorted(point_data)
            self._cell_names = sorted(cell_data or {})

        if sorted(point_data) != self._names:
            raise ValueError("field names must match across steps")
        if sorted(cell_data or {}) != self._cell_names:
            # the per-step offset tables desynchronize silently otherwise
            # (r3 advisor finding): validate exactly like point_data
            raise ValueError("cell-data field names must match across steps")
        st = g["Steps"]

        def _append(ds, rows):
            rows = np.asarray(rows)
            ds.resize(ds.shape[0] + rows.shape[0], axis=0)
            ds[-rows.shape[0]:] = rows

        _append(st["Values"], [time])
        _append(st["PartOffsets"], [0])
        _append(st["PointOffsets"], [0])      # static geometry
        _append(st["CellOffsets"], [0])
        _append(st["ConnectivityIdOffsets"], [0])
        for name, arr in point_data.items():
            arr = np.asarray(arr, np.float64)
            if arr.shape[0] != self.npoints:
                raise ValueError(
                    f"{name}: {arr.shape[0]} rows != {self.npoints} points")
            _append(st["PointDataOffsets"][name],
                    [self._nsteps * self.npoints])
            _append(g["PointData"][name], arr)
        for name, arr in (cell_data or {}).items():
            arr = np.asarray(arr, np.float64)
            _append(st["CellDataOffsets"][name],
                    [self._nsteps * self.ncells])
            _append(g["CellData"][name], arr)
        self._nsteps += 1
        st.attrs["NSteps"] = np.int64(self._nsteps)
        self._h5.flush()

    def close(self) -> None:
        self._h5.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_vtkhdf(path: str):
    """Read a (static-geometry) VTKHDF unstructured-grid collection.

    Returns ``(points, connectivity, offsets, types, steps)`` where steps is
    a list of ``(time, {name: point_array}, {name: cell_array})``."""
    import h5py

    with h5py.File(path, "r") as f:
        g = f["VTKHDF"]
        pts = g["Points"][()]
        conn = g["Connectivity"][()]
        offs = g["Offsets"][()]
        types = g["Types"][()]
        npts = int(g["NumberOfPoints"][0])
        ncel = int(g["NumberOfCells"][0])
        steps = []
        if "Steps" in g:
            st = g["Steps"]
            times = st["Values"][()]
            for k, t in enumerate(times):
                pd = {}
                for name, ds in g.get("PointData", {}).items():
                    o = int(st["PointDataOffsets"][name][k])
                    pd[name] = ds[o:o + npts]
                cd = {}
                if "CellData" in g:
                    for name, ds in g["CellData"].items():
                        o = int(st["CellDataOffsets"][name][k])
                        cd[name] = ds[o:o + ncel]
                steps.append((float(t), pd, cd))
        else:
            pd = {name: ds[()] for name, ds in g.get("PointData", {}).items()}
            cd = {name: ds[()] for name, ds in g.get("CellData", {}).items()}
            steps.append((0.0, pd, cd))
    return pts, conn, offs, types, steps
