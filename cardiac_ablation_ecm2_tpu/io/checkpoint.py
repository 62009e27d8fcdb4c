"""Checkpoint / restart: the DataCollection subsystem.

Reference analog: ``DataCollection`` (``fem/datacollection.hpp:128``) — a
named field registry with cycle/time metadata and ``Save/Load`` for restart
(``datacollection.hpp:321-376``); the restart pattern of
``miniapps/electromagnetics/joule.cpp:563-575``.

TPU-native: one directory per collection; each ``save(cycle)`` writes
``cycle_NNNNNN.npz`` holding every registered field (device arrays pulled to
host) plus json metadata (time, dt, cycle, field→space info).  A VTU is
optionally emitted per cycle for visualization (ParaViewDataCollection role).
Orbax is deliberately not required — fields are plain dense arrays and npz is
sufficient and dependency-free; swap-in is trivial if sharded async
checkpointing is needed later.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DataCollection:
    """Named field registry with save/load (fem/datacollection.hpp:128)."""

    path: str
    mesh: object = None
    fes_map: Dict[str, object] = dataclasses.field(default_factory=dict)
    fields: Dict[str, object] = dataclasses.field(default_factory=dict)
    time: float = 0.0
    dt: float = 0.0
    cycle: int = 0

    def register_field(self, name: str, fes, array) -> None:
        """(DataCollection::RegisterField analog)."""
        self.fes_map[name] = fes
        self.fields[name] = array

    def set_time(self, t: float, dt: float = 0.0, cycle: int = 0) -> None:
        self.time, self.dt, self.cycle = float(t), float(dt), int(cycle)

    # ------------------------------------------------------------------
    def _cycle_file(self, cycle: int) -> str:
        return os.path.join(self.path, f"cycle_{cycle:06d}.npz")

    def save(self, write_vtu: bool = False) -> str:
        os.makedirs(self.path, exist_ok=True)
        arrays = {k: np.asarray(v) for k, v in self.fields.items()}
        meta = {
            "time": self.time,
            "dt": self.dt,
            "cycle": self.cycle,
            "fields": {
                k: {
                    "order": getattr(self.fes_map[k], "order", None),
                    "vdim": getattr(self.fes_map[k], "vdim", 1),
                    "shape": list(arrays[k].shape),
                }
                for k in arrays
            },
        }
        fn = self._cycle_file(self.cycle)
        np.savez_compressed(fn, __meta__=json.dumps(meta), **arrays)
        if write_vtu and self.mesh is not None:
            from .vtu import vertex_values, write_vtu as _wv

            pd = {}
            for k, arr in arrays.items():
                fes = self.fes_map[k]
                if hasattr(fes, "gather_map") and arr.ndim == 1 and (
                    len(arr) == fes.ndof_scalar
                ):
                    pd[k] = vertex_values(fes, arr)
            _wv(self.mesh, fn.replace(".npz", ".vtu"), point_data=pd)
        return fn

    def load(self, cycle: int) -> None:
        """Restore fields + metadata from a cycle file (Load analog)."""
        with np.load(self._cycle_file(cycle), allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))
            for k in meta["fields"]:
                self.fields[k] = jnp.asarray(z[k])
        self.time, self.dt, self.cycle = meta["time"], meta["dt"], meta["cycle"]

    def latest_cycle(self) -> Optional[int]:
        if not os.path.isdir(self.path):
            return None
        cycles = [
            int(f[len("cycle_"):-4])
            for f in os.listdir(self.path)
            if f.startswith("cycle_") and f.endswith(".npz")
        ]
        return max(cycles) if cycles else None


def save_gridfunction(path: str, fes, u) -> None:
    """Single-field save (GridFunction::Save analog, fem/gridfunc.cpp)."""
    np.savez_compressed(
        path, u=np.asarray(u), order=fes.order,
        vdim=getattr(fes, "vdim", 1),
    )


def load_gridfunction(path: str):
    with np.load(path) as z:
        return jnp.asarray(z["u"]), int(z["order"]), int(z["vdim"])


# ----------------------------------------------------------------------------
# VisIt DataCollection format (interop with the reference's tooling)
# ----------------------------------------------------------------------------


def _vertex_dof_values(fes, u):
    """H1 field → per-vertex values in MESH VERTEX order (MFEM's H1 order-1
    dof numbering IS the vertex numbering, which makes the written
    GridFunction exactly loadable by the reference's readers)."""
    from ..ops.vecfe import _vertex_dof_map

    mesh = fes.mesh
    u = np.asarray(u)
    if getattr(fes, "order", 1) == 1:
        vmap = _vertex_dof_map(fes)
        return u[..., vmap] if u.ndim > 1 else u[vmap]
    # higher order: restrict to vertices (visualization-grade, lossy).
    # Per-VERTEX lattice positions: vertex v of the reference element sits
    # at lattice multi-index REF_VERTS[v]·p (io/vtu.vertex_values pattern).
    from ..fem.basis import lattice_multi_index
    from ..fem.geometry import NUM_VERTS, REF_VERTS

    mi = lattice_multi_index(mesh.geom, fes.order)
    lookup = {tuple(r): i for i, r in enumerate(mi)}
    latt_v = np.rint(REF_VERTS[mesh.geom] * fes.order).astype(np.int64)
    gm = fes.gather_map
    out = np.zeros(u.shape[:-1] + (mesh.nv,), dtype=u.dtype)
    for lv in range(NUM_VERTS[mesh.geom]):
        n = lookup[tuple(latt_v[lv])]
        out[..., mesh.elements[:, lv]] = u[..., gm[:, n]]
    return out


def save_visit(path: str, name: str, mesh, fields: Dict[str, tuple],
               cycle: int = 0, time: float = 0.0, dt: float = 0.0) -> str:
    """Write a VisIt DataCollection: ``<name>_NNNNNN.mfem_root`` (JSON) +
    ``<name>_NNNNNN/mesh.000000`` (MFEM mesh v1.0) + one MFEM GridFunction
    file per field — loadable by VisIt's MFEM plugin and by the
    reference's ``VisItDataCollection::Load`` / ``convert-dc`` tools
    (fem/datacollection.hpp:426, writer datacollection.cpp:480-660).

    ``fields``: name → (fes, array).  H1 order-1 fields are written
    exactly; higher orders are vertex-restricted (viz-grade)."""
    from .mesh_io import write_mfem_mesh

    pad = f"{cycle:06d}"
    ddir = os.path.join(path, f"{name}_{pad}")
    os.makedirs(ddir, exist_ok=True)
    write_mfem_mesh(mesh, os.path.join(ddir, "mesh.000000"))

    fjson = {}
    for fname, (fes, arr) in fields.items():
        vals = _vertex_dof_values(fes, arr)
        vdim = 1 if vals.ndim == 1 else vals.shape[0]
        with open(os.path.join(ddir, f"{fname}.000000"), "w") as f:
            f.write("FiniteElementSpace\n")
            f.write(f"FiniteElementCollection: H1_{mesh.dim}D_P1\n")
            f.write(f"VDim: {vdim}\nOrdering: 0\n\n")
            # byNODES (Ordering: 0) = all X values, then all Y, then Z
            flat = vals.reshape(-1)
            for v in flat:
                f.write(f"{float(v)!r}\n")
        fjson[fname] = {
            "path": f"{name}_{pad}/{fname}.%06d",
            "tags": {"assoc": "nodes", "comps": str(vdim), "lod": "1"},
        }

    root = {
        "dsets": {"main": {
            "cycle": cycle, "time": time, "time_step": dt, "domains": 1,
            "mesh": {"path": f"{name}_{pad}/mesh.%06d",
                     "tags": {"spatial_dim": str(mesh.sdim),
                              "topo_dim": str(mesh.dim),
                              "max_lods": "32"}},
            "fields": fjson,
        }}
    }
    root_path = os.path.join(path, f"{name}_{pad}.mfem_root")
    with open(root_path, "w") as f:
        json.dump(root, f, indent=1)
    return root_path


def load_visit(root_path: str):
    """Load a VisIt DataCollection root written by ``save_visit`` (or the
    reference): returns (mesh, {field: values (vertex order)}, meta)."""
    from .mesh_io import read_mfem_mesh

    with open(root_path) as f:
        main = json.load(f)["dsets"]["main"]
    base = os.path.dirname(root_path)

    def _p(tpl):
        return os.path.join(base, tpl % 0)

    mesh = read_mfem_mesh(open(_p(main["mesh"]["path"])).read())
    fields = {}
    for fname, spec in main.get("fields", {}).items():
        with open(_p(spec["path"])) as f:
            lines = f.read().split("\n")
        i = lines.index("") + 1
        vals = np.array([float(x) for x in lines[i:] if x.strip()])
        comps = int(spec["tags"].get("comps", "1"))
        if comps > 1:
            vals = vals.reshape(comps, -1)     # byNODES (Ordering: 0)
        fields[fname] = vals
    meta = {"cycle": main["cycle"], "time": main["time"],
            "time_step": main.get("time_step", 0.0)}
    return mesh, fields, meta
