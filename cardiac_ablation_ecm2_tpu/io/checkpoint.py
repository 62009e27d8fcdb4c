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
