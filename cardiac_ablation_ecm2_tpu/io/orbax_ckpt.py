"""Sharded (multi-host-capable) checkpointing via Orbax.

Reference analog: the restart half of ``DataCollection::Save/Load``
(``fem/datacollection.hpp:321-376``) — but for *distributed* state: in the
reference, each MPI rank writes its own piece (``Save(): one file per
processor``); here a sharded ``jax.Array`` laid out over a ``Mesh`` is
written by Orbax's tensorstore backend without ever gathering to one host,
and restored with the SAME or a DIFFERENT sharding (restart on a different
chip count — the rank-remap case MFEM handles via ParMesh rebalancing).

The plain npz ``DataCollection`` (``io/checkpoint.py``) stays the simple
single-host path; this module is the production path for sharded state:

    ckpt = ShardedCheckpointer("/ckpts/run1", max_to_keep=3)
    ckpt.save(step, {"T": T_sharded, "t": t})          # async by default
    state = ckpt.restore(template={"T": T_like, "t": 0.0})
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class ShardedCheckpointer:
    """Async sharded checkpoint manager (Orbax CheckpointManager wrapper).

    ``save`` is asynchronous — compute proceeds while tensorstore writes;
    call ``wait()`` (or pass ``wait=True``) to block, e.g. before exit.
    ``restore`` reshards to the shardings found in ``template`` (a pytree
    of arrays or jax.ShapeDtypeStructs carrying .sharding), so a run can
    restart on a different mesh shape than it saved from."""

    def __init__(self, path: str, max_to_keep: Optional[int] = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=self._ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def restore(self, step: Optional[int] = None,
                template: Any = None) -> Any:
        """Restore ``step`` (default: latest).  With ``template``, arrays
        are restored directly onto the template's shardings (possibly a
        different device mesh than at save time)."""
        if step is None:
            step = self.latest()
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.path}")
        if template is None:
            return self._mgr.restore(step)
        shaped = jax.tree_util.tree_map(
            lambda x: x if isinstance(x, jax.ShapeDtypeStruct)
            else jax.ShapeDtypeStruct(
                getattr(x, "shape", ()), getattr(x, "dtype", None),
                sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0 else x,
            template)
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(shaped))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
