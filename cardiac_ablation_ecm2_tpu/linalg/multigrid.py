"""Geometric/polynomial multigrid.

Reference analog: ``Multigrid`` (``fem/multigrid.hpp:25,135``) over a
``FiniteElementSpaceHierarchy`` with Chebyshev-smoothed levels — the ex26
p-multigrid pattern, and the designated BoomerAMG substitute for this build
(SURVEY.md §2.6 item 1: matrix-free Krylov + Chebyshev/multigrid stacks).

A hierarchy is a list of levels coarse→fine; each level has a matrix-free
operator and a Chebyshev smoother; transfers come from ``fem/transfer``.  The
V-cycle is a pure jittable function (static recursion depth), usable directly
as a CG preconditioner.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp

from .smoothers import chebyshev
from .solvers import cg


@dataclasses.dataclass(eq=False)
class MGLevel:
    A: Callable                       # operator apply (constrained if BCs)
    smoother: Callable                # approximate A^{-1} (e.g. Chebyshev)
    prolongate: Optional[Callable]    # from next-coarser level (None at L0)
    restrict_t: Optional[Callable]
    ess: Optional[jnp.ndarray] = None # essential dofs of THIS level


@dataclasses.dataclass(eq=False)
class Multigrid:
    """V-cycle over levels[0]=coarsest … levels[-1]=finest."""

    levels: List[MGLevel]
    coarse_iters: int = 32            # CG iterations on the coarsest level
    coarse_M: Optional[Callable] = None

    def _coarse_solve(self, b):
        lvl = self.levels[0]
        x, _ = cg(lvl.A, b, M=self.coarse_M or lvl.smoother,
                  rel_tol=1e-8, max_iter=self.coarse_iters)
        return x

    def v_cycle(self, b, level: Optional[int] = None):
        if level is None:
            level = len(self.levels) - 1
        if level == 0:
            return self._coarse_solve(b)
        lvl = self.levels[level]
        x = lvl.smoother(b)                              # pre-smooth (x0 = 0)
        r = b - lvl.A(x)
        rc = lvl.restrict_t(r)
        coarse_ess = self.levels[level - 1].ess
        if coarse_ess is not None:
            # restriction leaks interior residual into constrained coarse
            # rows; project back onto the constrained subspace
            rc = rc.at[coarse_ess].set(0.0)
        ec = self.v_cycle(rc, level - 1)
        x = x + lvl.prolongate(ec)
        x = x + lvl.smoother(b - lvl.A(x))               # post-smooth
        return x

    def preconditioner(self) -> Callable:
        return lambda r: self.v_cycle(r)


def make_p_multigrid(
    fes_factory: Callable,
    operator_factory: Callable,
    orders: Sequence[int],
    smoother_order: int = 3,
    ess_factory: Optional[Callable] = None,   # fes -> essential dof array
    dtype=None,
) -> Multigrid:
    """Build p-MG: ``fes_factory(p)`` → FESpace, ``operator_factory(fes)`` →
    object with .mult and .diagonal (e.g. a constrained PAOperator).

    ``orders`` coarse→fine, e.g. (1, 2, 4).  The essential-dof sets of all
    levels must be nested (same boundary attributes), which holds for
    same-mesh p-hierarchies.
    """
    from ..fem.transfer import PTransfer

    spaces = [fes_factory(p) for p in orders]
    ops = [operator_factory(f) for f in spaces]
    levels: List[MGLevel] = []
    for i, (f, op) in enumerate(zip(spaces, ops)):
        diag = op.diagonal()
        sm = chebyshev(op.mult, diag, order=smoother_order)
        ess = ess_factory(f) if ess_factory is not None else None
        if ess is not None:
            ess = jnp.asarray(ess)
        if i == 0:
            levels.append(MGLevel(op.mult, sm, None, None, ess))
        else:
            tr = PTransfer(spaces[i - 1], f, dtype=dtype)
            levels.append(
                MGLevel(op.mult, sm, tr.prolongate, tr.restrict_t, ess)
            )
    return Multigrid(levels=levels)


def make_h_multigrid(
    meshes: Sequence,
    fes_factory: Callable,
    operator_factory: Callable,
    smoother_order: int = 3,
    ess_factory: Optional[Callable] = None,
    dtype=None,
) -> Multigrid:
    """Build h-MG over a uniform-refinement mesh hierarchy (coarse→fine)."""
    from ..fem.transfer import HTransfer

    spaces = [fes_factory(m) for m in meshes]
    ops = [operator_factory(f) for f in spaces]
    levels: List[MGLevel] = []
    for i, (f, op) in enumerate(zip(spaces, ops)):
        sm = chebyshev(op.mult, op.diagonal(), order=smoother_order)
        ess = ess_factory(f) if ess_factory is not None else None
        if ess is not None:
            ess = jnp.asarray(ess)
        if i == 0:
            levels.append(MGLevel(op.mult, sm, None, None, ess))
        else:
            tr = HTransfer(spaces[i - 1], f, dtype=dtype)
            levels.append(
                MGLevel(op.mult, sm, tr.prolongate, tr.restrict_t, ess)
            )
    return Multigrid(levels=levels)
