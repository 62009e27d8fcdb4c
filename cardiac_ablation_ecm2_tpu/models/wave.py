"""Second-order wave equation — the "ex23" capability slice.

Reference analog: ``examples/ex23.cpp``: d²u/dt² = c²Δu with Dirichlet BCs,
driven through ``SecondOrderTimeDependentOperator`` + Newmark-family solvers.

Semidiscrete: M a = −c² K u  (homogeneous Dirichlet), stage solves by PCG.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..fem.build import basis_for, geom_factors_for, restriction_for
from ..fem.fespace import FESpace
from ..linalg.solvers import cg
from ..ops import diffusion, mass
from ..utils.config import index_t


@dataclasses.dataclass(eq=False)
class WaveOperator:
    """SecondOrderTimeDependentOperator for the wave equation."""

    fes: FESpace
    c2: float = 1.0                     # wave speed squared
    ess_bdr: object = None              # None ⇒ all boundary attributes
    rel_tol: float = 1e-11
    max_iter: int = 500
    dtype: object = None

    def __post_init__(self):
        fes = self.fes
        self.restr = restriction_for(fes)
        self.db = basis_for(fes, dtype=self.dtype)
        self.gf = geom_factors_for(fes, dtype=self.dtype)
        self.M_qd = mass.setup(self.gf)
        self.K_qd = diffusion.setup(self.gf) * self.c2
        self.M_diag = self.restr.mult_transpose(
            mass.diagonal(self.db, self.M_qd)
        )
        self.K_diag = self.restr.mult_transpose(
            diffusion.diagonal(self.db, self.K_qd)
        )
        ess = fes.essential_dofs(self.ess_bdr)
        self.ess = jnp.asarray(ess, dtype=index_t())

    def _apply(self, qd_m, qd_k, v, cm=1.0, ck=1.0):
        e = self.restr.mult(v)
        out = cm * mass.apply(self.db, qd_m, e) + ck * diffusion.apply(
            self.db, qd_k, e
        )
        return self.restr.mult_transpose(out)

    def _z(self, v):
        return v.at[self.ess].set(0.0)

    def mult(self, t, u, v):
        """a = M⁻¹(−K u)."""
        rhs = self._z(-self._apply(self.M_qd, self.K_qd, self._z(u), 0.0, 1.0))

        def Mop(w):
            z = self._z(w)
            return self._z(self._apply(self.M_qd, self.K_qd, z, 1.0, 0.0)) + (
                w - z
            )

        d = self.M_diag.at[self.ess].set(1.0)
        a, _ = cg(Mop, rhs, M=lambda r: r / d, rel_tol=self.rel_tol,
                  max_iter=self.max_iter)
        return self._z(a)

    def implicit_solve(self, c0, c1, t, u, v):
        """Solve a = −M⁻¹K(u + c0·a)  ⇒  (M + c0 K) a = −K u."""
        rhs = self._z(-self._apply(self.M_qd, self.K_qd, self._z(u), 0.0, 1.0))

        def Top(w):
            z = self._z(w)
            y = self._apply(self.M_qd, self.K_qd, z, 1.0, c0)
            return self._z(y) + (w - z)

        d = (self.M_diag + c0 * self.K_diag).at[self.ess].set(1.0)
        a, _ = cg(Top, rhs, M=lambda r: r / d, rel_tol=self.rel_tol,
                  max_iter=self.max_iter)
        return self._z(a)


def make_stepper(op: WaveOperator, solver):
    @jax.jit
    def step(u, v, t, dt):
        return solver.step(op, u, v, t, dt)

    return step
