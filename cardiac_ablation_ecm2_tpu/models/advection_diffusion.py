"""IMEX advection–diffusion on DG — the "ex41" capability slice.

Reference analog: ``examples/ex41.cpp`` — an IMEX split where the
(nonstiff) DG advection term is integrated explicitly and the (stiff) DG
diffusion term implicitly, with the IMEX ODE solvers of ``linalg/ode.cpp``.

    du/dt = −v·∇u + ε Δu
    f_ex(u) = M⁻¹ K_adv u (upwind DG)      — explicit part
    implicit_solve(γ): (M + γ A_sipg) k = −A_sipg u
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


from ..fem.build import basis_for, geom_factors_for
from ..fem.fespace import L2FESpace
from ..fem.quadinterp import eval_values, eval_values_t
from ..linalg.solvers import cg
from ..ops import mass as mmod
from ..ops.dg_advection import DGAdvection
from ..ops.dg_diffusion import DGDiffusion


@dataclasses.dataclass(eq=False)
class DGAdvectionDiffusion:
    """IMEX TimeDependentOperator: explicit upwind advection + implicit SIPG
    diffusion."""

    fes: L2FESpace
    velocity: Callable
    epsilon: float = 1e-2
    inflow: Optional[Callable] = None
    rel_tol: float = 1e-10
    max_iter: int = 500
    dtype: object = None

    def __post_init__(self):
        fes = self.fes
        self.adv = DGAdvection(fes, self.velocity, inflow=self.inflow,
                               dtype=self.dtype)
        self.dif = DGDiffusion(fes, kappa=self.epsilon, dtype=self.dtype)
        self.db = basis_for(fes, dtype=self.dtype)
        gf = geom_factors_for(fes, dtype=self.dtype)
        self.mass_qd = mmod.setup(gf)
        self.mass_diag = mmod.diagonal(self.db, self.mass_qd).reshape(-1)
        self.dif_diag = self.dif.diagonal()
        self.ne, self.nd = fes.mesh.ne, fes.nd_elem

    def _M_apply(self, v):
        e = v.reshape(self.ne, self.nd)
        return eval_values_t(
            self.db, self.mass_qd * eval_values(self.db, e)
        ).reshape(-1)

    # -- IMEX protocol -------------------------------------------------
    def mult_explicit(self, t, u):
        return self.adv.mult(t, u)

    def implicit_solve(self, gamma, t, u):
        rhs = -self.dif.mult(u)

        def lhs(v):
            return self._M_apply(v) + gamma * self.dif.mult(v)

        diag = self.mass_diag + gamma * self.dif_diag
        k, _ = cg(lhs, rhs, M=lambda r: r / diag, rel_tol=self.rel_tol,
                  max_iter=self.max_iter)
        return k

    def mult(self, t, u):
        """Full explicit evaluation (for small-dt reference runs)."""
        rhs = -self.dif.mult(u)
        diag = self.mass_diag
        k, _ = cg(self._M_apply, rhs, M=lambda r: r / diag,
                  rel_tol=self.rel_tol, max_iter=self.max_iter)
        return self.adv.mult(t, u) + k
