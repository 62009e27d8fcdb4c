"""Poisson solver — the "ex1" capability slice.

Reference analog: ``examples/ex1.cpp`` / ``ex1p.cpp`` (see SURVEY.md §3.1-3.3):
H1 space, DiffusionIntegrator, essential BCs, FormLinearSystem, PCG with
Jacobi preconditioning (the PA device path of ``ex1 -pa``).

The solve is a jitted pure function of the assembled device data.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from ..fem.fespace import FESpace
from ..fem.gridfunction import project
from ..linalg.smoothers import chebyshev, jacobi
from ..linalg.solvers import cg
from ..ops.bilinearform import BilinearForm
from ..ops.linearform import domain_lf
from ..ops.operators import form_linear_system
from ..utils.config import real_t


@dataclasses.dataclass
class PoissonResult:
    fes: FESpace
    u: jnp.ndarray
    iterations: int
    final_norm: float
    converged: bool


def solve(
    mesh,
    order: int = 2,
    rhs: object = 1.0,
    kappa: object = None,
    ess_bdr: Optional[Sequence[int]] = None,
    bc: Optional[Callable] = None,
    rel_tol: float = 1e-12,
    max_iter: int = 2000,
    preconditioner: str = "jacobi",
    dtype=None,
) -> PoissonResult:
    """Solve −∇·(κ∇u) = rhs, u = bc on marked boundary attributes."""
    fes = FESpace(mesh, order)
    a = BilinearForm(fes).add_domain_integrator("diffusion", kappa)
    A = a.assemble(dtype).operator()
    b = domain_lf(fes, rhs if callable(rhs) or rhs is None else float(rhs),
                  dtype=dtype)
    ess = fes.essential_dofs(ess_bdr)
    if bc is not None:
        x0 = project(fes, bc, dtype)
    else:
        x0 = jnp.zeros(fes.ndof, dtype=real_t(dtype))

    Ac, B = form_linear_system(A, ess, x0, b)
    diag = Ac.diagonal()
    if preconditioner == "jacobi":
        M = jacobi(diag)
    elif preconditioner == "chebyshev":
        M = chebyshev(Ac.mult, diag)
    elif preconditioner == "lor":
        # all-device LOR-MG (fem/lor/lor_batched.hpp:34 analog)
        from ..ops.lor_device import make_lor_multigrid

        mg = make_lor_multigrid(fes, kappa if kappa is not None else 1.0,
                                ess_bdr=ess_bdr, dtype=dtype)
        M = mg.preconditioner()
    elif preconditioner is None:
        M = None
    else:
        raise ValueError(preconditioner)

    x, info = cg(Ac.mult, B, x0=x0, M=M, rel_tol=rel_tol, max_iter=max_iter)
    return PoissonResult(
        fes=fes,
        u=x,
        iterations=int(info.iterations),
        final_norm=float(info.final_norm),
        converged=bool(info.converged),
    )
